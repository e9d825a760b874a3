#!/bin/sh
# Per-sequence frame windows for the CMU back-projection tool
# (reference: get_image_coords.sh). Usage mirrors the reference:
#   python back_project.py <interval> <seq_name> <start_frame> <end_frame>
python back_project.py 10 171026_pose1 1000 22000
python back_project.py 10 171026_pose2 1000 24000
python back_project.py 10 171026_pose3 1000 17000
python back_project.py 10 171204_pose1 1000 22000
python back_project.py 10 171204_pose2 1000 22000
python back_project.py 10 171204_pose3 1000 23000
python back_project.py 10 171204_pose4 1000 22000
python back_project.py 10 171204_pose5 1000 25000
python back_project.py 10 171204_pose6 1000 22000
