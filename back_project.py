"""CLI shim (reference: back_project.py).
Usage: python back_project.py <interval> <seq_name> <start> <end>"""

import os
import sys

from pose_tpu.tools.backproject import get_image_coords, project_points_cmu

data_path = os.environ.get('CMU_DATA_PATH', '/globalwork/data/cmu-panoptic')


def projectPoints(X, cam):
    return project_points_cmu(X, cam)


def main(interval, seq_name, start_frame, end_frame):
    get_image_coords(data_path, seq_name, int(start_frame), int(end_frame),
                     int(interval))


if __name__ == '__main__':
    assert len(sys.argv[1:]) == 4
    main(*sys.argv[1:])
