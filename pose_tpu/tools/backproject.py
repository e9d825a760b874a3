"""CMU back-projection tool: project joints19 world poses into every HD
camera with the full distortion model and save per-camera
image_coord_<cam>.json (reference: back_project.py — modernized from its
Python-2 syntax)."""

import json
import os

import numpy as np


def project_points_cmu(X, cam):
    """Project (3, N) world points with K/R/t/distCoef dicts exactly as the
    reference's projectPoints (back_project.py:12-36), including its
    sequential in-place x-then-y intrinsic application."""
    K = np.asarray(cam['K'])
    R = np.asarray(cam['R'])
    t = np.asarray(cam['t']).reshape(3, 1)
    Kd = np.asarray(cam['distCoef'])

    x = np.asarray(R @ X + t)
    x[0:2, :] = x[0:2, :] / x[2, :]

    r = x[0, :] * x[0, :] + x[1, :] * x[1, :]

    x[0, :] = (x[0, :] * (1 + Kd[0] * r + Kd[1] * r * r + Kd[4] * r * r * r)
               + 2 * Kd[2] * x[0, :] * x[1, :]
               + Kd[3] * (r + 2 * x[0, :] * x[0, :]))
    x[1, :] = (x[1, :] * (1 + Kd[0] * r + Kd[1] * r * r + Kd[4] * r * r * r)
               + 2 * Kd[3] * x[0, :] * x[1, :]
               + Kd[2] * (r + 2 * x[1, :] * x[1, :]))

    # note: the reference applies the x intrinsic row first and then uses the
    # ALREADY-TRANSFORMED x when computing y (back_project.py:33-34);
    # replicated for output parity
    x[0, :] = K[0, 0] * x[0, :] + K[0, 1] * x[1, :] + K[0, 2]
    x[1, :] = K[1, 0] * x[0, :] + K[1, 1] * x[1, :] + K[1, 2]
    return x


def get_image_coords(data_path, seq_name, start_frame, end_frame, interval):
    """(back_project.py:87-150)"""
    pose_folder = os.path.join(data_path, seq_name, 'hdPose3d_stage1_coco19')
    image_root = os.path.join(data_path, seq_name, 'hdImgs')

    cam_folders = [os.path.join(image_root, folder)
                   for folder in os.listdir(image_root)]
    cam_folders = sorted(f for f in cam_folders if os.path.isdir(f))
    cam_names = [os.path.basename(folder) for folder in cam_folders]
    image_coords = {name: [] for name in cam_names}

    calib = os.path.join(data_path, seq_name,
                         'calibration_' + seq_name + '.json')
    calib = json.load(open(calib))
    cameras = [cam for cam in calib['cameras'] if cam['panel'] == 0]
    cameras = {cam['name']: cam for cam in cameras
               if cam['name'] in cam_names}
    # an hdImgs folder with no panel-0 calibration entry cannot be
    # projected — drop it instead of KeyError-ing mid-run
    cam_names = [n for n in cam_names if n in cameras]
    image_coords = {name: [] for name in cam_names}

    for frame in range(start_frame, end_frame, interval):
        bodies = os.path.join(pose_folder,
                              'body3DScene_' + str(frame).zfill(8) + '.json')
        bodies = json.load(open(bodies))['bodies']
        if not bodies:
            continue
        for skeleton in bodies:
            skeleton = np.array(skeleton['joints19'])
            skeleton = skeleton.reshape((-1, 4)).transpose()       # (4, 19)
            for name in cam_names:
                image_coord = project_points_cmu(skeleton[:3], cameras[name])
                image_coord = np.concatenate(
                    (image_coord[:2], skeleton[3:]), axis=0)       # (3, 19)
                image_coords[name].append(image_coord.transpose())  # (19, 3)
        print('frame [', start_frame, '-', frame, '|', end_frame,
              '] processed')

    print('saving collected image coords')
    for name in cam_names:
        save_path = os.path.join(image_root, 'image_coord_' + name + '.json')
        if not image_coords[name]:
            # no frame in range carried bodies: write an empty record
            # rather than crash after the whole sweep
            image_coord = []
        else:
            image_coord = np.stack(image_coords[name]).tolist()
        with open(save_path, 'w') as file:
            json.dump(dict(start_frame=start_frame, end_frame=end_frame,
                           interval=interval, image_coord=image_coord), file)
