"""Offline RGB dataset construction: CMU Panoptic and Human3.6M sample stores
(reference: data_groups.py). One-time host-side preprocessing producing the
samples.pkl the runtime loaders read; functional parity, not speed
(SURVEY.md §7.7).
"""

import collections
import copy
import itertools
import json
import os
import pickle
import xml.etree.ElementTree as ElementTree

import numpy as np
from PIL import Image

from ..geometry import boxlib
from ..geometry import camera as cameralib
from ..geometry.rotations import euler2mat


def groupby(items, key):
    """(utils.py:129-133)"""
    result = collections.defaultdict(list)
    for item in items:
        result[key(item)].append(item)
    return result


def transfer_bbox(bbox, color_cam, depth_cam):
    """Reproject a bbox's corners between cameras (utils.py:92-96)."""
    new_tl = cameralib.reproject_points(
        np.expand_dims(bbox[:2], axis=0), color_cam, depth_cam)[0]
    new_br = cameralib.reproject_points(
        np.expand_dims(bbox[:2] + bbox[2:], axis=0), color_cam, depth_cam)[0]
    return np.concatenate([new_tl, new_br - new_tl])


def detect_bbox(image, rect, detector):
    """YOLO-validated bbox: IoU >= 0.5 against the projected-skeleton box
    (data_groups.py:25-33)."""
    det_bboxes = detector.detect(image)
    if not det_bboxes:
        return None
    ious = np.array([boxlib.iou(rect, bbox) for bbox in det_bboxes])
    if np.all(ious < 0.5):
        return None
    return det_bboxes[np.argmax(ious)]


def _warp_image(image, old_camera, new_camera, imshape):
    import cameralib as shim  # root shim carries the on-device warp
    return shim.reproject_image(image, old_camera, new_camera, imshape)


def make_sample(sample, camera, image, args):
    """Downscale+recenter one person crop to disk (data_groups.py:36-70):
    pi/6-rotation-safe expansion, scale capped so the random-zoom headroom of
    the training crop never upsamples, shift_to_center + scale_output."""
    box_center = boxlib.center(sample['bbox'])

    sine = np.sin(np.pi / 6)
    cosine = np.cos(np.pi / 6)
    expand_shape = (np.array([[cosine, sine], [sine, cosine]])
                    @ sample['bbox'][2:, np.newaxis])
    expand_side = np.max(expand_shape)

    scale_factor = min(
        args.side_in / np.max(sample['bbox'][2:]) / args.random_zoom, 1.0)
    dest_side = int(np.round(expand_side * scale_factor))

    new_cam = copy.deepcopy(camera)
    new_cam.shift_to_center(box_center, (expand_side, expand_side))
    new_cam.scale_output(scale_factor)

    new_bbox = cameralib.reproject_points(
        sample['bbox'][None, :2], camera, new_cam)[0]
    new_bbox = np.concatenate([new_bbox, sample['bbox'][2:] * scale_factor])

    if not os.path.exists(sample['image']):
        new_image = _warp_image(image, camera, new_cam, (dest_side, dest_side))
        Image.fromarray(new_image.squeeze() if new_image.shape[-1] == 1
                        else new_image).save(sample['image'])

    sample['bbox'] = new_bbox
    sample['camera'] = new_cam
    return sample


def get_cmu_cameras(json_file, cam_names):
    """31-camera CMU calibration: -R^T t eye point, world_up (0,-1,0)
    (data_groups.py:73-92)."""
    calibration = json.load(open(json_file))
    cameras = [cam for cam in calibration['cameras'] if cam['panel'] == 0]
    return dict(
        (cam['name'],
         cameralib.Camera(
             -np.array(cam['R']).T @ np.array(cam['t']).reshape(3),
             np.array(cam['R']),
             np.array(cam['K']),
             np.array(cam['distCoef']),
             (0, -1, 0)))
        for cam in cameras if cam['name'] in cam_names)


CMU_SEQUENCES = dict(
    train=['171026_pose1', '171026_pose2', '171204_pose1', '171204_pose2',
           '171204_pose4', '171204_pose5'],
    valid=['171204_pose3', '171204_pose6'],
    test=['171026_pose3'])

CMU_FRAME_STEP = dict(train=10, valid=10, test=50)

CMU_CAM_NAMES = [
    '00_00', '00_03', '00_05', '00_08', '00_09', '00_11', '00_12', '00_14',
    '00_15', '00_16', '00_18', '00_20', '00_21', '00_22', '00_23', '00_24',
    '00_25', '00_26', '00_27', '00_29']


def near_entry(pose, valid):
    """Gate poses with no reliable joints (the reference calls an undefined
    `near_entry` at data_groups.py:184; reconstructed as the static-pose /
    degenerate-pose guard its call site implies)."""
    return np.count_nonzero(valid) < 2


def get_cmu_group(phase, args, detector=None, decode=None):
    """(data_groups.py:95-200)"""
    from .detector import make_detector

    assert os.path.isdir(args.data_down_path)
    detector = detector or make_detector()
    decode = decode or (lambda path: np.asarray(Image.open(path)))

    samples = []
    time_window = json.load(
        open(os.path.join(args.data_root_path, 'time_window.json')))

    for sequence in CMU_SEQUENCES[phase]:
        root_seq = os.path.join(args.data_root_path, sequence)
        root_image = os.path.join(root_seq, 'hdImgs')

        cam_names = [c for c in CMU_CAM_NAMES
                     if os.path.isdir(os.path.join(root_image, c))]
        cam_folders = {c: os.path.join(root_image, c) for c in cam_names}
        down_path = {c: os.path.join(args.data_down_path, sequence + '.' + c)
                     for c in cam_names}

        cameras = get_cmu_cameras(
            os.path.join(root_seq, 'calibration_' + sequence + '.json'),
            cam_names)
        root_skeleton = os.path.join(root_seq, 'hdPose3d_stage1_coco19')

        prev_pose = dict()
        for frame in range(time_window[sequence][0],
                           time_window[sequence][1]):
            bodies = os.path.join(
                root_skeleton, 'body3DScene_' + str(frame).zfill(8) + '.json')
            if not os.path.exists(bodies):
                continue
            bodies = json.load(open(bodies))['bodies']
            if not bodies:
                continue

            for body in bodies:
                body_id = body['id']
                body_pose = np.array(body['joints19']).reshape((-1, 4))

                # skip near-static poses (<10mm displacement,
                # data_groups.py:162-167)
                if body_id in prev_pose:
                    displacement = np.linalg.norm(
                        prev_pose[body_id] - body_pose[:, :3], axis=1)
                    if np.all(displacement < 10.0):
                        continue

                for cam_name in cam_names:
                    image_path = os.path.join(
                        cam_folders[cam_name],
                        cam_name + '_' + str(frame).zfill(8) + '.jpg')
                    if not os.path.exists(image_path):
                        continue
                    os.makedirs(down_path[cam_name], exist_ok=True)

                    image_coord = cameras[cam_name].world_to_image(
                        body_pose[:, :3])
                    new_path = os.path.join(
                        down_path[cam_name],
                        str(frame) + '.' + str(body_id) + '.jpg')
                    valid = (0.2 <= body_pose[:, 3])
                    if near_entry(body_pose[:, :3], valid):
                        continue

                    bbox = boxlib.bb_of_points(image_coord[valid])
                    image = decode(image_path)
                    if hasattr(detector, 'set_candidates'):
                        detector.set_candidates([bbox])
                    det = detect_bbox(image, bbox, detector)
                    if det is None:
                        continue
                    sample = dict(skeleton=body_pose[:, :3], valid=valid,
                                  image=new_path, bbox=det,
                                  sequence=sequence)
                    samples.append(make_sample(sample, cameras[cam_name],
                                               image, args))
                prev_pose[body_id] = body_pose[:, :3]

            print('collecting samples [', str(time_window[sequence][0]), '-',
                  str(frame), '-', str(time_window[sequence][1]),
                  '] sequence', sequence)

    with open(os.path.join(args.data_root_path, 'samples.pkl'), 'wb') as file:
        pickle.dump(samples, file)
    return samples


# ------------------------------------------------------------------- H36M


def load_coords(path, key_foots, stride):
    """CDF 3D poses (data_groups.py:203-209); spacepy is offline-only and
    gated."""
    import spacepy.pycdf as pycdf
    coords_raw = pycdf.CDF(path)['Pose']
    coords_raw = np.array(coords_raw, np.float32)[0]
    coords_raw = coords_raw.reshape((coords_raw.shape[0], -1, 3))
    return coords_raw.shape[0], coords_raw[::stride, key_foots]


def collect_data(root_part, activity, camera_id, stride):
    """(data_groups.py:212-231)"""
    from joint_settings import h36m_cam_names as cam_names
    from joint_settings import h36m_key_foots as key_foots

    root_pose = os.path.join(root_part, 'MyPoseFeatures')
    path_coords = os.path.join(root_pose, 'D3_Positions', activity + '.cdf')
    n_frames, body_poses = load_coords(path_coords, key_foots, stride)

    root_image = os.path.join(root_part, 'Images',
                              activity + '.' + cam_names[camera_id])
    image_paths = ['frame_' + str(x).zfill(6) + '.jpg'
                   for x in range(0, n_frames, stride)]
    image_paths = [os.path.join(root_image, path) for path in image_paths]

    path_bbox = os.path.join(root_part, 'BBoxes',
                             activity + '.' + cam_names[camera_id] + '.npy')
    bboxes = np.load(path_bbox)[::stride]
    return image_paths, body_poses, bboxes


def get_h36m_cameras(calib_file):
    """Euler/distortion blobs from metadata.xml (data_groups.py:234-264)."""

    def make_h36m_camera(extrinsics, intrinsics):
        x_angle, y_angle, z_angle = extrinsics[0:3]
        R = euler2mat(x_angle, y_angle, z_angle, 'rxyz')
        t = extrinsics[3:6]
        f = intrinsics[:2]
        c = intrinsics[2:4]
        k = intrinsics[4:7]
        p = intrinsics[7:]
        distorts = np.array([k[0], k[1], p[0], p[1], k[2]], np.float32)
        intrinsic = np.array([[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1]],
                             np.float32)
        return cameralib.Camera(t, R, intrinsic, distorts)

    root = ElementTree.parse(calib_file).getroot()
    cam_params_text = root.findall('w0')[0].text
    numbers = np.array([float(x) for x in cam_params_text[1:-1].split(' ')])
    extrinsic = numbers[:264].reshape(4, 11, 6)
    intrinsic = numbers[264:].reshape(4, 9)
    return [[make_h36m_camera(extrinsic[camera_id, partition],
                              intrinsic[camera_id])
             for partition in range(11)] for camera_id in range(4)]


H36M_PARTITIONS = dict(train=[1, 5, 6, 7, 8], valid=[9, 11])
H36M_STRIDE = dict(train=5, valid=64)


def get_h36m_group(phase, args, detector=None, decode=None):
    """(data_groups.py:267-327)"""
    from .detector import make_detector

    assert os.path.isdir(args.data_down_path)
    detector = detector or make_detector()
    decode = decode or (lambda path: np.asarray(Image.open(path)))

    cameras = get_h36m_cameras(
        os.path.join(args.data_root_path, 'metadata.xml'))

    def cond(root_path, elem):
        return (os.path.isdir(os.path.join(root_path, elem))
                and '_' not in elem)

    samples = []
    for partition in H36M_PARTITIONS[phase]:
        root_part = os.path.join(args.data_root_path, 'S' + str(partition))
        root_image = os.path.join(root_part, 'Images')

        activities = [e for e in os.listdir(root_image)
                      if cond(root_image, e)]
        activities = set([e.split('.')[0] for e in activities])

        for index, (activity, camera_id) in enumerate(
                itertools.product(activities, range(4))):
            if partition == 11 and activity == 'Directions' and camera_id == 0:
                continue
            camera = cameras[camera_id][partition - 1]
            print('collecting samples',
                  str(index) + '|' + str(len(activities) * 4),
                  'partition', partition)

            image_paths, body_poses, bboxes = collect_data(
                root_part, activity, camera_id, H36M_STRIDE[phase])

            down = (str(partition) + '.' + activity.replace(' ', '-') + '.'
                    + str(camera_id))
            down = os.path.join(args.data_down_path, down)
            new_paths = [os.path.join(down, os.path.basename(p))
                         for p in image_paths]
            os.makedirs(down, exist_ok=True)

            for image_path, new_path, body_pose, bbox in zip(
                    image_paths, new_paths, body_poses, bboxes):
                image = decode(image_path)
                valid = np.ones(body_pose.shape[0], bool)
                if hasattr(detector, 'set_candidates'):
                    detector.set_candidates([bbox])
                det = detect_bbox(image, bbox, detector)
                if det is None:
                    continue
                sample = dict(skeleton=body_pose, valid=valid,
                              image=new_path, bbox=det)
                samples.append(make_sample(sample, camera, image, args))

    with open(os.path.join(args.data_root_path, 'samples.pkl'), 'wb') as file:
        pickle.dump(samples, file)
    return samples
