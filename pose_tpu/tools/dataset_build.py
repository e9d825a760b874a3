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


# headroom for the training-time rotation augmentation the stored crop
# must survive without clipping (data_groups.py:43-47 bakes in pi/6)
ROTATION_HEADROOM = np.pi / 6


def _rotation_safe_side(box_wh, angle=ROTATION_HEADROOM):
    """Side of the axis-aligned square that still covers a (w, h) box after
    rotating it by up to `angle`: the rotated box's bounding extent is
    w*cos+h*sin along one axis and w*sin+h*cos along the other; take the
    larger."""
    c, s = np.cos(angle), np.sin(angle)
    w, h = np.asarray(box_wh, np.float64)
    return max(c * w + s * h, s * w + c * h)


def _downscale_cap(box_wh, side_in, random_zoom):
    """Scale that leaves the subject `side_in / random_zoom` pixels across,
    so the training loader's zoom range never needs to upsample the stored
    crop; never upscale at build time (cap at 1)."""
    return min(side_in / (np.max(box_wh) * random_zoom), 1.0)


def make_sample(sample, camera, image, args):
    """Downscale+recenter one person crop to disk (behavioral spec:
    data_groups.py:36-70, re-derived): build a virtual camera centered on
    the bbox with rotation-safe coverage and a capped downscale, warp the
    source image through it once, and rewrite the sample's bbox/camera into
    that crop frame."""
    wh = np.asarray(sample['bbox'][2:], np.float64)
    cover_side = _rotation_safe_side(wh)
    scale = _downscale_cap(wh, args.side_in, args.random_zoom)

    crop_cam = copy.deepcopy(camera)
    crop_cam.shift_to_center(boxlib.center(sample['bbox']),
                             (cover_side, cover_side))
    crop_cam.scale_output(scale)

    if not os.path.exists(sample['image']):
        side_px = int(np.round(cover_side * scale))
        warped = _warp_image(image, camera, crop_cam, (side_px, side_px))
        Image.fromarray(warped.squeeze() if warped.shape[-1] == 1
                        else warped).save(sample['image'])

    corner = cameralib.reproject_points(
        sample['bbox'][None, :2], camera, crop_cam)[0]
    sample['bbox'] = np.concatenate([corner, wh * scale])
    sample['camera'] = crop_cam
    return sample


def get_cmu_cameras(json_file, cam_names):
    """HD-panel CMU calibration (behavioral spec: data_groups.py:73-92).
    The calibration stores world->cam extrinsics [R|t]; the Camera ctor
    wants the eye point, which is -R^T t. CMU's y axis points down, so
    world_up is (0,-1,0)."""
    with open(json_file) as f:
        rig = json.load(f)['cameras']
    wanted = set(cam_names)
    cameras = {}
    for entry in rig:
        if entry['panel'] != 0 or entry['name'] not in wanted:
            continue
        R = np.asarray(entry['R'], np.float64)
        t = np.asarray(entry['t'], np.float64).reshape(3)
        cameras[entry['name']] = cameralib.Camera(
            optical_center=-R.T @ t, rot_world_to_cam=R,
            intrinsic_matrix=np.asarray(entry['K'], np.float64),
            distortion_coeffs=np.asarray(entry['distCoef'], np.float64),
            world_up=(0, -1, 0))
    return cameras


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


def _save_samples(root_path, samples):
    with open(os.path.join(root_path, 'samples.pkl'), 'wb') as f:
        pickle.dump(samples, f)
    return samples


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

        last_seen = dict()
        lo, hi = time_window[sequence]
        for frame in range(lo, hi):
            anno_path = os.path.join(
                root_skeleton, 'body3DScene_' + str(frame).zfill(8) + '.json')
            if not os.path.exists(anno_path):
                continue
            bodies = json.load(open(anno_path)).get('bodies')
            if not bodies:
                continue

            for body in bodies:
                person = body['id']
                joints = np.array(body['joints19']).reshape((-1, 4))
                skeleton, confidence = joints[:, :3], joints[:, 3]

                # skip near-static poses (<10mm displacement,
                # data_groups.py:162-167)
                if person in last_seen and np.all(np.linalg.norm(
                        last_seen[person] - skeleton, axis=1) < 10.0):
                    continue

                reliable = (0.2 <= confidence)
                if not near_entry(skeleton, reliable):
                    for cam_name in cam_names:
                        image_path = os.path.join(
                            cam_folders[cam_name],
                            cam_name + '_' + str(frame).zfill(8) + '.jpg')
                        if not os.path.exists(image_path):
                            continue
                        os.makedirs(down_path[cam_name], exist_ok=True)

                        projected = cameras[cam_name].world_to_image(skeleton)
                        guess = boxlib.bb_of_points(projected[reliable])
                        image = decode(image_path)
                        if hasattr(detector, 'set_candidates'):
                            detector.set_candidates([guess])
                        det = detect_bbox(image, guess, detector)
                        if det is None:
                            continue
                        crop_path = os.path.join(
                            down_path[cam_name],
                            '{}.{}.jpg'.format(frame, person))
                        samples.append(make_sample(
                            dict(skeleton=skeleton, valid=reliable,
                                 image=crop_path, bbox=det,
                                 sequence=sequence),
                            cameras[cam_name], image, args))
                last_seen[person] = skeleton

            print('collecting samples [', str(lo), '-', str(frame), '-',
                  str(hi), '] sequence', sequence)

    return _save_samples(args.data_root_path, samples)


# ------------------------------------------------------------------- H36M


def load_coords(path, key_foots, stride):
    """H36M 3D poses from a CDF 'Pose' record (behavioral spec:
    data_groups.py:203-209): record 0 holds (n_frames, 3*n_joints) flat mm
    coordinates; return the total frame count plus the strided key_foots
    joint subset. spacepy is offline-only and gated."""
    import spacepy.pycdf as pycdf
    flat = np.asarray(pycdf.CDF(path)['Pose'], np.float32)[0]
    n_frames = flat.shape[0]
    joints = flat.reshape(n_frames, -1, 3)
    return n_frames, joints[::stride, key_foots]


def collect_data(root_part, activity, camera_id, stride):
    """Gather one (activity, camera) shard's pose/image/bbox triple
    (behavioral spec: data_groups.py:212-231). The CDF drives frame count;
    images and bboxes are strided to match."""
    from joint_settings import h36m_cam_names, h36m_key_foots

    cam_suffix = h36m_cam_names[camera_id]
    cdf_path = os.path.join(root_part, 'MyPoseFeatures', 'D3_Positions',
                            activity + '.cdf')
    n_frames, poses = load_coords(cdf_path, h36m_key_foots, stride)

    image_dir = os.path.join(root_part, 'Images',
                             '{}.{}'.format(activity, cam_suffix))
    image_paths = [os.path.join(image_dir, 'frame_{:06d}.jpg'.format(i))
                   for i in range(0, n_frames, stride)]

    bboxes = np.load(os.path.join(
        root_part, 'BBoxes',
        '{}.{}.npy'.format(activity, cam_suffix)))[::stride]
    return image_paths, poses, bboxes


# metadata.xml 'w0' blob layout: 4 cameras x 11 subjects x 6 extrinsic
# values (rxyz Euler angles + eye point) followed by 4 cameras x 9
# intrinsic values (fx fy cx cy k1 k2 k3 p1 p2) — data_groups.py:234-264
_H36M_N_CAMS, _H36M_N_SUBJECTS = 4, 11


def get_h36m_cameras(calib_file):
    """Parse H36M's metadata.xml single-blob calibration into a
    [camera][subject] grid of Camera objects."""
    blob = ElementTree.parse(calib_file).getroot().find('w0').text
    values = np.array([float(v) for v in blob[1:-1].split(' ')])
    n_ext = _H36M_N_CAMS * _H36M_N_SUBJECTS * 6
    ext = values[:n_ext].reshape(_H36M_N_CAMS, _H36M_N_SUBJECTS, 6)
    intr = values[n_ext:].reshape(_H36M_N_CAMS, 9)

    def build(camera_id, subject):
        eye = ext[camera_id, subject, 3:]
        R = euler2mat(*ext[camera_id, subject, :3], 'rxyz')
        fx, fy, cx, cy, k1, k2, k3, p1, p2 = intr[camera_id]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        dist = np.array([k1, k2, p1, p2, k3], np.float32)
        return cameralib.Camera(eye, R, K, dist)

    return [[build(c, s) for s in range(_H36M_N_SUBJECTS)]
            for c in range(_H36M_N_CAMS)]


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
        root_part = os.path.join(args.data_root_path, f'S{partition}')
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

    return _save_samples(args.data_root_path, samples)
