"""Offline depth dataset construction: NTU RGB+D / PKU-MMD midway and final
sample stores plus NTU depth-camera calibration (reference:
filter_ntu_samples.py, filter_pku_samples.py, depth_groups.py,
get_depth_cams.py). One-time host tooling; functional parity.
"""

import glob
import json
import multiprocessing
import os
import pickle
import random

import numpy as np
import scipy.optimize

from ..data.samples import unpickle
from ..geometry import boxlib
from ..geometry import camera as cameralib
from .dataset_build import groupby, transfer_bbox
from .video import depth_prefetch, prefetch

# the 17-joint subset of the 75-channel inferred skeletons
# (filter_ntu_samples.py:77)
NTU_JOINT_INDICES = [63, 4, 7, 38, 3, 6, 5, 47, 24, 27, 42, 17, 19, 67, 18,
                     20, 52]


def pickle_to(obj, *path_parts):
    with open(os.path.join(*path_parts), 'wb') as f:
        pickle.dump(obj, f)


# -------------------------------------------------------- motion-gated filter


def get_cam_id(anno_file):
    # NTU file names lead with the setup+camera id (SsssCccc...)
    return os.path.basename(anno_file).split('.')[0][:8]


class MotionGate:
    """Admits a frame's poses only when they have moved enough since the
    last admitted state of the same tracked person.

    Behavioral spec from the reference (filter_ntu_samples.py:22-65),
    re-derived vectorized: one `(slots, poses, joints)` travel tensor feeds
    both the Hungarian assignment cost (nanmean over joints) and the
    admission rule (>= `min_joints` joints travelled >= `min_travel` mm),
    instead of per-pair python loops. Each tracked slot stores the last
    *admitted* pose of one person — a rejected pose does not move its slot,
    so slow drift accumulates until it finally clears the gate. Poses the
    assignment leaves unmatched open fresh slots and are always admitted.
    """

    def __init__(self, min_travel=100.0, min_joints=3):
        self.min_travel = min_travel
        self.min_joints = min_joints
        self._slots = []

    def admit(self, poses):
        """poses: sequence of (n_joints, 3) arrays -> (len(poses),) bool."""
        admitted = np.ones(len(poses), dtype=bool)
        if len(poses) == 0:
            return admitted
        if not self._slots:
            self._slots = list(poses)
            return admitted

        travel = np.linalg.norm(
            np.asarray(self._slots)[:, None] - np.asarray(poses)[None],
            axis=-1)
        slot_ids, pose_ids = scipy.optimize.linear_sum_assignment(
            np.nanmean(travel, axis=-1))
        cleared = (np.count_nonzero(
            travel[slot_ids, pose_ids] >= self.min_travel, axis=-1)
            >= self.min_joints)

        admitted[pose_ids] = cleared
        for slot, pose in zip(slot_ids[cleared], pose_ids[cleared]):
            self._slots[slot] = poses[pose]
        leftover = set(range(len(poses))) - set(pose_ids)
        self._slots.extend(poses[i] for i in sorted(leftover))
        return admitted


def has_coords(pose):
    """A skeleton slot is populated iff it carries no NaN joints."""
    return not np.any(np.isnan(pose))


def _collect_motion_gated(skeleton_stream, camera):
    """Shared NTU/PKU inner loop: motion gate + visibility floor
    (filter_ntu_samples.py:85-99). skeleton_stream yields
    (frame, [poses...], video_id); the gate state spans one stream."""
    samples = []
    gate = MotionGate()
    for frame, cur_poses, video_id in skeleton_stream:
        for idx in np.flatnonzero(gate.admit(cur_poses)):
            skeleton = cur_poses[idx]
            projected = camera.world_to_image(skeleton)
            reliable = (camera.is_visible(skeleton, [1920, 1080])
                        & (200.0 <= skeleton[:, 2]))
            if np.count_nonzero(reliable) < 15:
                continue
            samples.append(dict(
                skeleton=skeleton, valid=reliable, frame=frame,
                video=video_id,
                bbox=boxlib.expand(boxlib.bb_of_points(projected), 1.25)))
    return samples


def filter_ntu_samples(anno_files, cam_id, camera, root_path):
    """(filter_ntu_samples.py:68-102)"""
    samples = []
    anno_files = sorted(anno_files)
    for anno_file in anno_files:
        video_id = os.path.basename(anno_file).split('.')[0]
        skeletons = np.load(anno_file)[:, :, NTU_JOINT_INDICES]
        n_frames = skeletons.shape[1]
        print('collect samples from video:', video_id)

        def stream():
            for frame in range(n_frames):
                yield (frame, [p for p in skeletons[:, frame]
                               if has_coords(p)], video_id)

        samples += _collect_motion_gated(stream(), camera)

    os.makedirs(os.path.join(root_path, 'midway_samples'), exist_ok=True)
    pickle_to(samples, root_path, 'midway_samples', cam_id + '.pkl')
    return samples


def filter_ntu_main(root_path, skeleton_path, num_processes=6):
    """(filter_ntu_samples.py:105-119)"""
    cameras = unpickle(root_path, 'cameras.pkl')
    anno_files = glob.glob(os.path.join(skeleton_path, '*.npy'))
    anno_files_by_cam = groupby(anno_files, get_cam_id)

    pool = multiprocessing.Pool(num_processes)
    # keep the AsyncResult handles: .get() re-raises worker exceptions, so
    # a failed camera shard aborts the build instead of silently missing
    # (the sibling filter_pku_main already did this)
    processes = [pool.apply_async(
        func=filter_ntu_samples,
        args=(annos, cam_id, cameras[cam_id], root_path))
        for cam_id, annos in anno_files_by_cam.items()]
    pool.close()
    pool.join()
    for process in processes:
        process.get()


# ------------------------------------------------------------------- PKU


def kinect_to_box(camera, skel, frame_width=1920):
    """Kinect-native skeleton -> projected box (behavioral spec:
    filter_pku_samples.py:22-26). The Kinect camera frame has y up and its
    image is horizontally mirrored relative to the color stream, so negate
    y before projecting and reflect x about the frame width."""
    projected = camera.camera_to_image(np.asarray(skel) * [1.0, -1.0, 1.0])
    projected[:, 0] = frame_width - projected[:, 0]
    return boxlib.bb_of_points(projected)


def reap_by_iou(infer_skels, kinect_skels, camera):
    """Reconcile inferred skeletons with Kinect-native ones by projected-box
    IoU (filter_pku_samples.py:29-43)."""
    kinect_boxes = [kinect_to_box(camera, skel) for skel in kinect_skels
                    if np.all(skel[:, 2] != 0.0)]
    infer_skels = [skel for skel in infer_skels if not np.any(np.isnan(skel))]
    infer_boxes = [boxlib.bb_of_points(camera.camera_to_image(skel))
                   for skel in infer_skels]
    ret = []
    for kinect_box in kinect_boxes:
        if not infer_boxes:
            break
        iou_scores = [boxlib.iou(kinect_box, infer_box)
                      for infer_box in infer_boxes]
        best_match = np.argmax(iou_scores)
        if iou_scores[best_match] > 0.5:
            ret.append(infer_skels[best_match])
    return ret


PKU_INTRINSICS = np.array([[1.03e3, 0, 9.80e2], [0, 1.03e3, 5.50e2],
                           [0, 0, 1]])


def filter_pku_samples(anno_file, camera, label_root, skeleton_root):
    """(filter_pku_samples.py:46-94)"""
    skeletons = np.load(anno_file)[:, :, NTU_JOINT_INDICES]
    video_id = os.path.basename(anno_file)[:6]
    print('collect samples from video: [', video_id, ']')

    label_file = os.path.join(label_root, video_id + '.txt')
    with open(label_file) as file:
        lines = [line.strip() for line in file.readlines()]
    begin_frames = [int(line.split(',')[1]) for line in lines]
    end_frames = [int(line.split(',')[2]) for line in lines]

    origin_file = os.path.join(skeleton_root, video_id + '.txt')
    with open(origin_file) as file:
        lines = [line.strip() for line in file.readlines()]
    origin_skels = np.stack(
        [np.asarray([float(v) for v in line.split(' ')]).reshape(2, 25, 3)
         for line in lines], axis=1)

    samples = []
    for begin, end in zip(begin_frames, end_frames):
        def stream():
            for frame in range(begin, end):
                yield (frame,
                       reap_by_iou(skeletons[:, frame], origin_skels[:, frame],
                                   camera),
                       video_id)
        samples += _collect_motion_gated(stream(), camera)
    return samples


def exclude(exclusions, anno_file):
    return not any(excluded in anno_file for excluded in exclusions)


def filter_pku_main(root, anno_path, label_root=None, skeleton_root=None,
                    num_processes=6):
    """(filter_pku_samples.py:97-124)"""
    from functools import partial

    anno_files = sorted(glob.glob(os.path.join(anno_path, '*.npy')))
    exclusions = json.load(open(os.path.join(root, 'exclusions.json')))
    anno_files = list(filter(partial(exclude, exclusions), anno_files))

    label_root = label_root or os.path.join(root, 'Train_Label_PKU_final')
    skeleton_root = skeleton_root or os.path.join(root, 'PKU_Skeleton_Renew')
    camera = cameralib.Camera(intrinsic_matrix=PKU_INTRINSICS,
                              world_up=(0, -1, 0))

    pool = multiprocessing.Pool(num_processes)
    handles = [pool.apply_async(
        func=filter_pku_samples,
        args=(f, camera, label_root, skeleton_root)) for f in anno_files]
    pool.close()
    pool.join()
    samples = [s for handle in handles for s in handle.get()]

    pickle_to(samples, root, 'midway_samples.pkl')
    return samples


# ----------------------------------------------------- depth-cam calibration


def calibrate_depth_camera(anno_files, cam_id, sample_count=200, rng=None):
    """NTU depth intrinsics by least squares from (2D-depth, 3D-camera)
    joint pairs with RMS preconditioning (get_depth_cams.py:31-90)."""
    print('compute intrinsics for camera:', cam_id)
    rng = rng or random
    chosen_files = rng.sample(anno_files, min(sample_count, len(anno_files)))

    rows_a, rows_b = [], []
    for chosen_file in chosen_files:
        anno = np.load(chosen_file, allow_pickle=True,
                       encoding='latin1').item()
        n_frames = len(anno['nbodys'])
        frame = rng.randrange(0, n_frames)
        coord_on_depth = anno['depth_body0'][frame]          # (25, 2)
        coord_cam = anno['skel_body0'][frame] * np.array(
            [1000.0, -1000.0, 1000.0])                       # (25, 3)

        for (u, v), (cx, cy, cz) in zip(coord_on_depth, coord_cam):
            if cz == 0:
                continue
            rows_a += [[cx / cz, 0, 1, 0], [0, cy / cz, 0, 1]]
            rows_b += [[u], [v]]

    A = np.array(rows_a, np.float32)
    b = np.array(rows_b, np.float32)
    print('A:', A.shape, '| b:', b.shape)
    if A.shape[0] < 5000:
        raise RuntimeError(
            f'too few valid videos chosen for camera: {cam_id}')

    rms_A = np.sqrt(np.mean(np.square(A), axis=0))
    rms_b = np.sqrt(np.mean(np.square(b), axis=0))
    result, *_ = np.linalg.lstsq(A / rms_A, b / rms_b, rcond=None)
    fx, fy, cx, cy = result[:, 0] * rms_b / rms_A

    intrinsics = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    return cameralib.Camera(intrinsic_matrix=intrinsics, world_up=(0, -1, 0))


def get_depth_cams_main(path, out_path=None):
    """(get_depth_cams.py:20-28)"""
    anno_files = glob.glob(os.path.join(path, '*.skeleton.npy'))
    anno_files_by_cam = groupby(anno_files, get_cam_id)
    cameras = {cam_id: calibrate_depth_camera(annos, cam_id)
               for cam_id, annos in anno_files_by_cam.items()}
    pickle_to(cameras, out_path or os.path.join(path, 'depth_cameras.pkl'))
    return cameras


# ------------------------------------------------------- midway -> final


def make_depth_sample(sample, cameras, image, args):
    """Depth-stack variant of the crop builder (depth_groups.py:16-59):
    identical crop-camera construction (delegated to
    dataset_build.make_sample) plus the color->depth bbox transfer and the
    per-frame crop path under args.down_path."""
    from .dataset_build import make_sample

    color_cam, depth_cam = cameras
    sample['depth_bbox'] = transfer_bbox(sample['bbox'], color_cam,
                                         depth_cam)
    sample['image'] = os.path.join(args.down_path,
                                   str(sample['frame']) + '.jpg')
    return make_sample(sample, color_cam, image, args)


def by_sequence(phase, sample_file):
    """Midway-shard gate; the reference references an undefined `by_sequence`
    (depth_groups.py:76) — reconstructed as accept-all (phase selection lives
    in split.json at load time)."""
    return True


def _assign_and_make(samples_cur_frame, det_bboxes, make):
    iou_matrix = np.array([[boxlib.iou(sample['bbox'], bbox)
                            for bbox in det_bboxes]
                           for sample in samples_cur_frame])
    sample_indices, det_indices = scipy.optimize.linear_sum_assignment(
        -iou_matrix)
    made = []
    for i_sample, i_det in zip(sample_indices, det_indices):
        cur_sample = samples_cur_frame[i_sample]
        if 0.5 <= iou_matrix[i_sample, i_det]:
            cur_sample['bbox'] = det_bboxes[i_det]
            made.append(make(cur_sample))
    return made


def get_ntu_group(phase, args, detector=None):
    """(depth_groups.py:62-134)"""
    from .detector import make_detector

    assert os.path.isdir(args.data_down_path)
    detector = detector or make_detector()

    color_cameras = unpickle(args.data_root_path, 'cameras.pkl')
    depth_cameras = unpickle(args.data_root_path, 'depth_cameras.pkl')

    sample_files = glob.glob(
        os.path.join(args.data_root_path, 'midway_samples', '*.pkl'))
    sample_files = sorted(f for f in sample_files if by_sequence(phase, f))

    for i_cam, sample_file in enumerate(sample_files):
        final_samples = []
        cam_id = os.path.basename(sample_file).split('.')[0]
        print('=> handles camera[', cam_id, ']: [', i_cam, '|',
              len(sample_files), ']')
        cameras = (color_cameras[cam_id], depth_cameras[cam_id])

        samples_by_video = groupby(unpickle(sample_file),
                                   lambda s: s['video'])

        for i_vid, (video_id, samples_cur_video) in enumerate(
                samples_by_video.items()):
            print('\t => handles video[', video_id, ']: [', i_vid, '|',
                  len(samples_by_video), ']')
            samples_by_frame = groupby(samples_cur_video,
                                       lambda s: s['frame'])
            video_path = os.path.join(args.data_root_path, 'nturgb+d_rgb',
                                      video_id + '_rgb.avi')
            down_path = os.path.join(args.data_down_path, video_id)
            os.makedirs(down_path, exist_ok=True)
            args.down_path = down_path

            for frame, image in enumerate(prefetch(video_path)):
                if frame not in samples_by_frame:
                    continue
                print('\t\t => handles frame[', frame, ']')
                if hasattr(detector, 'set_candidates'):
                    detector.set_candidates(
                        [s['bbox'] for s in samples_by_frame[frame]])
                det_bboxes = detector.detect(image)
                if not det_bboxes:
                    continue
                final_samples += _assign_and_make(
                    samples_by_frame[frame], det_bboxes,
                    lambda s: make_depth_sample(s, cameras, image, args))

        # replace only the shard-directory component (a root path that
        # itself contains 'midway' must not be rewritten), and create the
        # final_samples dir before the first shard is written
        final_file = os.path.join(
            os.path.dirname(os.path.dirname(sample_file)), 'final_samples',
            os.path.basename(sample_file))
        os.makedirs(os.path.dirname(final_file), exist_ok=True)
        pickle_to(final_samples, final_file)


def get_pku_group(args, detector=None):
    """(depth_groups.py:137-217)"""
    import cv2

    from .detector import make_detector

    assert os.path.isdir(args.data_down_path)
    detector = detector or make_detector()

    cameras = unpickle(args.data_root_path, 'cameras.pkl')

    sample_file = os.path.join(args.data_root_path, 'midway_samples.pkl')
    samples_by_video = groupby(unpickle(sample_file), lambda s: s['video'])

    final_samples = []
    exclusions = json.load(
        open(os.path.join(args.data_root_path, 'exclusions.json')))
    for video_id in exclusions:
        samples_by_video.pop(video_id, None)

    os.makedirs(os.path.join(args.data_root_path, 'DEPTH_IMAGE'),
                exist_ok=True)

    for i_vid, (video_id, samples_cur_video) in enumerate(
            samples_by_video.items()):
        print('=> handles video[', video_id, ']: [', i_vid, '|',
              len(samples_by_video), ']')
        samples_by_frame = groupby(samples_cur_video, lambda s: s['frame'])
        video_path = os.path.join(args.data_root_path, 'RGB_VIDEO',
                                  video_id + '.avi')
        depth_path = os.path.join(args.data_root_path, 'DEPTH_VIDEO',
                                  video_id + '-depth.avi')
        video_loader = prefetch(video_path, True)
        depth_loader = depth_prefetch(depth_path, True)

        down_path = os.path.join(args.data_down_path, video_id)
        os.makedirs(down_path, exist_ok=True)
        args.down_path = down_path
        cur_cams = (cameras['color'], cameras[video_id[-1]])

        for frame, (image, depth_image) in enumerate(
                zip(video_loader, depth_loader)):
            if frame not in samples_by_frame:
                continue
            print('\t=> handles frame[', frame, ']')
            new_depth_path = os.path.join(
                args.data_root_path, 'DEPTH_IMAGE',
                video_id + '.' + str(frame) + '.png')

            if hasattr(detector, 'set_candidates'):
                detector.set_candidates(
                    [s['bbox'] for s in samples_by_frame[frame]])
            det_bboxes = detector.detect(image)
            if not det_bboxes:
                continue
            made = _assign_and_make(
                samples_by_frame[frame], det_bboxes,
                lambda s: make_depth_sample(s, cur_cams, image, args))
            final_samples += made

            if made and not os.path.exists(new_depth_path):
                cv2.imwrite(new_depth_path, depth_image)

    pickle_to(final_samples, os.path.dirname(sample_file),
              os.path.basename(sample_file).replace('midway', 'final'))
