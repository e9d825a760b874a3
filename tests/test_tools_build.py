"""Behavior pins for the offline dataset-construction tools
(pose_tpu/tools/dataset_build.py, depth_build.py).

The motion gate golden below is an independent minimal restatement of the
admission spec (reference behavior: filter_ntu_samples.py:22-65) used only
to verify the vectorized MotionGate; the crop-builder tests check the
geometry closed-form.
"""

import json
import os
import types
import xml.etree.ElementTree as ElementTree

import numpy as np
import pytest

from pose_tpu.geometry import boxlib
from pose_tpu.geometry import camera as cameralib
from pose_tpu.geometry.rotations import euler2mat
from pose_tpu.tools import dataset_build, depth_build


# --------------------------------------------------------------- MotionGate


def _golden_gate_frame(tracked, poses, min_travel=100.0, min_joints=3):
    """Per-pair restatement of the admission rule for one frame."""
    import scipy.optimize

    keep = [True] * len(poses)
    if not tracked:
        tracked.extend(poses)
        return keep
    cost = np.zeros((len(tracked), len(poses)))
    for i, t in enumerate(tracked):
        for j, p in enumerate(poses):
            cost[i, j] = np.nanmean(np.linalg.norm(t - p, axis=-1))
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    for i, j in zip(rows, cols):
        dists = np.linalg.norm(tracked[i] - poses[j], axis=-1)
        keep[j] = int(np.sum(dists >= min_travel)) >= min_joints
        if keep[j]:
            tracked[i] = poses[j]
    for j in range(len(poses)):
        if j not in cols:
            tracked.append(poses[j])
    return keep


def _random_stream(rng, n_frames=30, n_joints=17):
    """Streams with people appearing/disappearing and mixed motion sizes."""
    for _ in range(n_frames):
        n_people = rng.integers(0, 4)
        poses = []
        for _ in range(n_people):
            base = rng.uniform(-1000, 1000, size=(1, 3))
            # mix: some frames move a lot, some barely
            spread = rng.choice([5.0, 60.0, 300.0])
            poses.append(base + rng.normal(0, spread, size=(n_joints, 3)))
        yield poses


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_motion_gate_matches_golden(seed):
    rng = np.random.default_rng(seed)
    frames = list(_random_stream(rng))

    gate = depth_build.MotionGate()
    tracked_golden = []
    for poses in frames:
        got = gate.admit(poses)
        want = _golden_gate_frame(tracked_golden, list(poses))
        assert list(got) == want
        # tracked state must evolve identically too
        assert len(gate._slots) == len(tracked_golden)
        for a, b in zip(gate._slots, tracked_golden):
            np.testing.assert_array_equal(a, b)


def test_motion_gate_slow_drift_accumulates():
    # a pose creeping 40mm/frame must stay rejected until cumulative travel
    # from the last ADMITTED pose clears 100mm on >=3 joints
    gate = depth_build.MotionGate()
    base = np.zeros((17, 3))

    def at(x):  # every joint displaced x mm along one axis
        return base + np.array([x, 0.0, 0.0])

    assert gate.admit([at(0)]).tolist() == [True]
    assert gate.admit([at(40)]).tolist() == [False]
    assert gate.admit([at(80)]).tolist() == [False]
    assert gate.admit([at(120)]).tolist() == [True]
    # slot moved to 120: another +80 from the admitted state is rejected
    assert gate.admit([at(200)]).tolist() == [False]


def test_motion_gate_new_person_admitted():
    gate = depth_build.MotionGate()
    a = np.zeros((17, 3))
    gate.admit([a])
    # unmatched second person is always admitted and opens a slot
    out = gate.admit([a + 1.0, a + 5000.0])
    assert out.tolist() == [False, True]
    assert len(gate._slots) == 2


def test_has_coords():
    pose = np.zeros((17, 3))
    assert depth_build.has_coords(pose)
    pose[3, 1] = np.nan
    assert not depth_build.has_coords(pose)


# ------------------------------------------------------------- crop builder


def _pinhole_camera(f=500.0, c=320.0):
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1]], np.float64)
    return cameralib.Camera(optical_center=np.zeros(3),
                            rot_world_to_cam=np.eye(3),
                            intrinsic_matrix=K, world_up=(0, -1, 0))


def _build_args(tmp_path):
    return types.SimpleNamespace(side_in=257, random_zoom=0.9,
                                 down_path=str(tmp_path))


def test_make_sample_geometry(tmp_path):
    camera = _pinhole_camera()
    args = _build_args(tmp_path)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)

    bbox = np.array([100.0, 120.0, 400.0, 300.0])
    sample = dict(bbox=bbox.copy(), image=str(tmp_path / 'crop.jpg'))
    out = dataset_build.make_sample(sample, camera, image, args)

    # closed-form expectations (spec: data_groups.py:43-51)
    c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
    side = max(c * 400 + s * 300, s * 400 + c * 300)
    scale = min(257 / (400 * 0.9), 1.0)
    assert np.isclose(out['bbox'][2], 400 * scale)
    assert np.isclose(out['bbox'][3], 300 * scale)
    saved = np.asarray(__import__('PIL.Image', fromlist=['open'])
                       .open(out['image']))
    assert saved.shape[0] == saved.shape[1] == int(np.round(side * scale))

    # the rewritten bbox corner is the original corner in the crop frame
    expected_corner = cameralib.reproject_points(
        bbox[None, :2], camera, out['camera'])[0]
    np.testing.assert_allclose(out['bbox'][:2], expected_corner)

    # crop camera looks at the bbox center: it maps to the crop image center
    center_world = camera.image_to_world(boxlib.center(bbox)[None], 1.0)
    mapped = out['camera'].world_to_image(center_world)[0]
    half = side * scale / 2
    np.testing.assert_allclose(mapped, [half, half], atol=1e-6)


def test_make_sample_never_upscales(tmp_path):
    camera = _pinhole_camera()
    args = _build_args(tmp_path)
    image = np.zeros((480, 640, 3), np.uint8)
    # a small subject: cap must clamp scale at 1 (no build-time upsampling)
    bbox = np.array([300.0, 300.0, 50.0, 60.0])
    sample = dict(bbox=bbox.copy(), image=str(tmp_path / 'small.jpg'))
    out = dataset_build.make_sample(sample, camera, image, args)
    np.testing.assert_allclose(out['bbox'][2:], [50.0, 60.0])


def test_make_depth_sample_delegates(tmp_path):
    color_cam = _pinhole_camera()
    depth_cam = _pinhole_camera(f=365.0, c=256.0)
    args = _build_args(tmp_path)
    image = np.zeros((480, 640, 3), np.uint8)
    bbox = np.array([100.0, 120.0, 200.0, 260.0])
    sample = dict(bbox=bbox.copy(), frame=7)
    out = depth_build.make_depth_sample(sample, (color_cam, depth_cam),
                                        image, args)
    assert out['image'] == os.path.join(str(tmp_path), '7.jpg')
    assert os.path.exists(out['image'])
    np.testing.assert_allclose(
        out['depth_bbox'],
        dataset_build.transfer_bbox(bbox, color_cam, depth_cam))
    assert 'camera' in out


# --------------------------------------------------------- camera parsers


def test_get_cmu_cameras(tmp_path):
    rng = np.random.default_rng(3)
    R = euler2mat(0.1, -0.2, 0.3, 'sxyz')
    t = rng.uniform(-100, 100, 3)
    K = np.array([[1400.0, 0, 960.0], [0, 1410.0, 540.0], [0, 0, 1]])
    dist = rng.uniform(-0.1, 0.1, 5)
    rig = {'cameras': [
        dict(panel=0, name='00_03', R=R.tolist(),
             t=t.reshape(3, 1).tolist(), K=K.tolist(),
             distCoef=dist.tolist()),
        dict(panel=1, name='01_01', R=np.eye(3).tolist(),
             t=[[0], [0], [0]], K=K.tolist(), distCoef=dist.tolist()),
        dict(panel=0, name='00_99', R=np.eye(3).tolist(),
             t=[[0], [0], [0]], K=K.tolist(), distCoef=dist.tolist()),
    ]}
    path = tmp_path / 'calib.json'
    path.write_text(json.dumps(rig))

    cams = dataset_build.get_cmu_cameras(str(path), ['00_03'])
    assert list(cams) == ['00_03']
    cam = cams['00_03']
    np.testing.assert_allclose(cam.R, R, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cam.t, -R.T @ t, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(cam.intrinsic_matrix, K, rtol=1e-6)


def test_get_h36m_cameras(tmp_path):
    rng = np.random.default_rng(4)
    ext = rng.uniform(-1, 1, size=(4, 11, 6))
    intr = np.concatenate([
        rng.uniform(1000, 1200, size=(4, 4)),       # fx fy cx cy
        rng.uniform(-0.2, 0.2, size=(4, 5))], 1)    # k1 k2 k3 p1 p2
    blob = '[' + ' '.join(
        str(v) for v in np.concatenate(
            [ext.ravel(), intr.ravel()])) + ']'
    root = ElementTree.Element('root')
    w0 = ElementTree.SubElement(root, 'w0')
    w0.text = blob
    path = tmp_path / 'metadata.xml'
    ElementTree.ElementTree(root).write(str(path))

    cams = dataset_build.get_h36m_cameras(str(path))
    assert len(cams) == 4 and len(cams[0]) == 11
    cam = cams[2][5]
    fx, fy, cx, cy, k1, k2, k3, p1, p2 = intr[2]
    np.testing.assert_allclose(
        cam.intrinsic_matrix,
        [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], rtol=1e-6)
    np.testing.assert_allclose(cam.distortion_coeffs,
                               [k1, k2, p1, p2, k3], rtol=1e-6)
    np.testing.assert_allclose(cam.R, euler2mat(*ext[2, 5, :3], 'rxyz'),
                               atol=1e-6)
    np.testing.assert_allclose(cam.t, ext[2, 5, 3:], atol=1e-6)
