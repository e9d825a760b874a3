"""Coverage for the small offline-tool/utility modules that had none:
pose_tpu/tools/backproject.py (reference back_project.py),
pose_tpu/tools/video.py (utils.py:99-126), pose_tpu/tools/detector.py
(utils.py:82-89), pose_tpu/utils/debugging.py and profiling.StepTimer."""

import json
import os

import numpy as np
import pytest


# ------------------------------------------------------------- backproject


def _cmu_cam(dist=(0.0, 0.0, 0.0, 0.0, 0.0)):
    rng = np.random.RandomState(3)
    # a small rotation + translation placing the subject in front
    from pose_tpu.geometry.rotations import euler2mat
    R = euler2mat(0.1, -0.2, 0.05)
    return dict(K=[[1400.0, 0.0, 960.0], [0.0, 1410.0, 540.0],
                   [0.0, 0.0, 1.0]],
                R=R.tolist(), t=[[10.0], [-20.0], [300.0]],
                distCoef=list(dist), panel=0, name='00_03')


def test_project_points_cmu_matches_camera_radial():
    """With radial-only distortion and zero skew the reference's sequential
    in-place intrinsic application (back_project.py:33-34) is equivalent to
    a standard projection — pin project_points_cmu against the repo's own
    Camera model (camera.py world_to_image)."""
    from pose_tpu.geometry.camera import Camera
    from pose_tpu.tools.backproject import project_points_cmu

    cam = _cmu_cam(dist=(-0.22, 0.10, 0.0, 0.0, -0.02))
    rng = np.random.RandomState(0)
    world = rng.uniform(-80, 80, (3, 19)) + [[0], [0], [50]]

    got = project_points_cmu(world.copy(), cam)[:2]

    R = np.asarray(cam['R'])
    t = np.asarray(cam['t']).reshape(3)
    camera = Camera(rot_world_to_cam=R, optical_center=-R.T @ t,
                    intrinsic_matrix=np.asarray(cam['K']),
                    distortion_coeffs=np.asarray(cam['distCoef']),
                    world_up=(0, -1, 0))
    want = camera.world_to_image(world.T).T
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_project_points_cmu_sequential_intrinsic_quirk():
    """The reference applies the x intrinsic row FIRST and reuses the
    already-transformed x in the y row (back_project.py:33-34). With a
    nonzero K[1,0] this diverges from a standard projection — assert the
    quirk is replicated exactly, not 'fixed'."""
    from pose_tpu.tools.backproject import project_points_cmu

    cam = _cmu_cam()
    K = np.asarray(cam['K'])
    K[1, 0] = 5.0                      # forces the quirk to matter
    cam['K'] = K.tolist()
    world = np.array([[30.0], [-40.0], [60.0]])

    got = project_points_cmu(world.copy(), cam)

    R, t = np.asarray(cam['R']), np.asarray(cam['t']).reshape(3, 1)
    x = R @ world + t
    xn, yn = x[0, 0] / x[2, 0], x[1, 0] / x[2, 0]
    x_img = K[0, 0] * xn + K[0, 1] * yn + K[0, 2]
    y_seq = K[1, 0] * x_img + K[1, 1] * yn + K[1, 2]     # reuses x_img
    y_std = K[1, 0] * xn + K[1, 1] * yn + K[1, 2]
    assert abs(got[1, 0] - y_seq) < 1e-9
    assert abs(got[1, 0] - y_std) > 1.0


def test_get_image_coords_writes_per_camera_json(tmp_path):
    """End-to-end over a synthetic CMU sequence layout: per-camera
    image_coord_<cam>.json with (frames*bodies, 19, 3) records whose xy
    match project_points_cmu and whose confidence column is passed through
    (back_project.py:87-150)."""
    from pose_tpu.tools.backproject import (get_image_coords,
                                            project_points_cmu)

    seq = 'seqA'
    pose_dir = tmp_path / seq / 'hdPose3d_stage1_coco19'
    img_root = tmp_path / seq / 'hdImgs'
    pose_dir.mkdir(parents=True)
    (img_root / '00_03').mkdir(parents=True)
    (img_root / '00_07').mkdir(parents=True)
    (img_root / '00_99').mkdir(parents=True)   # no calibration: dropped

    cams = {'00_03': _cmu_cam(), '00_07': _cmu_cam((-0.2, 0, 0, 0, 0))}
    cams['00_07']['name'] = '00_07'
    calib = dict(cameras=[cams['00_03'], cams['00_07'],
                          dict(_cmu_cam(), name='00_05', panel=5)])
    with open(tmp_path / seq / f'calibration_{seq}.json', 'w') as f:
        json.dump(calib, f)

    rng = np.random.RandomState(1)
    frames = [0, 2]
    skeletons = {}
    for frame in frames + [1, 3]:       # 1,3 skipped by interval
        joints = rng.uniform(-50, 50, (19, 4)) + [0, 0, 60, 0.5]
        skeletons[frame] = joints
        body = dict(bodies=[dict(joints19=joints.reshape(-1).tolist())])
        with open(pose_dir / ('body3DScene_%08d.json' % frame), 'w') as f:
            json.dump(body, f)

    get_image_coords(str(tmp_path), seq, 0, 4, 2)

    assert not os.path.exists(img_root / 'image_coord_00_99.json')
    for name in cams:
        with open(img_root / f'image_coord_{name}.json') as f:
            rec = json.load(f)
        assert (rec['start_frame'], rec['end_frame'], rec['interval']) \
            == (0, 4, 2)
        coords = np.asarray(rec['image_coord'])
        assert coords.shape == (len(frames), 19, 3)
        for i, frame in enumerate(frames):
            sk = skeletons[frame].T
            want = project_points_cmu(sk[:3].copy(), cams[name])
            np.testing.assert_allclose(coords[i, :, :2], want[:2].T,
                                       rtol=1e-6)
            np.testing.assert_allclose(coords[i, :, 2], sk[3], rtol=1e-6)


# ------------------------------------------------------------------- video


@pytest.fixture(scope='module')
def small_video(tmp_path_factory):
    import cv2
    path = str(tmp_path_factory.mktemp('vid') / 'clip.avi')
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), 5,
                             (64, 48))
    assert writer.isOpened()
    frames = []
    for i in range(4):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, : 8 * (i + 1)] = (10 + 40 * i, 0, 0)   # BGR: blue ramp
        frames.append(frame)
        writer.write(frame)
    writer.release()
    return path, frames


def test_prefetch_rgb_frames(small_video):
    from pose_tpu.tools.video import prefetch
    path, frames = small_video
    got = list(prefetch(path))
    assert len(got) == 4
    assert got[0].shape == (48, 64, 3)
    # BGR source -> RGB output: the blue ramp lands in channel 2
    assert got[2][:, :8, 2].mean() > got[2][:, :8, 0].mean()
    # MJPG is lossy; the ramp ordering must survive
    means = [g[:, :8, 2].mean() for g in got]
    assert means == sorted(means)


def test_prefetch_hflip(small_video):
    from pose_tpu.tools.video import prefetch
    path, _ = small_video
    plain = list(prefetch(path))
    flipped = list(prefetch(path, hflip=True))
    for a, b in zip(plain, flipped):
        np.testing.assert_array_equal(a[:, ::-1], b)
        assert b.flags['C_CONTIGUOUS']


def test_depth_prefetch_grayscale(small_video):
    from pose_tpu.tools.video import depth_prefetch
    path, _ = small_video
    got = list(depth_prefetch(path))
    assert len(got) == 4 and got[0].shape == (48, 64)
    flipped = list(depth_prefetch(path, hflip=True))
    np.testing.assert_array_equal(got[1][:, ::-1], flipped[1])


def test_prefetch_releases_capture(small_video, monkeypatch):
    """The VideoCapture must be released both on normal exhaustion and when
    the consumer abandons the generator mid-stream (e.g. a SystemExit inside
    predict.py's chunk loop) — otherwise the fd leaks for the process life."""
    from pose_tpu.tools import video
    path, _ = small_video
    released = []
    real = video.cv2.VideoCapture

    class Recording:
        def __init__(self, p):
            self._cap = real(p)

        def isOpened(self):
            return self._cap.isOpened()

        def read(self):
            return self._cap.read()

        def release(self):
            released.append(True)
            self._cap.release()

    monkeypatch.setattr(video.cv2, 'VideoCapture', Recording)

    list(video.prefetch(path))                   # exhaustion
    assert len(released) == 1
    gen = video.depth_prefetch(path)             # abandonment mid-stream
    next(gen)
    gen.close()
    assert len(released) == 2


# ---------------------------------------------------------------- detector


def test_detector_fallback_without_pyyolo():
    from pose_tpu.tools import detector
    pytest.importorskip('numpy')
    try:
        import pyyolo                                     # noqa: F401
        pytest.skip('pyyolo installed; fallback path not reachable')
    except ImportError:
        pass
    det = detector.make_detector('auto')
    assert isinstance(det, detector.ProjectedBoxDetector)
    det.set_candidates([[1, 2, 3, 4], np.array([5., 6., 7., 8.])])
    boxes = det.detect(np.zeros((8, 8, 3), np.uint8))
    assert len(boxes) == 2
    np.testing.assert_array_equal(boxes[0], [1, 2, 3, 4])
    with pytest.raises(ImportError):
        detector.make_detector('yolo')


# --------------------------------------------------------------- debugging


def test_nan_checks_context():
    import jax
    import jax.numpy as jnp
    from pose_tpu.utils import debugging

    def bad(x):
        return jnp.log(x)              # log(0) = -inf, log(-1) = nan

    with debugging.nan_checks():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(bad)(jnp.zeros(()) - 1.0).block_until_ready()
    assert not jax.config.jax_debug_nans
    assert not jax.config.jax_debug_infs
    # outside the context NaN flows through again
    assert np.isnan(jax.jit(bad)(jnp.zeros(()) - 1.0))


def test_assert_finite_tree():
    from pose_tpu.utils.debugging import assert_finite_tree
    good = {'a': np.ones(3), 'b': {'c': np.zeros((2, 2))}}
    assert_finite_tree(good, 'grads')
    bad = {'a': np.ones(3), 'b': {'c': np.array([1.0, np.inf])}}
    with pytest.raises(FloatingPointError) as err:
        assert_finite_tree(bad, 'grads')
    assert 'grads' in str(err.value)


# --------------------------------------------------------------- profiling


def test_step_timer_windows(monkeypatch):
    import time
    from pose_tpu.utils.profiling import StepTimer

    clock = [0.0]
    monkeypatch.setattr(time, 'perf_counter', lambda: clock[0])
    timer = StepTimer(window=2)
    assert timer.update(8) is None       # arms t0
    clock[0] += 0.5
    assert timer.update(8) is None       # 1 of 2
    clock[0] += 0.5
    rate = timer.update(8)               # window closes: 16 imgs / 1.0 s
    assert rate == pytest.approx(16.0)
    # next window accumulates afresh
    clock[0] += 0.25
    clock[0] += 0.25
    timer.update(8)
    clock[0] += 0.5
    assert timer.update(8) == pytest.approx(16.0 / 1.0)


# ----------------------------------------------------------------- tracking


class TestTrackIds:
    """pose_tpu.tools.tracking: stable multi-person identities across an
    ordered record stream (predict.py -track_ids)."""

    @staticmethod
    def _rec(key, bbox, absolute=None):
        rec = dict(key=key, bbox=list(bbox))
        if absolute is not None:
            rec['absolute_cam'] = absolute
        return rec

    def test_ids_follow_position_not_listing_order(self):
        from pose_tpu.tools.tracking import assign_track_ids
        left, right = [5, 5, 40, 60], [50, 10, 40, 60]
        records = [
            self._rec('f0', left), self._rec('f0', right),
            # frame 1 lists the same two people in SWAPPED order
            self._rec('f1', right), self._rec('f1', left),
            self._rec('f2', left), self._rec('f2', right),
        ]
        assign_track_ids(records)
        ids = [r['track_id'] for r in records]
        assert ids[0] != ids[1]
        assert ids == [0, 1, 1, 0, 0, 1]

    def test_occlusion_gap_within_ttl_keeps_id_and_new_person_gets_new(self):
        from pose_tpu.tools.tracking import assign_track_ids
        a, b = [5, 5, 30, 50], [60, 10, 30, 50]
        far = [0, 0, 30, 50]
        records = [
            self._rec('f0', a), self._rec('f0', b),
            self._rec('f1', a),                      # b occluded
            self._rec('f2', a), self._rec('f2', b),  # b reappears (age 1)
            self._rec('f3', a), self._rec('f3', b), self._rec('f3', far),
        ]
        assign_track_ids(records)
        ids = {(r['key'], tuple(r['bbox'])): r['track_id'] for r in records}
        assert ids[('f2', tuple(b))] == ids[('f0', tuple(b))]
        # `far` overlaps a's gate? it is a fresh detection after a and b
        # matched -> new id
        assert ids[('f3', tuple(far))] == 2

    def test_3d_centroids_dominate_when_available(self):
        from pose_tpu.tools.tracking import assign_track_ids
        # identical boxes (pixel cost ties) but distinct 3D positions:
        # the 3D gate must drive the association
        box = [10, 10, 40, 60]
        p0 = np.tile([0.0, 0.0, 2000.0], (5, 1)).tolist()
        p1 = np.tile([400.0, 0.0, 2400.0], (5, 1)).tolist()
        records = [
            self._rec('f0', box, p0), self._rec('f0', box, p1),
            self._rec('f1', box, p1), self._rec('f1', box, p0),
        ]
        assign_track_ids(records)
        ids = [r['track_id'] for r in records]
        assert ids == [0, 1, 1, 0]
