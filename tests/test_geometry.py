"""Geometry core tests: Camera ops vs closed-form cases and cv2 goldens."""

import cv2
import numpy as np
import pytest

from pose_tpu.geometry import (Camera, boxlib, get_homography, look_at_box,
                               reproject_points, triangulate)


def make_distorted_camera():
    K = np.array([[1400.0, 0, 960], [0, 1410.0, 540], [0, 0, 1]], np.float32)
    R = cv2.Rodrigues(np.float32([0.1, -0.2, 0.05]))[0].astype(np.float32)
    t = np.float32([100, 200, -1500])
    dist = np.float32([-0.22, 0.18, 1e-3, -5e-4, -0.05])
    return Camera(t, R, K, dist, world_up=(0, -1, 0))


def test_project_points_matches_cv2():
    cam = make_distorted_camera()
    rng = np.random.RandomState(0)
    cam_pts = np.concatenate(
        [rng.uniform(-500, 500, (50, 2)), rng.uniform(2000, 5000, (50, 1))],
        axis=1).astype(np.float32)
    ours = cam.camera_to_image(cam_pts)
    zeros = np.zeros(3, np.float32)
    ref = cv2.projectPoints(cam_pts[None], zeros, zeros, cam.intrinsic_matrix,
                            cam.distortion_coeffs)[0][:, 0, :]
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_undistort_roundtrip_matches_cv2():
    cam = make_distorted_camera()
    rng = np.random.RandomState(1)
    pix = rng.uniform([200, 100], [1700, 980], (50, 2)).astype(np.float32)
    ours = cam.image_to_camera(pix)
    ref = cv2.undistortPoints(pix[None], cam.intrinsic_matrix,
                              cam.distortion_coeffs)[:, 0, :] if pix.ndim == 2 else None
    ref = cv2.undistortPoints(np.expand_dims(pix, 0), cam.intrinsic_matrix,
                              cam.distortion_coeffs, None, None, None)
    ref = cv2.convertPointsToHomogeneous(ref)[:, 0, :]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_world_camera_roundtrip():
    cam = make_distorted_camera()
    rng = np.random.RandomState(2)
    world = rng.uniform(-1000, 1000, (20, 3)).astype(np.float32)
    np.testing.assert_allclose(
        cam.camera_to_world(cam.world_to_camera(world)), world, atol=1e-2)


def test_image_world_roundtrip_undistorted():
    cam = make_distorted_camera()
    cam.undistort()
    rng = np.random.RandomState(3)
    pix = rng.uniform(0, [1920, 1080], (20, 2)).astype(np.float32)
    back = cam.world_to_image(cam.image_to_world(pix, 3000.0))
    np.testing.assert_allclose(back, pix, atol=1e-2)


def test_turn_towards_centers_target():
    cam = make_distorted_camera()
    cam.undistort()
    target = cam.image_to_world(np.float32([500, 700]), 4000.0)
    cam.turn_towards(target_world_point=target)
    cam.center_principal_point((257, 257))
    projected = cam.world_to_image(target)
    np.testing.assert_allclose(projected, [128.5, 128.5], atol=1e-2)


def test_homography_consistency_with_reproject_points():
    cam = make_distorted_camera()
    cam.undistort()
    new_cam = cam.copy()
    new_cam.turn_towards(target_image_point=np.float32([800, 400]))
    new_cam.square_pixels()
    new_cam.zoom(0.3)
    new_cam.center_principal_point((257, 257))

    rng = np.random.RandomState(4)
    pts = rng.uniform([400, 200], [1200, 800], (30, 2)).astype(np.float32)
    via_points = reproject_points(pts, cam, new_cam)

    # homography maps new-cam pixels -> old-cam pixels (warp direction)
    hom = get_homography(cam, new_cam)
    homog = np.concatenate([via_points, np.ones((30, 1))], axis=1)
    back = homog @ hom.T
    back = back[:, :2] / back[:, 2:]
    np.testing.assert_allclose(back, pts, atol=1e-2)


def test_horizontal_flip_mirrors_x():
    cam = make_distorted_camera()
    cam.undistort()
    cam.turn_towards(target_image_point=np.float32([960, 540]))
    cam.center_principal_point((257, 257))
    world = cam.image_to_world(np.float32([50, 100]), 3000.0)
    cam.horizontal_flip()
    flipped = cam.world_to_image(world)
    np.testing.assert_allclose(flipped, [257 - 50, 100], atol=1e-2)


def test_triangulate_recovers_point():
    K = np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]], np.float32)
    cam1 = Camera([0, 0, 0], np.eye(3), K, None)
    cam2 = Camera([1000, 0, 0], cv2.Rodrigues(np.float32([0, -0.2, 0]))[0], K, None)
    world = np.float32([[200, -100, 4000], [-300, 250, 3500]])
    p1 = cam1.world_to_image(world)
    p2 = cam2.world_to_image(world)
    rec = triangulate([cam1, cam2], [p1, p2])
    np.testing.assert_allclose(rec, world, atol=1.0)


def test_look_at_box_fits_far_side():
    cam = make_distorted_camera()
    box = np.float32([800, 300, 200, 500])
    new_cam = look_at_box(cam, box, 257)
    # principal point centered
    np.testing.assert_allclose(new_cam.intrinsic_matrix[:2, 2],
                               [128.5, 128.5], atol=1e-3)
    assert new_cam.distortion_coeffs is None


def test_boxlib_iou():
    a = np.float32([0, 0, 10, 10])
    b = np.float32([5, 5, 10, 10])
    assert abs(boxlib.iou(a, b) - 25 / 175) < 1e-6
    np.testing.assert_allclose(
        boxlib.expand_to_square(np.float32([0, 0, 4, 8])), [-2, 0, 8, 8])


def test_crop_pipeline_matches_reference_sequence():
    """Replicates datasets.py:78-116's virtual-camera synthesis and checks the
    skeleton GT transform stays consistent with the homography warp."""
    cam = make_distorted_camera()
    bbox = np.float32([700, 250, 300, 600])
    side_in = 257

    center = bbox[:2] + bbox[2:] / 2
    height = np.array([0, bbox[3] / 2])
    far_side = np.stack([center - height, center + height])

    new_cam = cam.copy()
    new_cam.turn_towards(center)
    new_cam.undistort()
    new_cam.square_pixels()
    far = new_cam.world_to_image(cam.image_to_world(far_side))
    far_dist = np.linalg.norm(far[0] - far[1])
    new_cam.zoom(side_in / far_dist)
    new_cam.center_principal_point((side_in, side_in))

    # the bbox center should land at the crop center
    c_world = cam.image_to_world(center, 4000.0)
    np.testing.assert_allclose(new_cam.world_to_image(c_world),
                               [side_in / 2, side_in / 2], atol=1e-2)
    # the far side should span the full crop height
    far_in_new = new_cam.world_to_image(cam.image_to_world(far_side))
    span = np.linalg.norm(far_in_new[0] - far_in_new[1])
    np.testing.assert_allclose(span, side_in, rtol=1e-4)


def test_rotate_matches_scipy_intrinsic_yxz():
    """Camera.rotate uses transforms3d euler2mat(yaw, pitch, roll, 'ryxz').T
    (cameralib.py:110-112); verify our euler2mat against scipy's intrinsic
    YXZ convention."""
    from scipy.spatial.transform import Rotation

    from pose_tpu.geometry.rotations import euler2mat

    rng = np.random.RandomState(7)
    for _ in range(5):
        yaw, pitch, roll = rng.uniform(-1.5, 1.5, 3)
        ours = euler2mat(yaw, pitch, roll, 'ryxz')
        ref = Rotation.from_euler('YXZ', [yaw, pitch, roll]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_static_euler_matches_scipy():
    from scipy.spatial.transform import Rotation

    from pose_tpu.geometry.rotations import euler2mat

    rng = np.random.RandomState(8)
    for _ in range(5):
        a, b, c = rng.uniform(-1.5, 1.5, 3)
        ours = euler2mat(a, b, c, 'syxz')
        ref = Rotation.from_euler('yxz', [a, b, c]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_axangle_matches_cv2_rodrigues():
    from pose_tpu.geometry.rotations import axangle2mat

    rng = np.random.RandomState(9)
    for _ in range(5):
        v = rng.uniform(-1, 1, 3)
        ours = axangle2mat(v)
        ref = cv2.Rodrigues(v.astype(np.float64))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_quat_roundtrip():
    from pose_tpu.geometry.rotations import axangle2mat, mat2quat, quat2mat

    rng = np.random.RandomState(10)
    for _ in range(5):
        m = axangle2mat(rng.uniform(-2, 2, 3))
        np.testing.assert_allclose(quat2mat(mat2quat(m)), m, atol=1e-9)


def test_calibrate_extrinsics_matches_quaternion_oracle():
    """The docstring's parity claim (camera.py:319): our axis-angle
    refinement reaches the same optimum as the reference's quaternion
    parameterization (cameralib.py:473-527) — same objective (projection
    residual over [R|t] in the similarity-normalized frame), different
    chart. Note the DLT linear estimate alone is EXACT on clean data
    (rank-11 system); the refinement then restricts to calibrated form in
    the normalized frame, so exact ground-truth recovery is NOT expected —
    identity of the two implementations' optima is the contract."""
    import scipy.optimize

    from pose_tpu.geometry import calibrate_extrinsics
    from pose_tpu.geometry.camera import _similarity_normalizer
    from pose_tpu.geometry.rotations import quat2mat

    rng = np.random.RandomState(11)
    R = cv2.Rodrigues(np.float64([0.3, -0.15, 0.45]))[0]
    eye = np.float64([500, -200, 1200])
    P_true = np.concatenate([R, -R @ eye[:, None]], axis=1)

    pts3d = rng.uniform(-1000, 1000, (24, 3)) + [0, 0, 4000]
    h3w = np.concatenate([pts3d, np.ones((24, 1))], axis=1)
    proj = h3w @ P_true.T
    pts2d = proj[:, :2] / proj[:, 2:]

    ours = calibrate_extrinsics(pts2d[:16], pts3d[:16])

    # independent oracle: same normalized objective, quaternion chart
    fwd2, back2 = _similarity_normalizer(pts2d[:16])
    fwd3, _ = _similarity_normalizer(pts3d[:16])
    h2 = np.concatenate([pts2d[:16], np.ones((16, 1))], axis=1) @ fwd2.T
    h3 = np.concatenate([pts3d[:16], np.ones((16, 1))], axis=1) @ fwd3.T

    def unpack(vec):
        q = vec[3:] / np.linalg.norm(vec[3:])
        rot = quat2mat(q)
        return np.concatenate([rot, -rot @ vec[:3, None]], axis=1)

    def residual(vec):
        p = h3 @ unpack(vec).T
        return ((p[:, :2] / p[:, 2:]) - h2[:, :2]).ravel()

    # same DLT linear initialization both implementations use (standard
    # rows [0,-X,yX; X,0,-xX]), polar-projected to a rotation
    from pose_tpu.geometry.rotations import mat2quat
    rows = np.zeros((16, 2, 3, 4))
    rows[:, 0, 1] = -h3
    rows[:, 0, 2] = h2[:, 1:2] * h3
    rows[:, 1, 0] = h3
    rows[:, 1, 2] = -h2[:, 0:1] * h3
    _, _, vh = np.linalg.svd(rows.reshape(32, 12), full_matrices=False)
    p_lin = vh[-1].reshape(3, 4)
    if np.linalg.det(p_lin[:, :3]) < 0:
        p_lin = -p_lin
    u, _, vt = np.linalg.svd(p_lin[:, :3])
    rot0 = u @ vt
    eye0 = -np.linalg.inv(p_lin[:, :3]) @ p_lin[:, 3]
    x0 = np.concatenate([eye0, mat2quat(rot0)])
    fit = scipy.optimize.least_squares(residual, x0=x0)
    oracle = back2 @ unpack(fit.x) @ fwd3
    oracle /= np.cbrt(np.linalg.det(oracle[:3, :3]))

    # same optimum => same projective map: compare reprojections of
    # held-out points between the two implementations
    for P in (ours, oracle):
        assert np.linalg.det(P[:3, :3]) > 0
    po = h3w[16:] @ ours.T
    pq = h3w[16:] @ oracle.T
    np.testing.assert_allclose(po[:, :2] / po[:, 2:], pq[:, :2] / pq[:, 2:],
                               atol=1e-4)


def test_camera_in_new_world_preserves_pixels():
    """Re-expressing a camera in another camera's frame must leave every
    projection unchanged when the world points are re-expressed too
    (cameralib.py:347-351)."""
    from pose_tpu.geometry import camera_in_new_world

    cam = make_distorted_camera()
    w = Camera([300, -100, 50], cv2.Rodrigues(np.float32([0, 0.4, -0.1]))[0],
               np.eye(3, dtype=np.float32), None)
    rng = np.random.RandomState(12)
    world = (rng.uniform(-500, 500, (15, 3)) + [100, 200, 2500]).astype(
        np.float32)
    new_cam = camera_in_new_world(cam, w)
    np.testing.assert_allclose(new_cam.world_to_image(w.world_to_camera(world)),
                               cam.world_to_image(world), atol=2e-2)


def test_get_affine_matches_reproject_points():
    """For intrinsics-only changes the affine map must agree with the full
    reprojection (cameralib.py:446-460)."""
    from pose_tpu.geometry import get_affine

    cam = make_distorted_camera()
    cam.undistort()
    new_cam = cam.copy()
    new_cam.zoom(1.7)
    new_cam.center_principal_point((257, 257))

    rng = np.random.RandomState(13)
    pts = rng.uniform([400, 200], [1500, 900], (20, 2)).astype(np.float32)
    affine = get_affine(cam, new_cam)
    homog = np.concatenate([pts, np.ones((20, 1))], axis=1)
    via_affine = (homog @ affine.T)[:, :2]
    # f32 coordinate math at ~1400 px scale carries ~0.1 px rounding
    np.testing.assert_allclose(via_affine, reproject_points(pts, cam, new_cam),
                               atol=0.2)

    # moved optical center must be rejected
    moved = cam.copy()
    moved.t = moved.t + np.float32([10, 0, 0])
    with pytest.raises(Exception, match='optical center'):
        get_affine(cam, moved)


def test_look_at_skeleton_frames_all_joints():
    from pose_tpu.geometry import look_at_skeleton

    cam = make_distorted_camera()
    rng = np.random.RandomState(14)
    skel_cam = np.concatenate(
        [rng.uniform(-400, 400, (19, 2)), rng.uniform(3500, 4500, (19, 1))],
        axis=1).astype(np.float32)
    side = 257
    new_cam = look_at_skeleton(cam, skel_cam, side)
    world = cam.camera_to_world(skel_cam)
    pix = new_cam.world_to_image(world)
    assert pix.min() >= 0 and pix.max() < side
    np.testing.assert_allclose(new_cam.intrinsic_matrix[:2, 2],
                               [side / 2, side / 2], atol=1e-3)


def test_undistort_points_roundtrip():
    from pose_tpu.geometry import undistort_points

    cam = make_distorted_camera()
    rng = np.random.RandomState(15)
    pts = rng.uniform([400, 200], [1500, 900], (20, 2)).astype(np.float32)
    pinhole, mapped = undistort_points(cam, pts)
    assert pinhole.distortion_coeffs is None
    # fixed-point undistort convergence + f32 rounding: ~0.1 px
    np.testing.assert_allclose(reproject_points(mapped, pinhole, cam), pts,
                               atol=0.2)


def test_visibility_helpers():
    from pose_tpu.geometry.camera import is_all_visible_in_new_camera

    cam = make_distorted_camera()
    cam.undistort()
    image = np.zeros((1080, 1920, 3), np.uint8)
    # zooming IN (crop strictly inside the source) keeps every lookup inside
    inside = cam.copy()
    inside.zoom(3.0)
    inside.center_principal_point((257, 257))
    assert is_all_visible_in_new_camera(image, cam, inside, (257, 257))
    # zooming far OUT samples outside the source frame
    outside = cam.copy()
    outside.zoom(0.05)
    outside.center_principal_point((257, 257))
    assert not is_all_visible_in_new_camera(image, cam, outside, (257, 257))


def test_triangulate_single_and_view_checks():
    from pose_tpu.geometry import triangulate_single

    K = np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]], np.float32)
    cam1 = Camera([0, 0, 0], np.eye(3), K, None)
    cam2 = Camera([1000, 0, 0], cv2.Rodrigues(np.float32([0, -0.2, 0]))[0],
                  K, None)
    world = np.float32([200, -100, 4000])
    rec = triangulate_single(
        [cam1, cam2], [cam1.world_to_image(world), cam2.world_to_image(world)])
    np.testing.assert_allclose(rec, world, atol=1.0)
    with pytest.raises(Exception, match='two views'):
        triangulate([cam1], [cam1.world_to_image(world)[None]])


def test_orbit_around_preserves_distance():
    cam = make_distorted_camera()
    point = np.float32([100, 50, 2000])
    d_before = np.linalg.norm(cam.t - point)
    cam.orbit_around(point, 0.7)
    assert abs(np.linalg.norm(cam.t - point) - d_before) < 1e-2
    # R stays orthonormal
    np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-5)
