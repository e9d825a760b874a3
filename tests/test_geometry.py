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


def test_orbit_around_preserves_distance():
    cam = make_distorted_camera()
    point = np.float32([100, 50, 2000])
    d_before = np.linalg.norm(cam.t - point)
    cam.orbit_around(point, 0.7)
    assert abs(np.linalg.norm(cam.t - point) - d_before) < 1e-2
    # R stays orthonormal
    np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-5)
