"""Functional, batched camera core (SURVEY.md §7.1).

A camera is a pytree of plain arrays — no object state, no mutation. The
functions broadcast over arbitrary leading batch dimensions, so a whole
batch of per-sample crop cameras can be synthesized with one numpy call
chain (and the same code jit/vmaps under JAX if handed jnp arrays). Two
exceptions are single-camera only and say so in their docstrings
(absolute_rotated, orbited — their axis selection is data-dependent). The OO
`pose_tpu.geometry.camera.Camera` class is a thin stateful adapter over this
module kept only for the reference's pickle/API surface.

Conventions (reference parity, cameralib.py:44-63):
  camera frame: x right, y down, z forward;
  point_cam = rot @ (point_world - eye);
  kmat maps camera space to homogeneous pixels, kmat[2] == (0, 0, 1);
  dist is the OpenCV coefficient vector (k1, k2, p1, p2, k3) or None.

Behavioural parity notes:
- the forward distortion replicates the reference's inlined polynomial
  (cameralib.py:636-658), whose tangential terms deviate from stock OpenCV;
- undistortion is the OpenCV fixed-point iteration (replaces
  cv2.undistortPoints, cameralib.py:196) so there is no native dependency;
- world->camera uses rot, camera->world uses inv(rot) — not rot.T — to match
  the reference's numerics for not-quite-orthonormal calibration matrices.
"""

from typing import NamedTuple, Optional

import numpy as np


class CamArrays(NamedTuple):
    """Array-of-structs camera: every field broadcasts over leading dims."""
    rot: np.ndarray                  # (..., 3, 3) world->cam rotation
    eye: np.ndarray                  # (..., 3) optical center in world coords
    kmat: np.ndarray                 # (..., 3, 3) intrinsics
    dist: Optional[np.ndarray]       # (..., 5) OpenCV coeffs, or None
    up: np.ndarray                   # (..., 3) world up direction


def make(rot=None, eye=None, kmat=None, dist=None, up=(0, 0, 1)):
    rot = np.eye(3, dtype=np.float32) if rot is None else np.asarray(
        rot, np.float32)
    eye = np.zeros(3, np.float32) if eye is None else np.asarray(
        eye, np.float32)
    kmat = np.eye(3, dtype=np.float32) if kmat is None else np.asarray(
        kmat, np.float32)
    if dist is not None:
        dist = np.asarray(dist, np.float32)
    return CamArrays(rot, eye, kmat, dist, np.asarray(up))


def stack(cams):
    """Stack single cameras into one batched CamArrays. Cameras must agree on
    whether they are distorted; distortion vectors are padded to 5."""
    dists = [c.dist for c in cams]
    if any(d is not None for d in dists):
        padded = []
        for d in dists:
            v = np.zeros(5, np.float32)
            if d is not None:
                v[:d.shape[-1]] = d
            padded.append(v)
        dist = np.stack(padded)
    else:
        dist = None
    return CamArrays(np.stack([c.rot for c in cams]),
                     np.stack([c.eye for c in cams]),
                     np.stack([c.kmat for c in cams]),
                     dist,
                     np.stack([np.asarray(c.up, np.float64) for c in cams]))


def index(cams, i):
    """Select camera i from a batched CamArrays."""
    return CamArrays(cams.rot[i], cams.eye[i], cams.kmat[i],
                     None if cams.dist is None else cams.dist[i], cams.up[i])


def _unit(v, axis=-1):
    return v / np.linalg.norm(v, axis=axis, keepdims=True)


def _matvec(m, v):
    """(..., 3, 3) x (..., N, 3) -> (..., N, 3) applying m to each row of v."""
    return np.einsum('...ij,...nj->...ni', m, v)


# --------------------------------------------------------------- transforms
# points are (..., N, 3) camera/world or (..., N, 2) pixels; a batched camera
# broadcasts against the leading dims.


def to_camera_frame(cam, world_points):
    world_points = np.asarray(world_points, np.float32)
    return _matvec(cam.rot, world_points - cam.eye[..., None, :]).astype(
        np.float32)


def from_camera_frame(cam, cam_points):
    cam_points = np.asarray(cam_points, np.float32)
    rot_inv = np.linalg.inv(cam.rot)
    return (_matvec(rot_inv, cam_points)
            + cam.eye[..., None, :]).astype(np.float32)


def distort_project(cam_points, dist, kmat):
    """Perspective projection with the reference's distortion polynomial
    (cameralib.py:636-658). The tangential part is kept bit-compatible with
    the reference, which differs from stock OpenCV: the 2*p*x/2*p*y terms
    fold into the radial multiplier and the r^2 terms drop the 2x^2/2y^2."""
    cam_points = np.asarray(cam_points, np.float32)
    p = cam_points[..., :2] / cam_points[..., 2:]
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    k1, k2, p1, p2, k3 = (dist[..., None, i] for i in range(5))
    radial = np.float32(1.0) + r2 * (k1 + r2 * (k2 + r2 * k3))
    mult = radial + 2 * p2 * x + 2 * p1 * y
    distorted = np.stack([x * mult + r2 * p2, y * mult + r2 * p1], axis=-1)
    return apply_intrinsics(kmat, distorted)


def apply_intrinsics(kmat, normalized_xy):
    """(..., N, 2) normalized coords -> pixels under (..., 3, 3) kmat."""
    return (np.einsum('...ij,...nj->...ni', kmat[..., :2, :2], normalized_xy)
            + kmat[..., None, :2, 2]).astype(np.float32)


def project(cam, cam_points):
    """Camera-frame points -> pixels (cameralib.py:128-172)."""
    cam_points = np.asarray(cam_points, np.float32)
    if cam.dist is not None:
        d = np.zeros(cam.dist.shape[:-1] + (5,), np.float32)
        d[..., :cam.dist.shape[-1]] = cam.dist
        return distort_project(cam_points, d, cam.kmat)
    return apply_intrinsics(cam.kmat, cam_points[..., :2]
                            / cam_points[..., 2:])


def world_to_image(cam, world_points):
    return project(cam, to_camera_frame(cam, world_points))


def undistort_normalized(distorted_xy, dist, num_iters=10):
    """OpenCV's undistortPoints fixed-point loop on normalized coords."""
    d = np.zeros(np.shape(dist)[:-1] + (5,), np.float64)
    d[..., :np.shape(dist)[-1]] = dist
    k1, k2, p1, p2, k3 = (d[..., None, i] for i in range(5))
    src = np.asarray(distorted_xy, np.float64)
    cur = src
    for _ in range(num_iters):
        x, y = cur[..., 0], cur[..., 1]
        r2 = x * x + y * y
        inv_radial = 1.0 / (1 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        tx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        ty = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        cur = np.stack([(src[..., 0] - tx) * inv_radial,
                        (src[..., 1] - ty) * inv_radial], axis=-1)
    return cur.astype(np.float32)


def image_to_camera(cam, pixels, depth=1):
    """Pixels -> camera-frame points at the given depth
    (cameralib.py:188-200)."""
    pixels = np.asarray(pixels, np.float32)
    k_inv = np.linalg.inv(cam.kmat.astype(np.float64))
    ones = np.ones(pixels.shape[:-1] + (1,), np.float64)
    normalized = np.einsum(
        '...ij,...nj->...ni', k_inv,
        np.concatenate([pixels.astype(np.float64), ones], axis=-1))[..., :2]
    if cam.dist is not None:
        normalized = undistort_normalized(normalized, cam.dist)
    rays = np.concatenate(
        [normalized, np.ones(normalized.shape[:-1] + (1,))], axis=-1)
    return (rays * np.asarray(depth)).astype(np.float32)


def image_to_world(cam, pixels, camera_depth=1):
    return from_camera_frame(cam, image_to_camera(cam, pixels, camera_depth))


def visible_mask(cam, world_points, imsize):
    """Inside-frame AND in-front test (cameralib.py:206-213)."""
    cam_points = to_camera_frame(cam, world_points)
    pix = project(cam, cam_points)
    imsize = np.asarray(imsize)
    inside = np.all((pix >= 0) & (pix < imsize), axis=-1)
    return inside & (cam_points[..., 2] > 0)


# ----------------------------------------------------------------- mutators
# each returns a new CamArrays; inputs are never modified.


def with_kmat(cam, kmat):
    return cam._replace(kmat=kmat.astype(np.float32))


def zoomed(cam, factor):
    """Scale focal lengths about the principal point (cameralib.py:216)."""
    f = np.asarray(factor, np.float32)
    k = np.array(cam.kmat, np.float32, copy=True)
    k[..., :2, :2] = k[..., :2, :2] * f[..., None, None]
    return with_kmat(cam, k)


def output_scaled(cam, factor):
    """Scale the image about the pixel origin (cameralib.py:221)."""
    f = np.asarray(factor, np.float32)
    k = np.array(cam.kmat, np.float32, copy=True)
    k[..., :2, :] = k[..., :2, :] * f[..., None, None]
    return with_kmat(cam, k)


def undistorted(cam):
    return cam._replace(dist=None)


def pixels_squared(cam):
    """Equalize fx/fy by row-scaling the intrinsics (cameralib.py:231)."""
    fx = cam.kmat[..., 0, 0]
    fy = cam.kmat[..., 1, 1]
    fmean = 0.5 * (fx + fy)
    k = np.array(cam.kmat, np.float32, copy=True)
    k[..., 0, :] = k[..., 0, :] * (fmean / fx)[..., None]
    k[..., 1, :] = k[..., 1, :] * (fmean / fy)[..., None]
    return with_kmat(cam, k)


def pixels_unskewed(cam):
    k = np.array(cam.kmat, np.float32, copy=True)
    k[..., 0, 1] = 0
    k[..., 1, 0] = 0
    return with_kmat(cam, k)


def flipped_horizontal(cam):
    """Negate the camera x axis (cameralib.py:244)."""
    r = np.array(cam.rot, np.float32, copy=True)
    r[..., 0, :] = -r[..., 0, :]
    return cam._replace(rot=r)


def principal_centered(cam, imshape):
    k = np.array(cam.kmat, np.float32, copy=True)
    k[..., 0, 2] = imshape[1] / 2
    k[..., 1, 2] = imshape[0] / 2
    return with_kmat(cam, k)


def principal_shifted(cam, delta_xy):
    """Move the principal point by (..., 2) pixels."""
    k = np.array(cam.kmat, np.float32, copy=True)
    k[..., :2, 2] = k[..., :2, 2] + delta_xy
    return with_kmat(cam, k)


def turned_towards(cam, target_world):
    """Aim the optical axis at a world point, roll-free w.r.t. world up
    (cameralib.py:269-288)."""
    target_world = np.asarray(target_world, np.float64)
    z = _unit(target_world - cam.eye)
    x = _unit(np.cross(z, np.broadcast_to(cam.up, z.shape)))
    y = np.cross(z, x)
    rot = np.stack([x, y, z], axis=-2).astype(np.float32)
    return cam._replace(rot=rot)


def made_upright(cam):
    """Keep the look direction, remove roll (cameralib.py:290)."""
    z = np.asarray(cam.rot[..., 2, :], np.float64)
    x = _unit(np.cross(z, np.broadcast_to(cam.up, z.shape)))
    y = np.cross(z, x)
    return cam._replace(rot=np.stack([x, y, z], axis=-2).astype(np.float32))


def rotated(cam, yaw=0, pitch=0, roll=0):
    """Rotate about the camera's own axes (cameralib.py:110)."""
    from .rotations import euler2mat
    mat = euler2mat(yaw, pitch, roll, 'ryxz').T
    return cam._replace(rot=(mat @ cam.rot).astype(np.float32))


def absolute_rotated(cam, yaw=0, pitch=0, roll=0):
    """Set absolute yaw/pitch/roll in the world frame (cameralib.py:114).
    Single camera only (the reference axis pick branches on up's values)."""
    from .rotations import euler2mat
    up = np.asarray(cam.up, np.float64)
    ref = [0, 1, 0] if up[0] > up[1] else [1, 0, 0]
    forward = _unit(np.cross(up, ref))
    right = np.cross(forward, up)
    base = np.stack([right, -up, forward])
    mat = euler2mat(-yaw, -pitch, -roll, 'syxz')
    return cam._replace(rot=(mat @ base).astype(np.float32))


def orbited(cam, world_point, angle_radians, axis='vertical'):
    """Orbit the eye around a world point (cameralib.py:307-325).
    Single camera only (axangle2mat takes one 3-vector axis)."""
    from .rotations import axangle2mat
    if axis == 'vertical':
        axis_vec = -np.asarray(cam.up, np.float64)
    else:
        axis_vec = np.cross(cam.rot[..., 2, :], cam.up)
    rot_matrix = axangle2mat(axis_vec * angle_radians)
    eye = (rot_matrix @ (cam.eye - world_point)) + world_point
    return cam._replace(eye=eye.astype(np.float32),
                        rot=(cam.rot @ rot_matrix.T).astype(np.float32))


def cropped_from(cam, corner_xy):
    return principal_shifted(cam, -np.asarray(corner_xy, np.float32))


# ------------------------------------------------------------- compositions


def extrinsic_matrix(cam):
    """(..., 4, 4) world->camera homogeneous transform."""
    shape = cam.rot.shape[:-2]
    out = np.zeros(shape + (4, 4), np.float64)
    out[..., :3, :3] = cam.rot
    out[..., :3, 3] = -np.einsum('...ij,...j->...i', cam.rot, cam.eye)
    out[..., 3, 3] = 1
    return out


def projection_matrix(cam):
    """(..., 3, 4) = K [R | -R eye]."""
    return np.einsum('...ij,...jk->...ik', cam.kmat,
                     extrinsic_matrix(cam)[..., :3, :])


def homography_between(src_cam, dst_cam):
    """(..., 3, 3) mapping dst pixels -> src pixels for cameras sharing an
    optical center: K_src R_src (K_dst R_dst)^-1 (cameralib.py:608-620)."""
    src = np.einsum('...ij,...jk->...ik', src_cam.kmat, src_cam.rot)
    dst = np.einsum('...ij,...jk->...ik', dst_cam.kmat, dst_cam.rot)
    return src @ np.linalg.inv(dst)


def reproject_pixels(points, old_cam, new_cam):
    """Map pixels between co-centered cameras, handling distortion on either
    side (cameralib.py:354-375)."""
    points = np.asarray(points, np.float32)
    if old_cam.dist is None and new_cam.dist is None:
        hom = homography_between(new_cam, old_cam)
        ones = np.ones(points.shape[:-1] + (1,), np.float32)
        mapped = np.einsum('...ij,...nj->...ni', hom,
                           np.concatenate([points, ones], axis=-1))
        return (mapped[..., :2] / mapped[..., 2:]).astype(np.float32)
    world = image_to_world(old_cam, points)
    return world_to_image(new_cam, world)
