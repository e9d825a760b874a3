"""Host camera API: a thin stateful adapter over the functional core.

All geometry math lives in pose_tpu.geometry.funcam as pure, batched array
functions (SURVEY.md §7.1). This module keeps the object surface the rest of
the stack (and the reference's sample pickles, which contain
`cameralib.Camera` instances) expects: an instance with `R`, `t`,
`intrinsic_matrix`, `distortion_coeffs`, `world_up` attributes and in-place
mutator methods. Every method body just round-trips through funcam.

Semantics replicated from the reference geometry core (cameralib.py:44-605):
world->cam is `R @ (p - t)`; mutators synthesize virtual crop cameras;
`reproject_points`/`get_homography` relate co-centered cameras;
`triangulate`/`calibrate_extrinsics` are the multi-view utilities. The
distortion model quirks are documented in funcam.
"""

import numpy as np

from . import boxlib, funcam
from .rotations import axangle2mat, mat2quat


class Camera:
    def __init__(self, optical_center=None, rot_world_to_cam=None,
                 intrinsic_matrix=np.eye(3), distortion_coeffs=None,
                 world_up=(0, 0, 1), extrinsic_matrix=None):
        """Either (optical_center, rot_world_to_cam) or extrinsic_matrix
        positions the camera; distortion_coeffs are OpenCV-ordered
        (k1, k2, p1, p2, k3) or None for a pure pinhole."""
        if extrinsic_matrix is not None:
            if optical_center is not None:
                raise Exception('optical_center conflicts with '
                                'extrinsic_matrix — pass only one.')
            if rot_world_to_cam is not None:
                raise Exception('rot_world_to_cam conflicts with '
                                'extrinsic_matrix — pass only one.')
            ext = np.asarray(extrinsic_matrix, np.float64)
            rot = ext[:3, :3]
            eye = -rot.T @ ext[:3, 3]
        else:
            rot = np.eye(3) if rot_world_to_cam is None else rot_world_to_cam
            eye = np.zeros(3) if optical_center is None else optical_center

        kmat = np.asarray(intrinsic_matrix, np.float32)
        if np.abs(kmat[2] - np.array([0, 0, 1])).max() > 1e-6:
            raise Exception(
                f'intrinsic_matrix must have bottom row (0, 0, 1); '
                f'got {kmat[2]}.')

        self._adopt(funcam.make(rot, eye, kmat, distortion_coeffs, world_up))

    # ------------------------------------------------------- funcam plumbing

    def arrays(self):
        """The camera as a funcam.CamArrays pytree (no copy)."""
        return funcam.CamArrays(self.R, self.t, self.intrinsic_matrix,
                                self.distortion_coeffs, self.world_up)

    def _adopt(self, cam_arrays):
        self.R = np.asarray(cam_arrays.rot, np.float32)
        self.t = np.asarray(cam_arrays.eye, np.float32)
        self.intrinsic_matrix = np.asarray(cam_arrays.kmat, np.float32)
        self.distortion_coeffs = cam_arrays.dist
        self.world_up = np.asarray(cam_arrays.up)
        return self

    @classmethod
    def from_arrays(cls, cam_arrays):
        out = cls.__new__(cls)
        return out._adopt(cam_arrays)

    @staticmethod
    def create2D(imshape=(0, 0)):
        kmat = np.eye(3)
        kmat[:2, 2] = [imshape[1] / 2, imshape[0] / 2]
        return Camera([0, 0, 0], np.eye(3), kmat, None)

    def copy(self):
        return Camera.from_arrays(funcam.CamArrays(
            self.R.copy(), self.t.copy(), self.intrinsic_matrix.copy(),
            None if self.distortion_coeffs is None
            else np.array(self.distortion_coeffs),
            np.array(self.world_up)))

    def _points(self, fn, points, *args, **kwargs):
        """Apply an (N, d)-point funcam function, accepting single points."""
        pts = np.asarray(points, np.float32)
        if pts.ndim == 1:
            return fn(self.arrays(), pts[None], *args, **kwargs)[0]
        return fn(self.arrays(), pts, *args, **kwargs)

    # ------------------------------------------------------------ transforms

    def camera_to_image(self, points):
        return self._points(funcam.project, points)

    def world_to_camera(self, points):
        return self._points(funcam.to_camera_frame, points)

    def camera_to_world(self, points):
        return self._points(funcam.from_camera_frame, points)

    def world_to_image(self, points):
        return self._points(funcam.world_to_image, points)

    def image_to_camera(self, points, depth=1):
        return self._points(funcam.image_to_camera, points, depth)

    def image_to_world(self, points, camera_depth=1):
        return self._points(funcam.image_to_world, points, camera_depth)

    def is_visible(self, world_points, imsize):
        return self._points(funcam.visible_mask, world_points, imsize)

    # -------------------------------------------------------------- mutators

    def rotate(self, yaw=0, pitch=0, roll=0):
        self._adopt(funcam.rotated(self.arrays(), yaw, pitch, roll))

    def absolute_rotate(self, yaw=0, pitch=0, roll=0):
        self._adopt(funcam.absolute_rotated(self.arrays(), yaw, pitch, roll))

    def zoom(self, factor):
        self._adopt(funcam.zoomed(self.arrays(), factor))

    def scale_output(self, factor):
        self._adopt(funcam.output_scaled(self.arrays(), factor))

    def undistort(self):
        self._adopt(funcam.undistorted(self.arrays()))

    def square_pixels(self):
        self._adopt(funcam.pixels_squared(self.arrays()))

    def unskew_pixels(self):
        self._adopt(funcam.pixels_unskewed(self.arrays()))

    def horizontal_flip(self):
        self._adopt(funcam.flipped_horizontal(self.arrays()))

    def center_principal_point(self, imshape):
        self._adopt(funcam.principal_centered(self.arrays(), imshape))

    def shift_to_center(self, desired_center_image_point, imshape):
        target = np.float32([imshape[1], imshape[0]]) / 2
        self._adopt(funcam.principal_shifted(
            self.arrays(), target - desired_center_image_point))

    def shift_to_desired(self, current_coords_of_the_point,
                         target_coords_of_the_point):
        self._adopt(funcam.principal_shifted(
            self.arrays(), np.asarray(target_coords_of_the_point)
            - current_coords_of_the_point))

    def turn_towards(self, target_image_point=None, target_world_point=None):
        assert (target_image_point is None) != (target_world_point is None)
        if target_world_point is None:
            target_world_point = self.image_to_world(target_image_point)
        self._adopt(funcam.turned_towards(self.arrays(), target_world_point))

    def upright(self):
        self._adopt(funcam.made_upright(self.arrays()))

    def orbit_around(self, world_point, angle_radians, axis='vertical'):
        self._adopt(funcam.orbited(self.arrays(), world_point, angle_radians,
                                   axis))

    def crop_from(self, point):
        self._adopt(funcam.cropped_from(self.arrays(), point))

    # ------------------------------------------------------------- matrices

    def get_projection_matrix(self):
        return funcam.projection_matrix(self.arrays())

    def get_extrinsic_matrix(self):
        return funcam.extrinsic_matrix(self.arrays())


# ------------------------------------------------------------ free functions


def build_extrinsic_matrix(rot_world_to_cam, optical_center_world):
    return funcam.extrinsic_matrix(funcam.make(
        rot_world_to_cam, optical_center_world))


def camera_in_new_world(camera, new_world_camera):
    """Re-express a camera in the coordinate frame of another camera."""
    w = new_world_camera
    new_up = w.world_to_camera(camera.world_up) - w.t
    return Camera(w.R @ (camera.t - w.t), camera.R @ w.R.T,
                  camera.intrinsic_matrix, camera.distortion_coeffs, new_up)


def project_points(points, distortion_coeffs, intrinsic_matrix):
    """Reference-compatible distorted projection (cameralib.py:636-658);
    the polynomial itself lives in funcam.distort_project."""
    d = np.zeros(5, np.float32)
    d[:len(distortion_coeffs)] = distortion_coeffs
    return funcam.distort_project(np.asarray(points, np.float32), d,
                                  np.asarray(intrinsic_matrix, np.float32))


def allclose_or_nones(a, b):
    """True when both are None, both are equal, or one is None and the other
    is all-zero (an absent distortion vector)."""
    if a is None or b is None:
        other = a if b is None else b
        return other is None or not np.any(other)
    return np.allclose(a, b)


def reproject_points(points, old_camera, new_camera):
    """Map pixel points between cameras sharing an optical center
    (cameralib.py:354-375): homography fast path when both are pinhole,
    relative-intrinsics shortcut when only intrinsics differ, general
    undistort->redistort path otherwise."""
    points = np.asarray(points, np.float32)
    single = points.ndim == 1      # a bare (2,) point, as the reference
    if single:                     # supports (cameralib.py:354-375)
        points = points[None]
    old, new = old_camera.arrays(), new_camera.arrays()
    if old.dist is None and new.dist is None:
        out = funcam.reproject_pixels(points, old, new)
        return out[0] if single else out

    if not np.allclose(old.eye, new.eye):
        raise Exception('reproject_points requires co-centered cameras; the '
                        'optical centers differ.')

    if (np.allclose(new.rot, old.rot)
            and allclose_or_nones(new.dist, old.dist)):
        rel = new.kmat @ np.linalg.inv(old.kmat)
        out = funcam.apply_intrinsics(rel, points)
    else:
        out = funcam.reproject_pixels(points, old, new)
    return out[0] if single else out


def reproject_points_fast(points, old_camera, new_camera):
    return funcam.reproject_pixels(np.asarray(points, np.float32),
                                   old_camera.arrays(), new_camera.arrays())


def get_homography(src_camera, dst_camera):
    """3x3 mapping dst pixels -> src pixels (cameralib.py:608-620)."""
    if not np.allclose(src_camera.t, dst_camera.t):
        raise Exception('A homography only relates co-centered cameras; the '
                        'optical centers differ.')
    return funcam.homography_between(src_camera.arrays(),
                                     dst_camera.arrays())


def get_affine(src_camera, dst_camera):
    """Affine src->dst for in-plane (intrinsics-only) changes
    (cameralib.py:446-460), from three point correspondences."""
    if (not np.allclose(src_camera.t, dst_camera.t)
            or not np.allclose(src_camera.R[2], dst_camera.R[2])):
        raise Exception('An affine map needs the optical center and the look '
                        'direction to be unchanged.')
    src_pts = np.float32([[0, 0], [1, 0], [0, 1]])
    dst_pts = reproject_points(src_pts, src_camera, dst_camera)
    affine = np.eye(3)
    affine[:2, 0] = dst_pts[1] - dst_pts[0]
    affine[:2, 1] = dst_pts[2] - dst_pts[0]
    affine[:2, 2] = dst_pts[0]
    return affine


def undistort_points(cam, points):
    if cam.distortion_coeffs is None:
        return cam.copy(), points
    pinhole = Camera.from_arrays(funcam.undistorted(cam.arrays()))
    return pinhole, reproject_points(np.asarray(points, np.float32), cam,
                                     pinhole)


def triangulate(cameras, pointlists):
    """Multi-view DLT, vectorized over points: one batched SVD solves every
    joint at once (replaces the reference's per-point loop,
    cameralib.py:530-547)."""
    pairs = [undistort_points(c, np.asarray(p, np.float64))
             for c, p in zip(cameras, pointlists)]
    if len(pairs) < 2:
        # one view gives a 2x4 system with a 2-dim null space: vh[:, -1]
        # would silently return an arbitrary point on the viewing ray
        raise Exception('Triangulation needs at least two views.')
    if len({len(p) for _, p in pairs}) != 1:
        raise Exception('Every view must supply one 2D point per 3D point.')
    proj = np.stack([c.get_projection_matrix() for c, _ in pairs])  # (V,3,4)
    pts = np.stack([np.asarray(p, np.float64) for _, p in pairs])   # (V,N,2)

    # rows: x_i * P[2] - P[:2] per view -> (N, 2V, 4)
    rows = (pts[..., None] * proj[:, None, 2:3, :] - proj[:, None, :2, :])
    system = rows.transpose(1, 0, 2, 3).reshape(pts.shape[1], -1, 4)
    _, _, vh = np.linalg.svd(system, full_matrices=False)
    sol = vh[:, -1]
    return (sol[:, :3] / sol[:, 3:]).astype(np.float32)


def triangulate_single(cameras, points):
    return triangulate(cameras, [np.asarray(p, np.float64)[None]
                                 for p in points])[0]


def _similarity_normalizer(points):
    """Forward/backward similarity transforms centering the points with unit
    scalar spread (the DLT preconditioning of H&Z Algorithm 7.1)."""
    dim = points.shape[1]
    mean = points.mean(axis=0)
    spread = points.std()
    backward = np.eye(dim + 1)
    backward[:dim, :dim] *= spread
    backward[:dim, dim] = mean
    return np.linalg.inv(backward), backward


def calibrate_extrinsics(points2d, points3d):
    """Camera pose from 2D-3D correspondences with known intrinsics applied
    upstream: normalized DLT linear estimate + rotation-vector least-squares
    refinement (reference analogue: cameralib.py:473-527, which refines over
    quaternions — the parameterization differs, the optimum is the same)."""
    import scipy.optimize

    points2d = np.asarray(points2d, np.float64)
    points3d = np.asarray(points3d, np.float64)
    if len(points2d) != len(points3d):
        raise Exception('Need one 2D point per 3D point.')
    n = len(points3d)

    fwd2, back2 = _similarity_normalizer(points2d)
    fwd3, _ = _similarity_normalizer(points3d)
    h2 = np.concatenate([points2d, np.ones((n, 1))], axis=1) @ fwd2.T
    h3 = np.concatenate([points3d, np.ones((n, 1))], axis=1) @ fwd3.T

    # DLT rows per correspondence: [0, -X, yX] and [X, 0, -xX]
    rows = np.zeros((n, 2, 3, 4))
    rows[:, 0, 1] = -h3
    rows[:, 0, 2] = h2[:, 1:2] * h3
    rows[:, 1, 0] = h3
    rows[:, 1, 2] = -h2[:, 0:1] * h3
    _, _, vh = np.linalg.svd(rows.reshape(2 * n, 12), full_matrices=False)
    p_lin = vh[-1].reshape(3, 4)
    if np.linalg.det(p_lin[:, :3]) < 0:
        p_lin = -p_lin

    u, _, vt = np.linalg.svd(p_lin[:, :3])
    rot0 = u @ vt
    eye0 = -np.linalg.inv(p_lin[:, :3]) @ p_lin[:, 3]
    q = mat2quat(rot0)
    angle = 2 * np.arctan2(np.linalg.norm(q[1:]), q[0])
    axis = q[1:] / max(np.linalg.norm(q[1:]), 1e-12)
    x0 = np.concatenate([eye0, axis * angle])

    def unpack(vec):
        rot = axangle2mat(vec[3:])
        return np.concatenate([rot, -rot @ vec[:3, None]], axis=1)

    def residual(vec):
        proj = h3 @ unpack(vec).T
        return ((proj[:, :2] / proj[:, 2:]) - h2[:, :2]).ravel()

    fit = scipy.optimize.least_squares(residual, x0=x0)
    p_norm = unpack(fit.x)
    p_full = back2 @ p_norm @ fwd3
    return p_full / np.cbrt(np.linalg.det(p_full[:3, :3]))


def _fit_box_arrays(src, box, output_side):
    """funcam core of look_at_box: aim at the box center, go pinhole/square,
    zoom so the box's longer side spans output_side, center the principal
    point. `src` supplies the pixel frame the box lives in."""
    box = np.asarray(box, np.float64)
    target_px = boxlib.center(box)
    cam = funcam.turned_towards(
        src, funcam.image_to_world(src, target_px[None].astype(np.float32))[0])
    cam = funcam.pixels_squared(funcam.undistorted(cam))

    axis = 1 if box[2] < box[3] else 0          # fit the longer side
    offsets = np.zeros((2, 2))
    offsets[:, axis] = [-box[2 + axis] / 2, box[2 + axis] / 2]
    ends = funcam.reproject_pixels(
        (target_px + offsets).astype(np.float32), src, cam)
    span = abs(float(ends[1, axis] - ends[0, axis]))

    cam = funcam.zoomed(cam, output_side / span)
    return funcam.principal_centered(cam, (output_side, output_side))


def look_at_box(orig_cam, box, output_side):
    """Virtual camera framing a pixel-space bbox (cameralib.py:561-582)."""
    return Camera.from_arrays(
        _fit_box_arrays(orig_cam.arrays(), box, output_side))


def look_at_skeleton(orig_cam, cam_coords, output_side):
    """Iteratively frame a skeleton (cameralib.py:585-605): project, box the
    joints, expand by a metric margin (>=1.15x, targeting ~1700mm half-diag),
    re-aim; five rounds."""
    world = funcam.from_camera_frame(orig_cam.arrays(),
                                     np.asarray(cam_coords, np.float32))
    cam = orig_cam.arrays()
    for _ in range(5):
        pts_cam = funcam.to_camera_frame(cam, world)
        pix = funcam.project(cam, pts_cam)
        box = boxlib.expand_to_square(boxlib.bb_of_points(pix))

        anchor_depth = pts_cam[-1, 2]
        ends_px = np.stack([box[:2], box[:2] + box[2:] / 2]).astype(np.float32)
        ends_world = funcam.image_to_world(cam, ends_px, anchor_depth)
        half_diag_mm = np.linalg.norm(ends_world[1] - ends_world[0])

        box = boxlib.expand(box, max(1.15, 1700 / half_diag_mm))
        if np.min(box[2:]) < 1:
            box = np.array([0, 0, 5, 5], np.float64)
        cam = _fit_box_arrays(cam, box, output_side)
    return Camera.from_arrays(cam)


def visibility_homography_coords(old_camera, new_camera, output_imshape):
    """Source coords of every output pixel under the relating homography
    (cameralib.py:714-725)."""
    hom = get_homography(old_camera, new_camera).astype(np.float32)
    y, x = np.mgrid[:output_imshape[0], :output_imshape[1]].astype(np.float32)
    denom = hom[2, 0] * x + hom[2, 1] * y + hom[2, 2]
    sx = (hom[0, 0] * x + hom[0, 1] * y + hom[0, 2]) / denom
    sy = (hom[1, 0] * x + hom[1, 1] * y + hom[1, 2]) / denom
    return np.stack([sx, sy])


def is_all_visible_in_new_camera(image, old_camera, new_camera,
                                 output_imshape):
    """True when the whole reprojected view samples inside `image`."""
    x, y = visibility_homography_coords(old_camera, new_camera,
                                        output_imshape)
    return bool((x.min() >= 0) & (x.max() < image.shape[1])
                & (y.min() >= 0) & (y.max() < image.shape[0]))
