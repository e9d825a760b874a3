"""Pinhole + OpenCV-distortion camera model (host-side, numpy).

Re-implementation of the reference geometry core (cameralib.py:44-338) with the
same semantics:

  camera coords: x right, y down, z forward;
  column_point_cam = R @ (column_point_world - t)         (cameralib.py:63)
  K maps camera space to homogeneous pixel space, K[2] == (0,0,1).

This object lives on the host: it synthesizes the *virtual crop cameras* of the
data pipeline (datasets.py:78-121) and backs the offline dataset-construction
tools. The per-pixel warping itself runs on device (pose_tpu.ops.warp); this
module only produces the 3x3 homographies the kernels consume.

Deliberate divergences from the reference:
- `cv2.undistortPoints` (cameralib.py:196) is replaced by an iterative
  Newton-style undistortion (`_undistort_points`) with the same OpenCV
  distortion model, so the geometry core has no native dependency.
- `transforms3d` / `cv2.Rodrigues` are replaced by pose_tpu.geometry.rotations.
"""

import copy

import numpy as np

from . import boxlib
from .rotations import axangle2mat, euler2mat, mat2quat, quat2mat


def support_single(f):
    """Lets a point-transform method accept a single point as well as a batch
    (reference: cameralib.py:15-29)."""

    def wrapped(self, points, *args, **kwargs):
        points = np.asarray(points, np.float32)
        if points.ndim == 1:
            return f(self, points[np.newaxis], *args, **kwargs)[0]
        return f(self, points, *args, **kwargs)

    return wrapped


class Camera:
    def __init__(self, optical_center=None, rot_world_to_cam=None,
                 intrinsic_matrix=np.eye(3), distortion_coeffs=None,
                 world_up=(0, 0, 1), extrinsic_matrix=None):
        """See cameralib.py:45-102 for the exact conventions replicated here.

        distortion_coeffs follow OpenCV order: k1, k2, p1, p2, k3 (or None).
        """
        if optical_center is not None and extrinsic_matrix is not None:
            raise Exception('At most one of `optical_center` and `extrinsic_matrix` '
                            'needs to be provided!')
        if extrinsic_matrix is not None and rot_world_to_cam is not None:
            raise Exception('At most one of `rot_world_to_cam` and `extrinsic_matrix` '
                            'needs to be provided!')

        if optical_center is None and extrinsic_matrix is None:
            optical_center = np.zeros(3)
        if rot_world_to_cam is None and extrinsic_matrix is None:
            rot_world_to_cam = np.eye(3)

        if extrinsic_matrix is not None:
            self.R = np.asarray(extrinsic_matrix[:3, :3], np.float32)
            self.t = (-self.R.T @ extrinsic_matrix[:3, 3]).astype(np.float32)
        else:
            self.R = np.asarray(rot_world_to_cam, np.float32)
            self.t = np.asarray(optical_center, np.float32)

        self.intrinsic_matrix = np.asarray(intrinsic_matrix, np.float32)
        if distortion_coeffs is None:
            self.distortion_coeffs = None
        else:
            self.distortion_coeffs = np.asarray(distortion_coeffs, np.float32)
        self.world_up = np.asarray(world_up)

        if not np.allclose(self.intrinsic_matrix[2, :], [0, 0, 1]):
            raise Exception(f'Bottom row of camera\'s intrinsic matrix must be '
                            f'(0,0,1), got {self.intrinsic_matrix[2, :]}.')

    @staticmethod
    def create2D(imshape=(0, 0)):
        intrinsics = np.eye(3)
        intrinsics[:2, 2] = [imshape[1] / 2, imshape[0] / 2]
        return Camera([0, 0, 0], np.eye(3), intrinsics, None)

    # ------------------------------------------------------------------ #
    # transforms

    def rotate(self, yaw=0, pitch=0, roll=0):
        mat = euler2mat(yaw, pitch, roll, 'ryxz').T
        self.R = (mat @ self.R).astype(np.float32)

    def absolute_rotate(self, yaw=0, pitch=0, roll=0):
        def unit_vec(v):
            return v / np.linalg.norm(v)

        if self.world_up[0] > self.world_up[1]:
            world_forward = unit_vec(np.cross(self.world_up, [0, 1, 0]))
        else:
            world_forward = unit_vec(np.cross(self.world_up, [1, 0, 0]))
        world_right = np.cross(world_forward, self.world_up)
        R = np.stack([world_right, -self.world_up, world_forward]).astype(np.float32)
        mat = euler2mat(-yaw, -pitch, -roll, 'syxz')
        self.R = (mat @ R).astype(np.float32)

    @support_single
    def camera_to_image(self, points):
        """Project 3D camera-space points to pixels, with the OpenCV radial +
        tangential distortion model when distortion_coeffs is set
        (cameralib.py:128-172, project_points :636-658)."""
        if self.distortion_coeffs is not None:
            return project_points(points, self.distortion_coeffs, self.intrinsic_matrix)
        projected = points[:, :2] / points[:, 2:]
        return projected @ self.intrinsic_matrix[:2, :2].T + self.intrinsic_matrix[:2, 2]

    @support_single
    def world_to_camera(self, points):
        points = np.asarray(points, np.float32)
        return (points - self.t) @ self.R.T

    @support_single
    def camera_to_world(self, points):
        points = np.asarray(points, np.float32)
        return points @ np.linalg.inv(self.R).T + self.t

    @support_single
    def world_to_image(self, points):
        return self.camera_to_image(self.world_to_camera(points))

    @support_single
    def image_to_camera(self, points, depth=1):
        points = np.asarray(points, np.float32)
        if self.distortion_coeffs is None:
            normalized = ((points - self.intrinsic_matrix[:2, 2]) @
                          np.linalg.inv(self.intrinsic_matrix[:2, :2]).T)
        else:
            normalized = _undistort_points(
                points, self.intrinsic_matrix, self.distortion_coeffs)
        return np.concatenate(
            [normalized, np.ones_like(normalized[:, :1])], axis=1) * depth

    @support_single
    def image_to_world(self, points, camera_depth=1):
        return self.camera_to_world(self.image_to_camera(points, camera_depth))

    @support_single
    def is_visible(self, world_points, imsize):
        imsize = np.asarray(imsize)
        cam_points = self.world_to_camera(world_points)
        im_points = self.camera_to_image(cam_points)
        is_within_frame = np.all(
            np.logical_and(0 <= im_points, im_points < imsize), axis=1)
        is_in_front_of_camera = cam_points[..., 2] > 0
        return np.logical_and(is_within_frame, is_in_front_of_camera)

    # ------------------------------------------------------------------ #
    # mutators (virtual-camera synthesis, cameralib.py:216-328)

    def zoom(self, factor):
        """factor > 1 makes objects look larger; principal point is the anchor."""
        self.intrinsic_matrix[:2, :2] *= np.expand_dims(np.float32(factor), -1)

    def scale_output(self, factor):
        """Scales the image about the origin (also moves the principal point)."""
        self.intrinsic_matrix[:2] *= np.expand_dims(np.float32(factor), -1)

    def undistort(self):
        self.distortion_coeffs = None

    def square_pixels(self):
        fx = self.intrinsic_matrix[0, 0]
        fy = self.intrinsic_matrix[1, 1]
        fmean = 0.5 * (fx + fy)
        multiplier = np.array(
            [[fmean / fx, 0, 0], [0, fmean / fy, 0], [0, 0, 1]], np.float32)
        self.intrinsic_matrix = multiplier @ self.intrinsic_matrix

    def unskew_pixels(self):
        self.intrinsic_matrix[1, 0] = 0
        self.intrinsic_matrix[0, 1] = 0

    def horizontal_flip(self):
        self.R[0] *= -1

    def center_principal_point(self, imshape):
        self.intrinsic_matrix[:2, 2] = [imshape[1] / 2, imshape[0] / 2]

    def shift_to_center(self, desired_center_image_point, imshape):
        current = desired_center_image_point
        target = np.float32([imshape[1], imshape[0]]) / 2
        self.intrinsic_matrix[:2, 2] += target - current

    def shift_to_desired(self, current_coords_of_the_point, target_coords_of_the_point):
        self.intrinsic_matrix[:2, 2] += (
            target_coords_of_the_point - current_coords_of_the_point)

    def turn_towards(self, target_image_point=None, target_world_point=None):
        """Point the optical axis at a target; resets roll/flip
        (cameralib.py:269-288)."""
        assert (target_image_point is None) != (target_world_point is None)
        if target_image_point is not None:
            target_world_point = self.image_to_world(target_image_point)

        def unit_vec(v):
            return v / np.linalg.norm(v)

        new_z = unit_vec(target_world_point - self.t)
        new_x = unit_vec(np.cross(new_z, self.world_up))
        new_y = np.cross(new_z, new_x)
        self.R = np.stack([new_x, new_y, new_z]).astype(np.float32)

    def upright(self):
        def unit_vec(v):
            return v / np.linalg.norm(v)

        new_z = self.R[2]
        new_x = unit_vec(np.cross(new_z, self.world_up))
        new_y = np.cross(new_z, new_x)
        self.R = np.stack([new_x, new_y, new_z]).astype(np.float32)

    def orbit_around(self, world_point, angle_radians, axis='vertical'):
        if axis == 'vertical':
            axis = -self.world_up
        else:
            lookdir = self.R[2]
            axis = np.cross(lookdir, self.world_up)
        rot_matrix = axangle2mat(np.asarray(axis, np.float64) * angle_radians)
        self.t = ((rot_matrix @ (self.t - world_point)) + world_point).astype(np.float32)
        self.R = (self.R @ rot_matrix.T).astype(np.float32)

    def crop_from(self, point):
        self.intrinsic_matrix[:2, 2] -= point

    def get_projection_matrix(self):
        extrinsic_projection = np.append(
            self.R, -self.R @ np.expand_dims(self.t, 1), axis=1)
        return self.intrinsic_matrix @ extrinsic_projection

    def get_extrinsic_matrix(self):
        return build_extrinsic_matrix(self.R, self.t)

    def copy(self):
        return copy.deepcopy(self)


# ---------------------------------------------------------------------- #
# free functions


def build_extrinsic_matrix(rot_world_to_cam, optical_center_world):
    R = rot_world_to_cam
    t = optical_center_world
    return np.block([[R, -R @ np.expand_dims(t, -1)], [0, 0, 0, 1]])


def camera_in_new_world(camera, new_world_camera):
    new_world_up = (new_world_camera.world_to_camera(camera.world_up)
                    - new_world_camera.t)
    R = camera.R @ new_world_camera.R.T
    t = new_world_camera.R @ (camera.t - new_world_camera.t)
    return Camera(t, R, camera.intrinsic_matrix, camera.distortion_coeffs,
                  new_world_up)


def project_points(points, distortion_coeffs, intrinsic_matrix):
    """OpenCV distortion polynomial, replicated bit-for-bit from the
    reference's inlined fast path (cameralib.py:636-658): radial k1,k2,k3 and
    tangential p1,p2 with the reference's (documented-odd) tangential terms."""
    intrinsic_matrix = intrinsic_matrix.astype(np.float32)
    dist_coeff = distortion_coeffs
    points = points.astype(np.float32)
    projected = points[:, :2] / points[:, 2:]
    r_pow2 = np.sum(projected * projected, axis=1)
    r_pow4 = r_pow2 * r_pow2
    r_pow6 = r_pow4 * r_pow2

    distorter = dist_coeff[0] * r_pow2
    distorter = distorter + dist_coeff[1] * r_pow4
    distorter = distorter + dist_coeff[4] * r_pow6
    distorter = distorter + np.float32(1.0)
    distorter = distorter + projected[:, 0] * (2 * dist_coeff[3])
    distorter = distorter + projected[:, 1] * (2 * dist_coeff[2])

    projected = projected.copy()
    projected[:, 0] *= distorter
    projected[:, 0] += r_pow2 * dist_coeff[3]
    projected[:, 1] *= distorter
    projected[:, 1] += r_pow2 * dist_coeff[2]

    return (projected @ intrinsic_matrix[:2, :2].T
            + intrinsic_matrix[:2, 2]).astype(np.float32)


def _distort_normalized(p, d):
    """Standard OpenCV forward distortion on normalized coords (float64)."""
    k1, k2, p1, p2, k3 = [np.float64(c) for c in d[:5]]
    x, y = p[:, 0], p[:, 1]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], axis=1)


def _undistort_points(points, intrinsic_matrix, distortion_coeffs, num_iters=10):
    """Iterative inverse of the OpenCV distortion model; replaces
    cv2.undistortPoints (cameralib.py:196-198). Returns *normalized* image
    coordinates (pre-intrinsics), like cv2.undistortPoints with P=None."""
    k_inv = np.linalg.inv(intrinsic_matrix.astype(np.float64))
    pts = np.asarray(points, np.float64)
    homog = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)
    distorted = (homog @ k_inv.T)[:, :2]

    d = np.zeros(5)
    d[:len(distortion_coeffs)] = distortion_coeffs
    k1, k2, p1, p2, k3 = d

    # fixed-point iteration identical to OpenCV's undistortPoints loop
    x = distorted.copy()
    for _ in range(num_iters):
        x0, y0 = x[:, 0], x[:, 1]
        r2 = x0 * x0 + y0 * y0
        icdist = 1.0 / (1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2)
        delta_x = 2 * p1 * x0 * y0 + p2 * (r2 + 2 * x0 * x0)
        delta_y = p1 * (r2 + 2 * y0 * y0) + 2 * p2 * x0 * y0
        x = np.stack([(distorted[:, 0] - delta_x) * icdist,
                      (distorted[:, 1] - delta_y) * icdist], axis=1)
    return x.astype(np.float32)


def allclose_or_nones(a, b):
    if a is None and b is None:
        return True
    if a is None:
        return np.min(b) == np.max(b) == 0
    if b is None:
        return np.min(b) == np.max(b) == 0
    return np.allclose(a, b)


def reproject_points(points, old_camera, new_camera):
    """Transform pixel keypoints between cameras sharing an optical center
    (cameralib.py:354-375)."""
    points = np.asarray(points, np.float32)
    if (old_camera.distortion_coeffs is None
            and new_camera.distortion_coeffs is None and points.ndim == 2):
        return reproject_points_fast(points, old_camera, new_camera)

    if not np.allclose(old_camera.t, new_camera.t):
        raise Exception(
            'The optical center of the camera must not change, else warping is '
            'not enough!')

    if (np.allclose(new_camera.R, old_camera.R) and
            allclose_or_nones(new_camera.distortion_coeffs,
                              old_camera.distortion_coeffs)):
        relative_intrinsics = (new_camera.intrinsic_matrix
                               @ np.linalg.inv(old_camera.intrinsic_matrix))
        return points @ relative_intrinsics[:2, :2].T + relative_intrinsics[:2, 2]

    world_points = old_camera.image_to_world(points)
    return new_camera.world_to_image(world_points)


def reproject_points_fast(points, old_camera, new_camera):
    homography = get_homography(new_camera, old_camera)  # maps old->new below
    pointsT = homography[:, :2] @ points.T + homography[:, 2:]
    pointsT = pointsT[:2] / pointsT[2:]
    return pointsT.T


def get_homography(src_camera, dst_camera):
    """3x3 matrix mapping *dst pixel coords -> src pixel coords* for cameras
    sharing an optical center (cameralib.py:608-620): K_src R_src R_dst^-1
    K_dst^-1."""
    if not np.allclose(src_camera.t, dst_camera.t):
        raise Exception(
            'The optical centers of the cameras are different, a homography can '
            'not model this!')
    return (src_camera.intrinsic_matrix @ src_camera.R
            @ np.linalg.inv(dst_camera.R)
            @ np.linalg.inv(dst_camera.intrinsic_matrix))


def get_affine(src_camera, dst_camera):
    """Affine transform src->dst for in-plane changes only (cameralib.py:446-460)."""
    if (not np.allclose(src_camera.t, dst_camera.t) or
            not np.allclose(src_camera.R[2], dst_camera.R[2])):
        raise Exception('The optical center of the camera and its look '
                        'direction may not change in the affine case!')
    src_points = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    dst_points = reproject_points(src_points, src_camera, dst_camera)
    # affine from 3 point correspondences (replaces cv2.getAffineTransform)
    a_cols = np.stack([dst_points[1] - dst_points[0],
                       dst_points[2] - dst_points[0]], axis=1)
    affine = np.concatenate([a_cols, dst_points[0][:, None]], axis=1)
    return np.append(affine, [[0, 0, 1]], axis=0)


def undistort_points(cam, points):
    if cam.distortion_coeffs is None:
        return cam.copy(), points
    cam_undistorted = cam.copy()
    cam_undistorted.undistort()
    points_undistorted = reproject_points(np.asarray(points, np.float32),
                                          cam, cam_undistorted)
    return cam_undistorted, points_undistorted


def triangulate(cameras, pointlists):
    """DLT triangulation across views (cameralib.py:530-547)."""
    cameras, pointlists = zip(
        *[undistort_points(c, p) for c, p in zip(cameras, pointlists)])
    proj_matrices = [c.get_projection_matrix() for c in cameras]

    n_points = len(pointlists[0])
    if not all(len(pointlist) == n_points for pointlist in pointlists):
        raise Exception('The point lists must have the same length')

    triangulated = np.empty(shape=(n_points, 3), dtype=np.float32)
    for i in range(n_points):
        points = [pointlist[i] for pointlist in pointlists]
        blocks = [(np.expand_dims(point, 1) @ pr[2:] - pr[:2])
                  for point, pr in zip(points, proj_matrices)]
        A = np.concatenate(blocks, axis=0)
        _, _, vh = np.linalg.svd(A, full_matrices=False)
        triangulated[i] = vh[3, :3] / vh[3, 3:]
    return triangulated


def triangulate_single(cameras, points):
    cameras, points = zip(
        *[undistort_points(c, [p]) for c, p in zip(cameras, points)])
    points = [p[0] for p in points]
    proj_matrices = [c.get_projection_matrix() for c in cameras]
    blocks = [(np.expand_dims(point, 1) @ pr[2:] - pr[:2])
              for point, pr in zip(points, proj_matrices)]
    A = np.concatenate(blocks, axis=0)
    _, _, vh = np.linalg.svd(A, full_matrices=False)
    return vh[3, :3] / vh[3, 3:]


def calibrate_extrinsics(points2d, points3d):
    """Hartley-Zisserman Algo 7.1 linear estimate + quaternion least-squares
    refinement (cameralib.py:473-527)."""
    import scipy.optimize

    if not len(points2d) == len(points3d):
        raise Exception('The point lists must have the same length')

    points2d = np.array(points2d, np.float64)
    points3d = np.array(points3d, np.float64)
    n_points = len(points3d)

    hp2d = np.concatenate([points2d, np.ones((n_points, 1))], axis=1)
    hp3d = np.concatenate([points3d, np.ones((n_points, 1))], axis=1)

    def normalize(p):
        s = p.shape[-1]
        mean = np.mean(p[:, :-1], axis=0)
        std = np.std(p[:, :-1])
        backward_mat = np.eye(s)
        backward_mat[:-1, :-1] *= std
        backward_mat[:-1, -1] = mean
        forward_mat = np.linalg.inv(backward_mat)
        return p @ forward_mat.T, forward_mat, backward_mat

    np2d, forw2d, back2d = normalize(hp2d)
    np3d, forw3d, back3d = normalize(hp3d)

    blocks = [np.outer([0, -1, p2d[1], 1, 0, -p2d[0]], p3d)
              for p2d, p3d in zip(np2d, np3d)]
    A = np.concatenate(blocks, axis=0).reshape(n_points * 2, 12)
    _, _, vh = np.linalg.svd(A, full_matrices=False)
    p_linear_estimate = np.reshape(vh[-1], [3, 4])

    R_guess = p_linear_estimate[:3, :3]
    if np.linalg.det(R_guess) < 0:
        p_linear_estimate = -p_linear_estimate
        R_guess = -R_guess
    eye_guess = (-np.linalg.inv(R_guess) @ p_linear_estimate[:3, 3:]).reshape(3)
    # project R_guess to the closest rotation before quaternion conversion
    u, _, vt = np.linalg.svd(R_guess)
    quat_guess = mat2quat(u @ vt)
    guess = np.concatenate([eye_guess, quat_guess])

    def residual(vec):
        eye = vec[:3]
        quat = vec[3:]
        R = quat2mat(quat)
        P = np.append(R, -R @ np.expand_dims(eye, 1), axis=1)
        projected_homog = np3d @ P.T
        projected = projected_homog[:, :2] / projected_homog[:, 2:]
        return (projected - np2d[:, :2]).reshape([-1])

    solution = scipy.optimize.least_squares(residual, x0=guess)
    vec = solution.x
    eye = vec[:3]
    quat = vec[3:]
    R = quat2mat(quat)
    P = np.append(R, -R @ np.expand_dims(eye, 1), axis=1)
    P_unnormalized = back2d @ P @ forw3d
    det = np.linalg.det(P_unnormalized[:3, :3])
    return P_unnormalized / np.cbrt(det)


def look_at_box(orig_cam, box, output_side):
    """Build the virtual camera looking at a bbox (cameralib.py:561-582)."""
    cam = orig_cam.copy()
    center_point = boxlib.center(box)

    if box[2] < box[3]:
        delta_y = np.array([0, box[3] / 2])
        sidepoints = np.stack([center_point - delta_y, center_point + delta_y])
    else:
        delta_x = np.array([box[2] / 2, 0])
        sidepoints = np.stack([center_point - delta_x, center_point + delta_x])

    cam.turn_towards(target_image_point=center_point)
    cam.undistort()
    cam.square_pixels()
    cam_sidepoints = reproject_points(sidepoints, orig_cam, cam)
    if box[2] < box[3]:
        crop_side = np.abs(cam_sidepoints[0, 1] - cam_sidepoints[1, 1])
    else:
        crop_side = np.abs(cam_sidepoints[0, 0] - cam_sidepoints[1, 0])
    cam.zoom(output_side / crop_side)
    cam.center_principal_point((output_side, output_side))
    return cam


def look_at_skeleton(orig_cam, cam_coords, output_side):
    """Iteratively refine a crop camera around a skeleton (cameralib.py:585-605)."""
    world_coords = orig_cam.camera_to_world(cam_coords)
    cam = orig_cam.copy()

    def make_box(camera):
        cam3d_coords = camera.world_to_camera(world_coords)
        im_coords = camera.camera_to_image(cam3d_coords)
        box = boxlib.expand_to_square(boxlib.bb_of_points(im_coords))
        topleft = camera.image_to_world(box[:2], cam3d_coords[-1, 2])
        bottomright = camera.image_to_world(box[:2] + box[2:] / 2, cam3d_coords[-1, 2])
        diag_mm = np.linalg.norm(bottomright - topleft)
        result = boxlib.expand(box, max(1.15, 1700 / diag_mm))
        if np.min(result[2:]) < 1:
            return [0, 0, 5, 5]
        return result

    for _ in range(5):
        box = make_box(cam)
        cam = look_at_box(cam, box, output_side)
    return cam


def visibility_homography_coords(old_camera, new_camera, output_imshape):
    """Source coordinates of every output pixel for visibility checks
    (cameralib.py:714-725)."""
    hom = get_homography(old_camera, new_camera)
    y, x = np.mgrid[:output_imshape[0], :output_imshape[1]].astype(np.float32)
    coords = np.stack([x, y, np.ones_like(x)], axis=0).reshape(3, -1)
    coords = hom @ coords
    coords = coords[:2] / coords[2:]
    return coords.reshape(2, output_imshape[0], output_imshape[1])


def is_all_visible_in_new_camera(image, old_camera, new_camera,
                                 output_imshape):
    """True if the whole reprojected view lies inside `image`
    (cameralib.py:714-725)."""
    x, y = visibility_homography_coords(old_camera, new_camera,
                                        output_imshape)
    return bool(np.logical_and(
        np.logical_and(np.all(0 <= x), np.all(x < image.shape[1])),
        np.logical_and(np.all(0 <= y), np.all(y < image.shape[0]))))
