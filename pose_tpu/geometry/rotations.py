"""Small rotation utilities (numpy), replacing the reference's external deps.

The reference uses `transforms3d.euler.euler2mat` (cameralib.py:111, :125),
`transforms3d.quaternions.mat2quat/quat2mat` (cameralib.py:505, :511) and
`cv2.Rodrigues` (cameralib.py:318). We implement the needed subset here so the
geometry core has zero native dependencies.
"""

import numpy as np


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


_AXIS_FUNCS = {'x': _rot_x, 'y': _rot_y, 'z': _rot_z}


def euler2mat(ai, aj, ak, axes='sxyz'):
    """Euler angles -> rotation matrix for the axis conventions the reference
    uses: 'ryxz' (rotating frame, cameralib.py:111) and 'syxz' (static frame,
    cameralib.py:125).

    Semantics follow transforms3d: for static ('s') axes `seq = a1 a2 a3`, the
    matrix is R = R_a1(t1) @ R_a2(t2) @ R_a3(t3) applied in reversed order...
    transforms3d computes, for 'sxyz', M = R_z(az) @ R_y(ay) @ R_x(ax) where
    (ax, ay, az) map to the listed axes in order. For rotating frames ('r'),
    the axis sequence and angles are reversed.
    """
    frame = axes[0]
    seq = axes[1:]
    angles = (ai, aj, ak)
    if frame == 'r':
        seq = seq[::-1]
        angles = angles[::-1]
    # static frame: M = R(axis3, a3) @ R(axis2, a2) @ R(axis1, a1)
    m = np.eye(3)
    for axis, angle in zip(seq, angles):
        m = _AXIS_FUNCS[axis](angle) @ m
    return m


def axangle2mat(axis_times_angle):
    """Rodrigues formula: rotation matrix from axis*angle vector
    (replaces cv2.Rodrigues, cameralib.py:318)."""
    v = np.asarray(axis_times_angle, np.float64).reshape(3)
    angle = np.linalg.norm(v)
    if angle < 1e-12:
        return np.eye(3)
    axis = v / angle
    k = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def mat2quat(m):
    """Rotation matrix -> unit quaternion (w, x, y, z)."""
    m = np.asarray(m, np.float64)
    tr = np.trace(m)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    return np.array([w, x, y, z])


def quat2mat(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix. Does not require the
    quaternion to be normalized (matches transforms3d behaviour used by the
    reference's extrinsic refinement, cameralib.py:511)."""
    w, x, y, z = np.asarray(q, np.float64)
    n = w * w + x * x + y * y + z * z
    if n < 1e-12:
        return np.eye(3)
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)]])
