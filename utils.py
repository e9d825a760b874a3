"""Compatibility shim exposing the reference utils.py API surface
(utils.py:14-371) on top of pose_tpu. Torch-free: decode/heatmap run as jnp
ops, metrics as numpy, detection/video as host tools."""

import numpy as np

# records
from pose_tpu.train.engine import JointInfo                     # utils.py:146


class PoseSample:
    """(utils.py:136-143)"""

    def __init__(self, image_path, body_pose, valid, bbox, camera):
        self.image_path = image_path
        self.body_pose = body_pose
        self.valid = valid
        self.bbox = bbox
        self.camera = camera


# metrics (utils.py:197-276)
from pose_tpu.metrics import analyze, parse_epoch, statistics

# root reconstruction (utils.py:279-371)
from pose_tpu.ops.recon import get_deter_cam, get_recon_cam, recon_root

# feature dumps (utils.py:45-65)
from pose_tpu.train.depth_engine import save_array, save_tensor

# offline tooling (utils.py:82-133)
from pose_tpu.tools.dataset_build import groupby, transfer_bbox
from pose_tpu.tools.detector import YoloDetector as Detector
from pose_tpu.tools.video import depth_prefetch, prefetch


def get_attention(side_in, stride, image_coords, attention):
    """(utils.py:14-42), host numpy version."""
    from pose_tpu.data.loader import attention_map
    return attention_map(side_in, stride, np.asarray(image_coords), attention)


def to_depth(image, depth_cam):
    """Kinect raw -> ray-length-corrected depth (utils.py:68-75)."""
    coord_u, coord_v = np.meshgrid(range(image.shape[1]),
                                   range(image.shape[0]))
    coords = np.stack([coord_u, coord_v], axis=-1).reshape(-1, 2)
    unprojection = depth_cam.image_to_camera(coords).reshape(
        image.shape[0], image.shape[1], -1)
    return image / np.sqrt(np.sum(unprojection ** 2, axis=-1) + 1)


def to_bbox(det):
    return np.array([det.x, det.y, det.w, det.h])


def to_heatmap(ausgabe, depth, num_joints, height, width):
    """Volumetric softmax on an NHWC feature map (utils.py:154-175). Accepts
    (B, H, W, depth*num_joints); NCHW torch-layout input is detected by the
    channel dim position and transposed."""
    import jax.numpy as jnp
    from pose_tpu.ops.heatmap import to_heatmap3d

    arr = jnp.asarray(np.asarray(ausgabe))
    if arr.shape[1] == depth * num_joints and arr.shape[-1] != depth * num_joints:
        arr = jnp.transpose(arr, (0, 2, 3, 1))
    return to_heatmap3d(arr, depth, num_joints)


def decode(heatmap, depth_range):
    """(utils.py:178-194)"""
    from pose_tpu.ops.heatmap import decode3d
    import jax.numpy as jnp
    return decode3d(jnp.asarray(np.asarray(heatmap)), depth_range)


def least_square(A, b, weight):
    """Weighted least squares (reference utils.py:279-293): solve
    (A^T W A) x = A^T W b with per-constraint weights tiled over the two
    image-coordinate rows."""
    weight = np.tile(weight.reshape(-1, 1) ** 0.5, (1, 2))
    A = A * weight.reshape(-1, 1)
    b = b * weight.reshape(-1)
    return np.linalg.solve(np.dot(A.T, A), np.dot(A.T, b))


from builtins import zip as xzip  # noqa: E402,F401  (reference utils.py:12)
