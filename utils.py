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
    """Kinect raw -> ray-length-corrected depth (utils.py:68-75): divide
    each pixel by the norm of its homogeneous camera ray (|K^-1 [u,v,1]|
    extended with the implicit z=1 term)."""
    h, w = image.shape[:2]
    pix = np.stack(np.meshgrid(np.arange(w), np.arange(h)), axis=-1)
    rays = depth_cam.image_to_camera(pix.reshape(-1, 2))
    norms = np.sqrt((rays ** 2).sum(axis=-1) + 1.0).reshape(h, w)
    return image / norms


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
    """Weighted least squares (reference utils.py:279-293): x minimizing
    ||W^(1/2) (A x - b)||, where each per-joint weight covers that joint's
    pair of image-coordinate rows."""
    w = np.repeat(np.sqrt(np.asarray(weight).reshape(-1)), 2)
    Aw = A * w[:, None]
    bw = b * w
    return np.linalg.solve(Aw.T @ Aw, Aw.T @ bw)


from builtins import zip as xzip  # noqa: E402,F401  (reference utils.py:12)
