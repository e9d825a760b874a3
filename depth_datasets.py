"""Depth dataset module, CLI-compatible with the reference's
depth_datasets.py — metadata.json names this module as the loader
(depth_train.py:15-19) and depth_main imports it dynamically."""

from pose_tpu.data import DepthPoseLoader


def data_loader(args, phase, data_info, **kwargs):
    """Reference signature (depth_datasets.py:23-28)."""
    return DepthPoseLoader(args, phase, data_info, **kwargs)


def show_mat(image_coord, ax, bbox=None):
    """(reference depth_datasets.py:266-292)"""
    from pose_tpu.tools.viz import show_mat as _show_mat
    _show_mat(image_coord, ax, bbox, skeleton='h36m')


def visualize(image_name, depth_cam, true_cam, spec_cam, depth_bbox):
    """(reference depth_datasets.py:295-309)"""
    from pose_tpu.tools.viz import visualize as _visualize
    _visualize(image_name, depth_cam, true_cam, spec_cam, depth_bbox)


def enhance_ntu(image, nexponent):
    """NTU depth encoding (reference depth_datasets.py:39-46): scale by
    255/10m, validity threshold 0.1, then exp(-d)*veil or d/3."""
    import numpy as np
    image = image / (10.0 / 255.0)
    veil = (0.1 <= image).astype(np.float32)
    dest = np.multiply(np.exp(-image), veil) if nexponent else (image / 3.0)
    return dest.astype(np.float32)[np.newaxis, :, :]


def enhance_pku(image, nexponent):
    """PKU depth encoding (threshold 0.5; depth_datasets.py:49-56)."""
    import numpy as np
    image = image / (10.0 / 255.0)
    veil = (0.5 <= image).astype(np.float32)
    dest = np.multiply(np.exp(-image), veil) if nexponent else (image / 3.0)
    return dest.astype(np.float32)[np.newaxis, :, :]


def ntu_split(split, phase, sample):
    from pose_tpu.data.samples import ntu_split as _s
    return _s(split, phase, sample)


def pku_split(split, phase, sample):
    from pose_tpu.data.samples import pku_split as _s
    return _s(split, phase, sample)
