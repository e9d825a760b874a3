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
