"""Depth dataset module, CLI-compatible with the reference's
depth_datasets.py — metadata.json names this module as the loader
(depth_train.py:15-19) and depth_main imports it dynamically."""

from pose_tpu.data import DepthPoseLoader


def data_loader(args, phase, data_info, **kwargs):
    """Reference signature (depth_datasets.py:23-28)."""
    return DepthPoseLoader(args, phase, data_info, **kwargs)
