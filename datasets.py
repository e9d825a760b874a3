"""RGB dataset module, CLI-compatible with the reference's datasets.py.

`get_data_loader(args, phase)` is what main.py imports (reference main.py:7 —
note the reference snapshot's datasets.py only defines data_loader; the
(loader, data_info) contract is reconstructed from main.py's usage,
SURVEY.md §0). data_info is built from the joint_settings tables for
args.data_name.
"""

import numpy as np

import joint_settings
from pose_tpu.data import PoseLoader
from pose_tpu.train import JointInfo


def names_to_indices(short_names, table):
    """Joint-name relation table -> index array: joint i maps to the index of
    table[name_i], or to itself when the table has no entry (the identity
    default covers self-mirrored center joints and the skeleton root)."""
    order = {name: i for i, name in enumerate(short_names)}
    return np.array([order[table.get(name, name)] for name in short_names])


def build_info(data_name):
    """JointInfo index arrays from the joint_settings name tables for any
    skeleton (reference analogue: depth_main.py:14-33, h36m-only there)."""
    short_names = getattr(joint_settings, data_name + '_short_names')
    base_joint = getattr(joint_settings, data_name + '_base_joint')
    return JointInfo(
        short_names,
        names_to_indices(short_names,
                         getattr(joint_settings, data_name + '_parent')),
        names_to_indices(short_names,
                         getattr(joint_settings, data_name + '_mirror')),
        short_names.index(base_joint))


def data_loader(args, phase, data_info, **kwargs):
    """Reference signature (datasets.py:22-27)."""
    return PoseLoader(args, phase, data_info, **kwargs)


def get_data_loader(args, phase, **kwargs):
    """main.py's contract: returns (loader, data_info)."""
    data_info = build_info(args.data_name)
    return data_loader(args, phase, data_info, **kwargs), data_info


def show_mat(image_coord, ax, bbox=None):
    """Skeleton/bbox overlay (reference datasets.py:157-183)."""
    from pose_tpu.tools.viz import show_mat as _show_mat
    _show_mat(image_coord, ax, bbox, skeleton='h36m')


def h36m_split(split, phase, sample):
    from pose_tpu.data.samples import h36m_split as _s
    return _s(split, phase, sample)


def cmu_split(split, phase, sample):
    from pose_tpu.data.samples import cmu_split as _s
    return _s(split, phase, sample)
