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


def build_info(data_name):
    """Index-array JointInfo from the name tables (depth_main.py:14-33
    pattern, applied to any skeleton in joint_settings)."""
    short_names = getattr(joint_settings, data_name + '_short_names')
    parent = getattr(joint_settings, data_name + '_parent')
    mirror = getattr(joint_settings, data_name + '_mirror')
    base_joint = getattr(joint_settings, data_name + '_base_joint')

    mapper = dict(zip(short_names, range(len(short_names))))
    map_mirror = [mapper[mirror[name]] for name in short_names
                  if name in mirror]
    map_parent = [mapper[parent[name]] for name in short_names
                  if name in parent]

    _mirror = np.arange(len(short_names))
    _parent = np.arange(len(short_names))
    _mirror[np.array([name in mirror for name in short_names])] = \
        np.array(map_mirror)
    _parent[np.array([name in parent for name in short_names])] = \
        np.array(map_parent)

    return JointInfo(short_names, _parent, _mirror, mapper[base_joint])


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
