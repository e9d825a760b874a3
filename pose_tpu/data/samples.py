"""Sample-store readers and split logic (reference: datasets.py:30-75,
depth_datasets.py:31-150).

Sample pickles are the ones produced by the offline construction tools (L7):
lists of dicts with keys image/camera/bbox/skeleton/valid (+ video/frame/
depth_bbox for the depth datasets). Reference-produced pickles contain
`cameralib.Camera` instances; the repo-root `cameralib` shim maps that module
path onto pose_tpu.geometry.camera so they unpickle directly.
"""

import glob
import json
import os
import pickle


def load_metadata(args):
    with open(args.metadata_path) as file:
        return json.load(file)


def h36m_split(split, phase, sample):
    folder = os.path.basename(os.path.dirname(sample['image']))
    return folder.split('.')[0] in split[phase]


def cmu_split(split, phase, sample):
    """CMU samples are keyed by sequence name (data_groups.py:99-115)."""
    seq = sample.get('sequence')
    if seq is None:
        # reference-produced stores carry no 'sequence' key; their path
        # layout is <data_down_path>/<sequence>.<cam>/<frame>.<body>.jpg
        # (data_groups.py:140,180), so the sequence is the parent folder
        # up to the first dot
        folder = os.path.basename(os.path.dirname(sample['image']))
        seq = folder.split('.')[0]
    return seq in split[phase]


def ntu_split(split, phase, sample):
    return (sample['video'][:8] in split[phase]['configs']
            and sample['video'][8:12] in split[phase]['persons'])


def pku_split(split, phase, sample):
    return sample['video'] in split[phase]


SPLITS = dict(h36m=h36m_split, cmu=cmu_split, ntu=ntu_split, pku=pku_split)


def unpickle(*path_parts):
    """Load one pickle file (path segments are joined). Shared with the
    offline tools (tools/depth_build.py)."""
    with open(os.path.join(*path_parts), 'rb') as file:
        return pickle.load(file)


def _load_split(root):
    with open(os.path.join(root, 'split.json')) as file:
        return json.load(file)


def get_cmu_samples(root, phase):
    samples = unpickle(root, 'samples.pkl')
    split = _load_split(root)
    return [s for s in samples if cmu_split(split, phase, s)]


def get_h36m_samples(root, phase):
    samples = unpickle(root, 'samples.pkl')
    split = _load_split(root)
    return [s for s in samples if h36m_split(split, phase, s)]


def get_ntu_samples(root, phase):
    """NTU: per-camera final_samples/<cam>.pkl shards
    (depth_datasets.py:126-138)."""
    samples = []
    for sample_file in sorted(glob.glob(
            os.path.join(root, 'final_samples', '*.pkl'))):
        samples += unpickle(sample_file)
    split = _load_split(root)
    return [s for s in samples if ntu_split(split, phase, s)]


def get_pku_samples(root, phase):
    samples = unpickle(root, 'final_samples.pkl')
    split = _load_split(root)
    return [s for s in samples if pku_split(split, phase, s)]


GETTERS = dict(cmu=get_cmu_samples, h36m=get_h36m_samples,
               ntu=get_ntu_samples, pku=get_pku_samples)


def get_samples(data_name, root, phase):
    return GETTERS[data_name](root, phase)


def load_depth_cameras(data_name, root):
    """Per-video depth cameras: NTU keyed by setup id (depth_cameras.pkl),
    PKU by camera letter (cameras.pkl) (depth_datasets.py:96-111)."""
    if data_name == 'ntu':
        return unpickle(root, 'depth_cameras.pkl')
    if data_name == 'pku':
        return unpickle(root, 'cameras.pkl')
    return None


def depth_cam_for(data_name, cams, sample):
    if data_name == 'ntu':
        return cams[sample['video'][:8]]
    return cams[sample['video'][5]]


def depth_image_path(data_name, root, sample):
    """(depth_datasets.py:114-123)"""
    if data_name == 'ntu':
        seq_folder = os.path.join(
            'nturgbd_depth_s' + sample['video'][1:4], 'nturgb+d_depth')
        image_name = 'Depth-' + str(sample['frame'] + 1).zfill(8) + '.png'
        return os.path.join(root, seq_folder, sample['video'], image_name)
    return os.path.join(root, 'DEPTH_IMAGE',
                        sample['video'] + '.' + str(sample['frame']) + '.png')
