"""Skeleton registry for CMU Panoptic (19 joints), Human3.6M (17) and NTU
RGB+D (21) — name tables, kinematic parents, left/right mirror pairs and the
root ("base") joint. Mirrors the reference's joint_settings.py:1-195 contract:
`<name>_short_names`, `<name>_parent`, `<name>_mirror`, `<name>_base_joint`
module attributes consumed by depth_main.get_info and the viz tools.
"""


def _mirror_map(pairs):
    table = {}
    for a, b in pairs:
        table[a] = b
        table[b] = a
    return table


# --------------------------------------------------------------------- CMU-19
cmu_short_names = [
    'Neck', 'Nose', 'BodyCenter',
    'lShoulder', 'lElbow', 'lWrist', 'lHip', 'lKnee', 'lAnkle',
    'rShoulder', 'rElbow', 'rWrist', 'rHip', 'rKnee', 'rAnkle',
    'lEye', 'lEar', 'rEye', 'rEar',
]

cmu_parent = {
    'BodyCenter': 'BodyCenter',
    'Neck': 'BodyCenter',
    'Nose': 'Neck',
    'lShoulder': 'Neck', 'lElbow': 'lShoulder', 'lWrist': 'lElbow',
    'rShoulder': 'Neck', 'rElbow': 'rShoulder', 'rWrist': 'rElbow',
    'lHip': 'BodyCenter', 'lKnee': 'lHip', 'lAnkle': 'lKnee',
    'rHip': 'BodyCenter', 'rKnee': 'rHip', 'rAnkle': 'rKnee',
    'lEye': 'Nose', 'lEar': 'lEye',
    'rEye': 'Nose', 'rEar': 'rEye',
}

cmu_mirror = _mirror_map([
    ('lShoulder', 'rShoulder'), ('lElbow', 'rElbow'), ('lWrist', 'rWrist'),
    ('lHip', 'rHip'), ('lKnee', 'rKnee'), ('lAnkle', 'rAnkle'),
    ('lEar', 'rEar'), ('lEye', 'rEye'),
])

cmu_base_joint = 'BodyCenter'

# -------------------------------------------------------------------- H36M-17
h36m_short_names = [
    'rhip', 'rkne', 'rank', 'lhip', 'lkne', 'lank',
    'tors', 'neck', 'head', 'htop',
    'lsho', 'lelb', 'lwri', 'rsho', 'relb', 'rwri',
    'pelv',
]

h36m_parent = {
    'htop': 'head', 'head': 'neck',
    'lsho': 'neck', 'lelb': 'lsho', 'lwri': 'lelb',
    'rsho': 'neck', 'relb': 'rsho', 'rwri': 'relb',
    'neck': 'tors', 'tors': 'pelv',
    'lhip': 'pelv', 'lkne': 'lhip', 'lank': 'lkne',
    'rhip': 'pelv', 'rkne': 'rhip', 'rank': 'rkne',
    'pelv': 'pelv',
}

h36m_mirror = _mirror_map([
    ('lsho', 'rsho'), ('lelb', 'relb'), ('lwri', 'rwri'),
    ('lhip', 'rhip'), ('lkne', 'rkne'), ('lank', 'rank'),
])

# the four HD camera serials and the CDF column subset selecting the 17
# H36M joints (joint_settings.py:123-124)
h36m_cam_names = ['54138969', '55011271', '58860488', '60457274']
h36m_key_foots = [1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27, 0]
h36m_base_joint = 'pelv'

# --------------------------------------------------------------------- NTU-21
ntu_short_names = [
    'Pelvis', 'Spine', 'Neck', 'Head',
    'rShoulder', 'rElbow', 'rWrist', 'rHand',
    'lShoulder', 'lElbow', 'lWrist', 'lHand',
    'rHip', 'rKnee', 'rAnkle', 'rFoot',
    'lHip', 'lKnee', 'lAnkle', 'lFoot',
    'Clavicle',
]

ntu_parent = {
    'Pelvis': 'Pelvis', 'Spine': 'Pelvis', 'Clavicle': 'Spine',
    'Neck': 'Clavicle', 'Head': 'Neck',
    'rShoulder': 'Clavicle', 'rElbow': 'rShoulder',
    'rWrist': 'rElbow', 'rHand': 'rWrist',
    'lShoulder': 'Clavicle', 'lElbow': 'lShoulder',
    'lWrist': 'lElbow', 'lHand': 'lWrist',
    'rHip': 'Pelvis', 'rKnee': 'rHip', 'rAnkle': 'rKnee', 'rFoot': 'rAnkle',
    'lHip': 'Pelvis', 'lKnee': 'lHip', 'lAnkle': 'lKnee', 'lFoot': 'lAnkle',
}

ntu_mirror = _mirror_map([
    ('rShoulder', 'lShoulder'), ('rElbow', 'lElbow'), ('rWrist', 'lWrist'),
    ('rHand', 'lHand'), ('rHip', 'lHip'), ('rKnee', 'lKnee'),
    ('rAnkle', 'lAnkle'), ('rFoot', 'lFoot'),
])

ntu_base_joint = 'Pelvis'
