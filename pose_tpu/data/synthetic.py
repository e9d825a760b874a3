"""Synthetic fixture datasets in the reference's sample-store format.

Generates tiny CMU-style (RGB) and NTU-style (RGB+depth) datasets — JPEG/PNG
files plus samples pickles, split.json and metadata.json — so the full CLI
stack (main.py / depth_main.py / run_test.sh) can run end-to-end without the
real corpora. Shapes follow the offline construction tools' output
(data_groups.py make_sample, depth_groups.py make_sample).
"""

import json
import os
import pickle

import numpy as np
from PIL import Image

from ..geometry.camera import Camera
from . import samples as sample_lib


def _synth_camera(rng, imshape=(270, 360), distorted=False):
    f = rng.uniform(250, 320)
    K = np.array([[f, 0, imshape[1] / 2],
                  [0, f * rng.uniform(0.97, 1.03), imshape[0] / 2],
                  [0, 0, 1]], np.float32)
    dist = None
    if distorted:
        # mild barrel distortion + small tangential terms, OpenCV order
        dist = np.array([rng.uniform(-0.25, -0.1), rng.uniform(0.0, 0.05),
                         rng.uniform(-1e-3, 1e-3), rng.uniform(-1e-3, 1e-3),
                         0.0], np.float32)
    return Camera(rng.uniform(-100, 100, 3).astype(np.float32), np.eye(3), K,
                  dist, world_up=(0, -1, 0))


def _synth_skeleton(rng, num_joints, depth=3500.0):
    root = np.array([rng.uniform(-150, 150), rng.uniform(-150, 150), depth])
    limbs = rng.uniform(-350, 350, (num_joints, 3))
    limbs[:, 2] *= 0.5
    return (root + limbs).astype(np.float32)


def _render(cam, skeleton, imshape, rng):
    """Blobby 'person': a bright disc per joint on a noisy background."""
    img = (rng.uniform(0, 40, imshape + (3,))).astype(np.uint8)
    pix = cam.world_to_image(cam.camera_to_world(skeleton))
    yy, xx = np.mgrid[:imshape[0], :imshape[1]]
    for j, p in enumerate(pix):
        mask = (xx - p[0]) ** 2 + (yy - p[1]) ** 2 < 36
        colour = 80 + (j * 37) % 160
        img[mask] = [colour, 255 - colour, (colour * 2) % 255]
    return img, pix


def make_cmu_fixture(root, num_train=24, num_valid=8, num_joints=19, seed=0,
                     imshape=(270, 360), distorted=False):
    """CMU-style store: samples.pkl with image/camera/bbox/skeleton/valid
    (+sequence), split.json, metadata.json pointing at `root`.

    distorted=True stores cameras with OpenCV distortion coefficients — the
    raw-HD-camera case the runtime loader must route through the general warp
    (the offline tools' stores are undistorted, data_groups.py:36-70)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, 'images'), exist_ok=True)

    samples = []
    sequences = {'train': 'seq_train', 'valid': 'seq_valid',
                 'test': 'seq_test'}
    counts = {'train': num_train, 'valid': num_valid, 'test': num_valid}
    for phase, count in counts.items():
        for i in range(count):
            cam = _synth_camera(rng, imshape, distorted=distorted)
            skel_cam = _synth_skeleton(rng, num_joints)
            skel_world = cam.camera_to_world(skel_cam)
            img, pix = _render(cam, skel_cam, imshape, rng)
            bbox = np.concatenate([pix.min(0) - 15, pix.max(0) - pix.min(0) + 30])
            bbox = bbox.astype(np.float32)

            name = f'{sequences[phase]}_{i:04d}.jpg'
            path = os.path.join(root, 'images', name)
            Image.fromarray(img).save(path, quality=95)
            samples.append(dict(image=path, camera=cam, bbox=bbox,
                                skeleton=skel_world,
                                valid=np.ones(num_joints, bool),
                                sequence=sequences[phase]))

    with open(os.path.join(root, 'samples.pkl'), 'wb') as f:
        pickle.dump(samples, f)
    with open(os.path.join(root, 'split.json'), 'w') as f:
        json.dump({p: [sequences[p]] for p in sequences}, f)
    metadata = dict(root=dict(cmu=root),
                    loader=dict(cmu='datasets'),
                    no_depth=dict(cmu=True),
                    thresholds=dict(cmu=dict(solid=50.0, close=100.0,
                                             rough=150.0)))
    metadata_path = os.path.join(root, 'metadata.json')
    with open(metadata_path, 'w') as f:
        json.dump(metadata, f)
    return metadata_path


def make_ntu_fixture(root, num_train=16, num_valid=8, num_joints=17, seed=1,
                     imshape=(270, 360), depth_imshape=(240, 320)):
    """NTU-style store: final_samples/<cam>.pkl shards with video/frame/
    depth_bbox, depth PNGs under the reference's directory layout,
    depth_cameras.pkl keyed by setup id."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, 'images'), exist_ok=True)
    os.makedirs(os.path.join(root, 'final_samples'), exist_ok=True)

    setups = ['S001C001', 'S002C001']
    depth_cams = {s: _synth_camera(rng, depth_imshape) for s in setups}
    persons = {'train': 'P001', 'valid': 'P002', 'test': 'P003'}
    counts = {'train': num_train, 'valid': num_valid, 'test': num_valid}

    samples = []
    for phase, count in counts.items():
        for i in range(count):
            setup = setups[i % len(setups)]
            video = setup + persons[phase] + 'R001A%03d' % (i % 60 + 1)
            cam = _synth_camera(rng, imshape)
            dcam = depth_cams[setup]
            skel_cam = _synth_skeleton(rng, num_joints)
            skel_world = cam.camera_to_world(skel_cam)

            img, pix = _render(cam, skel_cam, imshape, rng)
            bbox = np.concatenate([pix.min(0) - 15,
                                   pix.max(0) - pix.min(0) + 30]).astype(np.float32)

            # depth view: same world points through the depth camera
            dpix = dcam.world_to_image(skel_world)
            dbbox = np.concatenate([dpix.min(0) - 15,
                                    dpix.max(0) - dpix.min(0) + 30]).astype(np.float32)
            ddepth = dcam.world_to_camera(skel_world)[:, 2]
            dimg = np.zeros(depth_imshape, np.uint16)
            yy, xx = np.mgrid[:depth_imshape[0], :depth_imshape[1]]
            for j, p in enumerate(dpix):
                mask = (xx - p[0]) ** 2 + (yy - p[1]) ** 2 < 36
                dimg[mask] = np.uint16(ddepth[j])

            frame = i
            name = f'{video}_{frame:04d}.jpg'
            path = os.path.join(root, 'images', name)
            Image.fromarray(img).save(path, quality=95)

            seq_folder = os.path.join(
                root, 'nturgbd_depth_s' + video[1:4], 'nturgb+d_depth', video)
            os.makedirs(seq_folder, exist_ok=True)
            dname = 'Depth-' + str(frame + 1).zfill(8) + '.png'
            Image.fromarray(dimg).save(os.path.join(seq_folder, dname))

            samples.append(dict(image=path, camera=cam, bbox=bbox,
                                depth_bbox=dbbox, skeleton=skel_world,
                                valid=np.ones(num_joints, bool),
                                video=video, frame=frame))

    with open(os.path.join(root, 'final_samples', 'cam1.pkl'), 'wb') as f:
        pickle.dump(samples, f)
    with open(os.path.join(root, 'depth_cameras.pkl'), 'wb') as f:
        pickle.dump(depth_cams, f)
    split = {p: dict(configs=setups, persons=[persons[p]])
             for p in persons}
    with open(os.path.join(root, 'split.json'), 'w') as f:
        json.dump(split, f)

    metadata = dict(root=dict(ntu=root),
                    loader=dict(ntu='depth_datasets'),
                    no_depth=dict(ntu=False),
                    thresholds=dict(ntu=dict(solid=50.0, close=100.0,
                                             rough=150.0)))
    metadata_path = os.path.join(root, 'metadata.json')
    with open(metadata_path, 'w') as f:
        json.dump(metadata, f)
    return metadata_path


def make_occluder_bank(occ_path, count=4, seed=3):
    """Synthetic occluder sprites in the reference's occ_path format
    (occluder_<i>.npy + mask_<i>.npy, augment_occluder.py:58-65)."""
    rng = np.random.RandomState(seed)
    os.makedirs(occ_path, exist_ok=True)
    for i in range(count):
        h, w = rng.randint(40, 120, 2)
        sprite = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        yy, xx = np.mgrid[:h, :w]
        mask = (((yy - h / 2) / (h / 2)) ** 2
                + ((xx - w / 2) / (w / 2)) ** 2 <= 1).astype(np.float32)
        np.save(os.path.join(occ_path, f'occluder_{i}.npy'), sprite)
        np.save(os.path.join(occ_path, f'mask_{i}.npy'), mask)
    return occ_path


def make_h36m_fixture(root, num_train=8, num_valid=4, num_joints=17, seed=2,
                      imshape=(270, 360)):
    """H36M-style store: samples.pkl + split.json keyed by activity folder
    (h36m_split matches the parent-directory prefix, datasets.py:30-33)."""
    rng = np.random.RandomState(seed)
    samples = []
    folders = {'train': 'Walking.cam0', 'valid': 'Eating.cam0',
               'test': 'Sitting.cam0'}
    counts = {'train': num_train, 'valid': num_valid, 'test': num_valid}
    for phase, count in counts.items():
        folder = os.path.join(root, 'images', folders[phase])
        os.makedirs(folder, exist_ok=True)
        for i in range(count):
            cam = _synth_camera(rng, imshape)
            skel_cam = _synth_skeleton(rng, num_joints)
            skel_world = cam.camera_to_world(skel_cam)
            img, pix = _render(cam, skel_cam, imshape, rng)
            bbox = np.concatenate([pix.min(0) - 15,
                                   pix.max(0) - pix.min(0) + 30]).astype(np.float32)
            path = os.path.join(folder, f'frame_{i:06d}.jpg')
            Image.fromarray(img).save(path, quality=95)
            samples.append(dict(image=path, camera=cam, bbox=bbox,
                                skeleton=skel_world,
                                valid=np.ones(num_joints, bool)))

    with open(os.path.join(root, 'samples.pkl'), 'wb') as f:
        pickle.dump(samples, f)
    with open(os.path.join(root, 'split.json'), 'w') as f:
        json.dump({p: [folders[p].split('.')[0]] for p in folders}, f)
    metadata = dict(root=dict(h36m=root), loader=dict(h36m='datasets'),
                    no_depth=dict(h36m=True),
                    thresholds=dict(h36m=dict(solid=50.0, close=100.0,
                                              rough=150.0)))
    metadata_path = os.path.join(root, 'metadata.json')
    with open(metadata_path, 'w') as f:
        json.dump(metadata, f)
    return metadata_path


def make_pku_fixture(root, num_train=8, num_valid=4, num_joints=17, seed=4,
                     imshape=(270, 360), depth_imshape=(240, 320)):
    """PKU-style store: final_samples.pkl, DEPTH_IMAGE/<video>.<frame>.png,
    cameras.pkl keyed by camera letter (depth_datasets.py:101-123)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, 'images'), exist_ok=True)
    os.makedirs(os.path.join(root, 'DEPTH_IMAGE'), exist_ok=True)

    cams_by_letter = {'M': _synth_camera(rng, depth_imshape)}
    videos = {'train': '0001-M', 'valid': '0002-M', 'test': '0003-M'}
    counts = {'train': num_train, 'valid': num_valid, 'test': num_valid}

    samples = []
    for phase, count in counts.items():
        video = videos[phase]
        for i in range(count):
            cam = _synth_camera(rng, imshape)
            dcam = cams_by_letter[video[5]]
            skel_cam = _synth_skeleton(rng, num_joints)
            skel_world = cam.camera_to_world(skel_cam)

            img, pix = _render(cam, skel_cam, imshape, rng)
            bbox = np.concatenate([pix.min(0) - 15,
                                   pix.max(0) - pix.min(0) + 30]).astype(np.float32)
            dpix = dcam.world_to_image(skel_world)
            dbbox = np.concatenate([dpix.min(0) - 15,
                                    dpix.max(0) - dpix.min(0) + 30]).astype(np.float32)
            ddepth = dcam.world_to_camera(skel_world)[:, 2]
            dimg = np.zeros(depth_imshape, np.uint16)
            yy, xx = np.mgrid[:depth_imshape[0], :depth_imshape[1]]
            for j, p in enumerate(dpix):
                mask = (xx - p[0]) ** 2 + (yy - p[1]) ** 2 < 36
                dimg[mask] = np.uint16(ddepth[j])

            frame = i
            path = os.path.join(root, 'images', f'{video}_{frame:04d}.jpg')
            Image.fromarray(img).save(path, quality=95)
            Image.fromarray(dimg).save(
                os.path.join(root, 'DEPTH_IMAGE',
                             video + '.' + str(frame) + '.png'))
            samples.append(dict(image=path, camera=cam, bbox=bbox,
                                depth_bbox=dbbox, skeleton=skel_world,
                                valid=np.ones(num_joints, bool),
                                video=video, frame=frame))

    with open(os.path.join(root, 'final_samples.pkl'), 'wb') as f:
        pickle.dump(samples, f)
    with open(os.path.join(root, 'cameras.pkl'), 'wb') as f:
        pickle.dump(cams_by_letter, f)
    with open(os.path.join(root, 'split.json'), 'w') as f:
        json.dump({p: [videos[p]] for p in videos}, f)

    metadata = dict(root=dict(pku=root), loader=dict(pku='depth_datasets'),
                    no_depth=dict(pku=False),
                    thresholds=dict(pku=dict(solid=50.0, close=100.0,
                                             rough=150.0)))
    metadata_path = os.path.join(root, 'metadata.json')
    with open(metadata_path, 'w') as f:
        json.dump(metadata, f)
    return metadata_path
