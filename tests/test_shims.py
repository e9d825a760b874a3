"""Compatibility-shim tests: the reference-named root modules must expose the
reference API surface and behave like the original implementations."""

import numpy as np
import pytest


def test_cameralib_shim_reproject_image():
    import cameralib
    cam = cameralib.Camera(
        [0, 0, 0], np.eye(3),
        np.array([[200., 0, 64], [0, 200., 48], [0, 0, 1]]), None)
    new_cam = cam.copy()
    new_cam.zoom(0.5)

    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    out = cameralib.reproject_image(img, cam, new_cam, (96, 128))
    assert out.shape == (96, 128, 3)
    assert out.dtype == np.uint8
    # zooming out by 2x maps the image into the center region
    assert out[48, 64].sum() > 0


def test_cameralib_shim_unpickles_reference_format():
    import pickle

    import cameralib
    cam = cameralib.Camera([1, 2, 3], np.eye(3),
                           np.array([[100., 0, 5], [0, 100., 5], [0, 0, 1]]),
                           np.array([0.1, 0, 0, 0, 0]))
    blob = pickle.dumps(cam)
    back = pickle.loads(blob)
    assert back.__class__.__module__.startswith('pose_tpu')
    np.testing.assert_allclose(back.t, [1, 2, 3])


def test_utils_shim_surface():
    import utils
    # decode path
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 4 * 5, 9, 9).astype(np.float32)  # NCHW like torch
    hm = utils.to_heatmap(feat, 4, 5, 9, 9)
    assert hm.shape == (2, 5, 9, 9, 4)
    coords = utils.decode(hm, 1000.0)
    assert coords.shape == (2, 5, 3)

    # attention map
    atten = utils.get_attention(65, 32, np.float32([[32, 32]]), True)
    assert atten.shape == (1, 3, 3)

    # metrics
    spec = rng.randn(2, 5, 3).astype(np.float32)
    true = spec + 10.0
    stats = utils.analyze(spec, true, np.ones((2, 5), bool), np.arange(5),
                          dict(solid=50, close=100, rough=150))
    assert stats['cam_mean'] == pytest.approx(np.sqrt(300), rel=1e-4)

    # records
    info = utils.JointInfo(['a', 'b'], [0, 0], [1, 0], 0)
    assert info.key_index == 0
    sample = utils.PoseSample('p.jpg', None, None, None, None)
    assert sample.image_path == 'p.jpg'


def test_mat_utils_shim_surface():
    import mat_utils
    rng = np.random.RandomState(1)
    feat = rng.randn(2, 5, 9, 9).astype(np.float32)
    hm = mat_utils.to_heatmap(feat, 5, 9, 9)
    assert hm.shape == (2, 5, 9, 9)
    coords = mat_utils.decode(hm, 65)
    assert coords.shape == (2, 5, 2)

    spec = rng.uniform(0, 65, (2, 5, 2))
    true = spec + 2.0
    stats = mat_utils.analyze(spec, true, np.ones((2, 5), bool), 65)
    assert stats['mat_mean'] == pytest.approx(np.sqrt(8), rel=1e-4)


def test_mat_utils_mapper():
    """Mapper gathers matched joints into the dest layout, zeros elsewhere
    (reference mat_utils.py:6-20 semantics)."""
    import mat_utils

    class Info:
        def __init__(self, names):
            self.short_names = names

    curr = Info(['a', 'b', 'c', 'd'])
    dest = Info(['x', 'y', 'z'])
    mapper = mat_utils.Mapper(curr, dest, {'a': 'z', 'c': 'x'})
    coords = np.arange(12, dtype=np.float64).reshape(4, 3)
    out = mapper.map_coord(coords)
    np.testing.assert_allclose(out[0], coords[2])   # x <- c
    np.testing.assert_allclose(out[1], 0.0)         # y unmapped
    np.testing.assert_allclose(out[2], coords[0])   # z <- a
    assert mapper.len_dest == 3


def test_log_shim():
    import log
    assert hasattr(log, 'Logger')


def test_boxlib_shim():
    import boxlib
    assert abs(boxlib.iou(np.float32([0, 0, 10, 10]),
                          np.float32([0, 0, 10, 10])) - 1.0) < 1e-6


def test_datasets_shim_build_info():
    import datasets
    info = datasets.build_info('cmu')
    assert len(info.short_names) == 19
    assert info.short_names[info.key_index] == 'BodyCenter'
    # mirror of lShoulder is rShoulder
    ls = info.short_names.index('lShoulder')
    rs = info.short_names.index('rShoulder')
    assert info.mirror[ls] == rs

    info17 = datasets.build_info('h36m')
    assert len(info17.short_names) == 17
    assert info17.short_names[info17.key_index] == 'pelv'


def test_depth_main_get_info():
    import depth_main
    info = depth_main.get_info()
    assert len(info.short_names) == 17
    assert info.short_names[info.key_index] == 'pelv'


def test_model_module_shims_construct():
    import types

    import jax.numpy as jnp

    def args(**over):
        base = dict(model='resnet18', side_in=65, stride=32, num_joints=5,
                    depth=4, joint_space=False, extra_channel=False,
                    depth_only=True, skip_relu=False, early_dist=False,
                    pretrain=False)
        base.update(over)
        return types.SimpleNamespace(**base)

    import depthnet
    import fusionnet
    import partial_depthnet
    import resnet as resnet_mod

    m, v = resnet_mod.resnet18(args(depth_only=False))
    out = m.apply(v, jnp.ones((1, 65, 65, 3)), train=False)
    assert out.shape == (1, 3, 3, 20)

    m, v = depthnet.resnet18(args(), pretrain=False)
    z, feat = m.apply(v, jnp.ones((1, 65, 65, 1)), train=False)
    assert z.shape == (1, 3, 3, 20)

    m, v = fusionnet.resnet18(args(depth_only=False), pretrain=False)
    z, feat = m.apply(v, jnp.ones((1, 65, 65, 3)), jnp.ones((1, 65, 65, 1)),
                      train=False)
    assert z.shape == (1, 3, 3, 20)

    m, v = partial_depthnet.resnet18(args(), pretrain=False)
    z, feat = m.apply(v, jnp.ones((1, 65, 65, 1)), train=False)
    assert z.shape == (1, 3, 3, 20)


def test_partial_conv_shim_call_shape():
    import numpy as np

    import jax.numpy as jnp

    from partial_conv import PartialConv

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32))
    conv = PartialConv(k, stride=1, padding=1)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 1))
    out, mask_out = conv(x, mask)
    assert out.shape == (1, 8, 8, 4)
    assert mask_out.shape == (1, 8, 8, 1)


def test_area_downscale_matches_cv2_inter_area():
    """ops.warp.area_downscale is an exact area average; cv2.resize
    INTER_AREA is its fixed-point implementation (cameralib.py:687-688)."""
    import cv2
    import jax.numpy as jnp
    from pose_tpu.ops import warp

    rng = np.random.RandomState(3)
    img = rng.rand(100, 120, 3).astype(np.float32)
    for new_hw in [(37, 47), (50, 60), (73, 111)]:
        ours = np.asarray(warp.area_downscale(jnp.asarray(img), new_hw))
        golden = cv2.resize(img, (new_hw[1], new_hw[0]),
                            interpolation=cv2.INTER_AREA)
        assert np.abs(ours - golden).max() < 2e-3, new_hw


def test_reproject_image_antialias_prescale():
    """The antialias=True path (cameralib.py:676-689): pre-downscale by the
    isotropic factor, scale the homography, then warp. Golden: the same
    algorithm with cv2.resize INTER_AREA + cv2.warpPerspective."""
    import cv2
    import cameralib

    cam = cameralib.Camera(
        [0, 0, 0], np.eye(3),
        np.array([[200., 0, 64], [0, 200., 48], [0, 0, 1]]), None)
    new_cam = cam.copy()
    new_cam.zoom(0.4)   # strong minification -> factor < 1

    rng = np.random.RandomState(0)
    img = rng.rand(96, 128, 3).astype(np.float32)
    out = cameralib.reproject_image(img, cam, new_cam, (96, 128),
                                    antialias=True)

    from pose_tpu.geometry.camera import get_homography
    from pose_tpu.ops.warp import antialias_factor
    hom = get_homography(cam, new_cam).astype(np.float32)
    factor = antialias_factor(hom, (96, 128))
    assert factor < 1
    scaled = (int(np.round(factor * 128)), int(np.round(factor * 96)))
    small = cv2.resize(img, scaled, interpolation=cv2.INTER_AREA)
    hom2 = hom.copy()
    hom2[:2] *= factor
    golden = cv2.warpPerspective(
        small, hom2, (128, 96),
        flags=cv2.WARP_INVERSE_MAP | cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # interior-pixel agreement (border rows differ by zero-pad handling)
    assert np.abs(out[2:-2, 2:-2] - golden[2:-2, 2:-2]).max() < 0.02


def test_reproject_image_distorted_target():
    """Warping INTO a distorted camera must route through the general
    undistort->redistort per-pixel path (reference cameralib.py:408-433) —
    it previously fell through to the pure-homography branch (geometrically
    wrong, no error). Golden: cv2.undistortPoints(P=K_old) lookup coords +
    cv2.remap."""
    import cv2
    import cameralib

    K_old = np.array([[120., 0, 64], [0, 120., 48], [0, 0, 1]])
    K_new = np.array([[100., 0, 60], [0, 100., 44], [0, 0, 1]])
    dist = np.array([-0.2, 0.05, 0.001, -0.001, 0.0])
    old = cameralib.Camera([0, 0, 0], np.eye(3), K_old, None)
    new = cameralib.Camera([0, 0, 0], np.eye(3), K_new, dist)
    yy, xx = np.mgrid[:96, :128].astype(np.float32)
    img = np.stack([np.sin(xx / 7.0) * 0.4 + 0.5,
                    np.cos(yy / 5.0) * 0.4 + 0.5,
                    (xx + yy) / 224.0], -1).astype(np.float32)

    out = cameralib.reproject_image(img, old, new, (96, 128))

    pts = np.stack([xx, yy], -1).reshape(-1, 1, 2).astype(np.float64)
    src = cv2.undistortPoints(pts, K_new, dist, P=K_old).astype(
        np.float32).reshape(96, 128, 2)
    golden = cv2.remap(img, src[..., 0], src[..., 1], cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    assert np.abs(out[4:-4, 4:-4] - golden[4:-4, 4:-4]).max() < 0.02
    # and it is genuinely different from the pinhole-homography warp
    pinhole = cameralib.Camera([0, 0, 0], np.eye(3), K_new, None)
    hom_out = cameralib.reproject_image(img, old, pinhole, (96, 128))
    assert np.abs(out[4:-4, 4:-4] - hom_out[4:-4, 4:-4]).max() > 0.05


def test_reproject_image_rejects_rational_model():
    """>5 distortion coefficients (cv2's 8/12/14-term rational models) are
    not implemented on the warp path: loud NotImplementedError instead of a
    broadcast crash."""
    import cameralib
    K = np.array([[100., 0, 16], [0, 100., 16], [0, 0, 1]])
    cam8 = cameralib.Camera([0, 0, 0], np.eye(3), K, np.zeros(8) + 0.01)
    pin = cameralib.Camera([0, 0, 0], np.eye(3), K, None)
    img = np.zeros((32, 32, 3), np.float32)
    with pytest.raises(NotImplementedError, match='5-coefficient'):
        cameralib.reproject_image(img, cam8, pin, (32, 32))
    with pytest.raises(NotImplementedError, match='5-coefficient'):
        cameralib.reproject_image(img, pin, cam8, (32, 32))


def test_cmu_split_reference_path_layout():
    """Reference-built CMU stores carry no 'sequence' key; the split must
    recover the sequence from the reference's download layout
    <data_down_path>/<sequence>.<cam>/<frame>.<body>.jpg
    (data_groups.py:140,180)."""
    from pose_tpu.data.samples import cmu_split

    split = {'train': ['171204_pose1'], 'test': ['171026_pose2']}
    s_train = {'image': '/data/cmu_down/171204_pose1.00_03/120.1.jpg'}
    s_test = {'image': '/data/cmu_down/171026_pose2.00_07/88.0.jpg'}
    assert cmu_split(split, 'train', s_train)
    assert not cmu_split(split, 'train', s_test)
    assert cmu_split(split, 'test', s_test)
    # stores built by our own tools carry the explicit key
    assert cmu_split(split, 'train', {'sequence': '171204_pose1',
                                      'image': 'x.jpg'})


def test_augment_shims_surface(tmp_path):
    """Reference-named augment_colour/augment_occluder host APIs (numpy
    in/out, implicit RNG) delegate to the on-device ops."""
    import augment_colour
    import augment_occluder

    rng = np.random.RandomState(0)
    # the reference contract is [0, 256) in, uint8 [0, 255] out
    # (augment_colour.py:48-58, augment_occluder.py:84-105)
    img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    out = augment_colour.random_color(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # mid-range jitter, not clipped-to-white (the old [0,1] convention bug)
    assert 20 < out.mean() < 235

    erased = augment_occluder.random_erase(img)
    assert erased.shape == img.shape and erased.dtype == np.uint8
    diff = erased.astype(int) - img.astype(int)
    assert np.abs(diff).max() > 2              # a rectangle was filled
    assert (diff != 0).mean() < 0.5            # ...but most pixels kept

    np.save(tmp_path / 'occluder_0.npy',
            (rng.rand(20, 16, 3) * 255).astype(np.uint8))
    np.save(tmp_path / 'mask_0.npy', np.ones((20, 16), np.float32))
    occ, mask = augment_occluder.fetch_occluders(0, str(tmp_path))
    assert occ.shape == (20, 16, 3) and mask.shape == (20, 16)
    pasted = augment_occluder.random_occlu(img, 1, str(tmp_path))
    assert pasted.shape == img.shape and pasted.dtype == np.uint8
    assert pasted.mean() > 20                  # not silently near-black


def test_image_loader_decode_crop_ratio(tmp_path):
    """cameralib.get_image_loader(): working decode-and-crop with the
    reference's [x, y, w, h] box and 1/2/4/8 ratio API (cameralib.py:765-793
    — whose TF1 load() fetched the placeholder and never decoded)."""
    import cv2
    import cameralib

    rng = np.random.RandomState(3)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    path = str(tmp_path / 'im.jpg')
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
    with open(path, 'rb') as f:
        encoded = f.read()
    decoded = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)

    loader = cameralib.get_image_loader()
    assert loader is cameralib.get_image_loader()          # lru_cache parity

    full = loader.load(encoded)
    np.testing.assert_array_equal(full, decoded)

    crop = loader.load(encoded, box=[8, 4, 32, 24])
    np.testing.assert_array_equal(crop, decoded[4:28, 8:40])

    half = loader.load(encoded, box=[8, 4, 32, 24], ratio=2)
    assert half.shape == (12, 16, 3)
    eighth = loader.load(encoded, ratio=8)                  # ceil(48/8)=6
    assert eighth.shape == (6, 8, 3)

    with pytest.raises(ValueError):
        loader.load(encoded, box=[60, 0, 10, 10])           # out of bounds
    with pytest.raises(ValueError):
        loader.load(encoded, ratio=3)

    # the reference's unfinished stub returns None (cameralib.py:796-801)
    assert cameralib.reproject_image_fast_partial(path, None, None,
                                                  (8, 8)) is None
