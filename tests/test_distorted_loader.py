"""Runtime-loader handling of distorted source cameras (VERDICT round-2
item 6): the general per-pixel lookup path (cameralib.py:408-433 analogue)
batched through PoseLoader, including mixed distorted/undistorted batches."""

import types

import numpy as np
import pytest


def make_args(metadata_path, **over):
    base = dict(criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
                depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
                weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4,
                n_epochs=1, do_track=False, joint_space=False,
                shuffle=False, geometry=True, colour=False, eraser=False,
                occluder=False, occ_path=None, occ_count=0, batch_size=4,
                data_name='cmu', metadata_path=metadata_path,
                random_zoom=0.9, n_cudas=1, workers=1)
    base.update(over)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope='module')
def cmu_distorted(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('cmu_dist')
    return make_cmu_fixture(str(root), num_train=8, num_valid=4,
                            distorted=True)


def test_parse_sample_emits_general_lookup(cmu_distorted):
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    args = make_args(cmu_distorted)
    loader = PoseLoader(args, 'train', build_info('cmu'))
    parsed = loader.parse_sample(loader.samples[0], 0)
    assert 'homography' not in parsed
    assert parsed['partial_homography'].shape == (3, 3)
    assert parsed['old_intrinsics'].shape == (3, 3)
    assert parsed['dist_coeffs'].shape == (5,)
    assert np.any(parsed['dist_coeffs'])


def test_distorted_train_batch_runs(cmu_distorted):
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    args = make_args(cmu_distorted, colour=True)
    loader = PoseLoader(args, 'train', build_info('cmu'))
    batch = next(iter(loader))
    img = np.asarray(batch['image'])
    assert img.shape == (4, 65, 65, 3)
    assert np.all(np.isfinite(img))
    # ImageNet-normalized output with real content, not all border fill
    assert img.std() > 0.1


def test_distorted_crop_matches_host_reference(cmu_distorted):
    """The batched device crop must equal the host single-image general warp
    (cameralib.reproject_image), which is itself cv2-golden-tested."""
    import cameralib
    from datasets import build_info
    from pose_tpu.data import crop
    from pose_tpu.data.loader import PoseLoader, imread

    args = make_args(cmu_distorted)
    loader = PoseLoader(args, 'valid', build_info('cmu'))
    sample = loader.samples[0]

    # device path: one batch through the loader (eval: no colour jitter)
    batch = loader._finalize(loader._decode_batch(np.array([0, 0, 0, 0])), 0)
    from pose_tpu.ops.colour import IMAGENET_MEAN, IMAGENET_DEV
    got = (np.asarray(batch['image'])[0] * IMAGENET_DEV + IMAGENET_MEAN)

    # host path: rebuild the identical crop camera and warp on the host
    new_cam, _ = crop.build_crop(sample['camera'], sample['bbox'],
                                 args.side_in, False, 1.0, False)
    image = imread(sample['image'])
    expect = cameralib.reproject_image(image, sample['camera'], new_cam,
                                       (args.side_in, args.side_in))
    # uint8 warp + /255 + trunc replication: compare in [0,1]
    np.testing.assert_allclose(got, expect.astype(np.float32) / 255.0,
                               atol=2.5 / 255.0)


def test_mixed_batch_unification_is_exact(cmu_distorted, tmp_path_factory):
    """An undistorted sample converted to the general triple (identity
    intrinsics, zero coefficients) must produce the *same pixels* as the
    plain homography gather warp."""
    import jax.numpy as jnp
    from pose_tpu.data import augment
    from pose_tpu.ops import warp

    rng = np.random.RandomState(0)
    canvas = rng.randint(0, 255, (1, 96, 96, 3), np.uint8)
    hom = np.array([[[1.3, 0.02, 4.0], [-0.01, 1.25, 2.0],
                     [1e-5, -1e-5, 1.0]]], np.float32)
    extent = np.array([[96, 96]], np.int32)

    plain = warp.warp_batch(jnp.asarray(canvas).astype(jnp.float32) / 255.0,
                            jnp.asarray(hom), (65, 65), jnp.asarray(extent))
    general = augment._warp_general(
        jnp.asarray(canvas), jnp.asarray(hom),
        jnp.asarray(np.eye(3, dtype=np.float32)[None]),
        jnp.asarray(np.zeros((1, 5), np.float32)),
        jnp.asarray(extent), 65)
    np.testing.assert_allclose(np.asarray(general), np.asarray(plain),
                               atol=1e-6)


@pytest.mark.slow
def test_main_e2e_distorted(cmu_distorted, tmp_path):
    """main.py train + val_only roundtrip over the distorted store."""
    from tests.test_e2e import run_cli, _spec_line
    save = str(tmp_path / 'save')
    base = ['-suffix', 'dist', '-criterion', 'SmoothL1', '-batch_size', '4',
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-n_epochs', '1', '-n_cudas', '1', '-learn_rate', '1e-4',
            '-model', 'resnet18', '-data_name', 'cmu', '-num_joints', '19',
            '-metadata_path', cmu_distorted, '-save_path', save]
    out = run_cli('main.py', base + ['-shuffle', '-save_record', '-geometry',
                                     '-colour'])
    trained = _spec_line(out)
    out = run_cli('main.py', base + ['-val_only'])
    assert _spec_line(out) == trained
