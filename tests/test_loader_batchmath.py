"""The vectorized batch parse (funcam call chain) must reproduce the
per-sample parse exactly: same RNG draws, same crop cameras, same lookups,
same GT transforms (host-scalability rewrite, VERDICT round-2 items 2/4)."""

import numpy as np
import pytest

from tests.test_distorted_loader import make_args


@pytest.fixture(scope='module')
def cmu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('cmu_bm')
    return make_cmu_fixture(str(root), num_train=8, num_valid=4)


@pytest.fixture(scope='module')
def cmu_distorted(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('cmu_bm_dist')
    return make_cmu_fixture(str(root), num_train=8, num_valid=4,
                            distorted=True)


def _compare(batch, per_sample, keys):
    for key in keys:
        stacked = np.stack([np.asarray(p[key]) for p in per_sample])
        np.testing.assert_allclose(
            np.asarray(batch[key], np.float64), stacked.astype(np.float64),
            rtol=1e-4, atol=1e-4, err_msg=key)


@pytest.mark.parametrize('phase', ['train', 'valid'])
def test_pose_parse_batch_matches_per_sample(cmu, phase):
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    args = make_args(cmu, joint_space=True, extra_channel=True)
    loader = PoseLoader(args, phase, build_info('cmu'))
    idxs = np.arange(4)
    batch, paths = loader.parse_batch(idxs)
    per_sample = [loader.parse_sample(loader.samples[i], int(i),
                                      decode=False) for i in idxs]
    assert paths == [p.pop('image_path') for p in per_sample]
    keys = ['homography', 'true_cam', 'true_mat', 'intrinsics', 'bbox_quad']
    if phase != 'train':
        keys.append('back_rotation')
    _compare(batch, per_sample, keys)
    stacked_val = np.stack([p['true_val'] for p in per_sample])
    np.testing.assert_array_equal(batch['true_val'], stacked_val)


def test_pose_parse_batch_matches_per_sample_distorted(cmu_distorted):
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    args = make_args(cmu_distorted)
    loader = PoseLoader(args, 'train', build_info('cmu'))
    idxs = np.arange(4)
    batch, _ = loader.parse_batch(idxs)
    per_sample = [loader.parse_sample(loader.samples[i], int(i),
                                      decode=False) for i in idxs]
    _compare(batch, per_sample,
             ['partial_homography', 'old_intrinsics', 'dist_coeffs',
              'true_cam'])


def test_depth_parse_sample_conditions_gray_and_rgba(tmp_path_factory):
    """DepthPoseLoader.parse_sample's decode path must apply the same image
    conditioning as the batched _decode_images path (grayscale replicated to
    3 channels, alpha stripped, PNG floats rescaled) — it previously fixed
    only the dtype, so a gray/RGBA colour frame broke the fixed HxWx3 colour
    pipeline on the per-sample path alone."""
    from PIL import Image
    from pose_tpu.data.synthetic import make_ntu_fixture
    from pose_tpu.data.loader import (DepthPoseLoader, condition_image,
                                      imread)
    from depth_main import get_info
    root = tmp_path_factory.mktemp('ntu_gray')
    meta = make_ntu_fixture(str(root), num_train=8, num_valid=4)
    args = make_args(meta, data_name='ntu', num_joints=17, do_teach=False,
                     attention=False, nexponent=False, to_depth=False,
                     semi_teach=False)
    loader = DepthPoseLoader(args, 'train', get_info())
    rng = np.random.RandomState(0)
    sample = dict(loader.samples[0])
    for arr in (rng.randint(0, 255, (40, 48), dtype=np.uint8),      # gray
                rng.randint(0, 255, (40, 48, 4), dtype=np.uint8)):  # RGBA
        path = str(root / f'odd_{arr.ndim}.png')
        Image.fromarray(arr).save(path)
        sample['image'] = path
        out = loader.parse_sample(sample, 0, decode=True)
        canvas = out['canvas']
        assert canvas.shape[-1] == 3 and canvas.dtype == np.uint8
        want = condition_image(imread(path))
        np.testing.assert_array_equal(canvas[:40, :48], want)


def test_depth_parse_batch_matches_per_sample(tmp_path_factory):
    from pose_tpu.data.synthetic import make_ntu_fixture
    from pose_tpu.data.loader import DepthPoseLoader
    from depth_main import get_info
    root = tmp_path_factory.mktemp('ntu_bm')
    meta = make_ntu_fixture(str(root), num_train=8, num_valid=4)
    args = make_args(meta, data_name='ntu', num_joints=17, do_teach=True,
                     attention=True, nexponent=False, to_depth=False,
                     semi_teach=False)
    loader = DepthPoseLoader(args, 'train', get_info())
    idxs = np.arange(4)
    batch, paths, dpaths = loader.parse_batch(idxs)
    per_sample = [loader.parse_sample(loader.samples[i], int(i),
                                      decode=False) for i in idxs]
    assert paths == [p.pop('image_path') for p in per_sample]
    assert dpaths == [p.pop('depth_path') for p in per_sample]
    _compare(batch, per_sample,
             ['homography', 'depth_homography', 'depth_k_inv', 'true_cam',
              'atten_map'])
