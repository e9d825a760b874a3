"""Multi-producer loader: `-workers N` runs N batch-builder threads with a
reorder buffer (torch DataLoader num_workers analogue, datasets.py:5). The
batch stream — including every RNG draw — must be identical to the
single-producer stream."""

import types

import numpy as np
import pytest


def make_args(metadata_path, workers):
    return types.SimpleNamespace(
        criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
        depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4, n_epochs=1,
        do_track=False, joint_space=True, extra_channel=True, shuffle=True,
        geometry=True, colour=True, eraser=False, occluder=False,
        occ_path=None, occ_count=0, batch_size=4, data_name='cmu',
        metadata_path=metadata_path, random_zoom=0.9, n_cudas=1,
        workers=workers)


@pytest.fixture(scope='module')
def cmu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('cmu_workers')
    return make_cmu_fixture(str(root), num_train=13, num_valid=4)


def _epoch(meta, workers, epochs=2):
    from pose_tpu.data.loader import PoseLoader
    from datasets import build_info
    loader = PoseLoader(make_args(meta, workers), 'train', build_info('cmu'))
    out = []
    for _ in range(epochs):              # 2 epochs: order reshuffles, RNG
        for batch in loader:             # draws advance with the epoch
            out.append({k: np.asarray(v) for k, v in batch.items()
                        if k != '_true_size'})
    return out


def test_multi_producer_stream_identical(cmu):
    single = _epoch(cmu, workers=1)
    multi = _epoch(cmu, workers=3)
    assert len(single) == len(multi)
    for a, b in zip(single, multi):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_eval_warp_default_resolution(cmu, monkeypatch):
    """Eval-resampler default policy (VERDICT round-2 item 6): 'mxu' on
    TPU, 'gather' elsewhere; `-strict_eval` forces gather; the env var
    overrides everything."""
    from pose_tpu.data.loader import PoseLoader
    from datasets import build_info

    monkeypatch.delenv('POSE_TPU_EVAL_WARP', raising=False)

    def impl_of(strict=False, env=None):
        if env is not None:
            monkeypatch.setenv('POSE_TPU_EVAL_WARP', env)
        else:
            monkeypatch.delenv('POSE_TPU_EVAL_WARP', raising=False)
        args = make_args(cmu, 1)
        args.strict_eval = strict
        return PoseLoader(args, 'valid', build_info('cmu')).eval_warp_impl

    import jax
    default = 'mxu' if jax.default_backend() == 'tpu' else 'gather'
    assert impl_of() == default
    assert impl_of(strict=True) == 'gather'
    assert impl_of(env='mxu') == 'mxu'
    assert impl_of(strict=True, env='mxu') == 'mxu'  # env wins


def test_eval_warp_mxu_close_to_gather(cmu, monkeypatch):
    """POSE_TPU_EVAL_WARP=mxu (VERDICT round-2 item 8, 3.1x faster eval on
    device) must produce eval inputs within the documented ~0.002 intensity
    envelope of the strict-cv2 gather default."""
    from pose_tpu.data.loader import PoseLoader
    from datasets import build_info

    def batches(impl):
        monkeypatch.setenv('POSE_TPU_EVAL_WARP', impl)
        loader = PoseLoader(make_args(cmu, 1), 'valid', build_info('cmu'))
        return [np.asarray(b['image']) for b in loader]

    gather = batches('gather')
    mxu = batches('mxu')
    for g, m in zip(gather, mxu):
        d = np.abs(g - m)
        # images are ImageNet-normalized (std ~0.22): 0.002 intensity
        # ~ 0.009 normalized
        assert d.mean() < 0.01
        assert np.median(d) < 0.005


@pytest.mark.parametrize('workers', [1, 3])
def test_producer_error_propagates(cmu, monkeypatch, workers):
    """A raising _decode_batch (e.g. one corrupt JPEG in the store) must
    surface as an exception in the consuming training loop — not die in the
    daemon producer thread and leave the consumer blocked forever."""
    from pose_tpu.data.loader import PoseLoader
    from datasets import build_info

    loader = PoseLoader(make_args(cmu, workers), 'train', build_info('cmu'))
    real = PoseLoader._decode_batch
    calls = {'n': 0}

    def failing(self, idxs):
        calls['n'] += 1
        if calls['n'] == 2:
            raise IOError('decode failed: corrupt image')
        return real(self, idxs)

    monkeypatch.setattr(PoseLoader, '_decode_batch', failing)
    with pytest.raises(IOError, match='corrupt image'):
        for _ in loader:
            pass
