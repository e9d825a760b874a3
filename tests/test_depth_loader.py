"""DepthPoseLoader and MixedLoader behavior on the NTU fixture."""

import types

import numpy as np
import pytest


def make_args(metadata_path, **over):
    base = dict(criterion='SmoothL1', half_acc=False, depth=4, num_joints=17,
                depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
                weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4,
                n_epochs=1, do_track=False, joint_space=False,
                shuffle=True, geometry=True, colour=True, eraser=False,
                occluder=False, occ_path=None, occ_count=0, batch_size=4,
                data_name='ntu', metadata_path=metadata_path,
                random_zoom=0.9, n_cudas=1, workers=1, nexponent=False,
                to_depth=False, do_teach=False, attention=False,
                semi_teach=False)
    base.update(over)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope='module')
def ntu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_ntu_fixture
    root = tmp_path_factory.mktemp('ntu_dl')
    return make_ntu_fixture(str(root), num_train=8, num_valid=4)


def test_depth_loader_train_batches(ntu):
    from depth_datasets import data_loader
    from depth_main import get_info
    args = make_args(ntu)
    loader = data_loader(args, 'train', get_info())
    batch = next(iter(loader))
    assert batch['color'].shape == (4, 65, 65, 3)
    assert batch['depth'].shape == (4, 65, 65, 1)
    assert batch['true_cam'].shape == (4, 17, 3)
    assert np.all(np.isfinite(np.asarray(batch['color'])))
    assert np.all(np.isfinite(np.asarray(batch['depth'])))
    # enhance: valid pixels are scaled raw/3, so nonzero where person is
    assert float(np.asarray(batch['depth']).max()) > 0


def test_depth_loader_distill_attention(ntu):
    from depth_datasets import data_loader
    from depth_main import get_info
    args = make_args(ntu, do_teach=True, attention=True)
    loader = data_loader(args, 'train', get_info())
    batch = next(iter(loader))
    atten = np.asarray(batch['atten_map'])
    assert atten.shape == (4, 3, 3, 1)        # NHWC, side_out=3
    assert atten.max() == pytest.approx(1.0, abs=1e-5)


def test_depth_loader_nexponent(ntu):
    from depth_datasets import data_loader
    from depth_main import get_info
    args = make_args(ntu, nexponent=True)
    loader = data_loader(args, 'train', get_info())
    batch = next(iter(loader))
    d = np.asarray(batch['depth'])
    # exp(-x)*veil stays in [0, 1]
    assert d.min() >= 0 and d.max() <= 1.0 + 1e-5


def test_depth_loader_eval_back_rotation(ntu):
    from depth_datasets import data_loader
    from depth_main import get_info
    args = make_args(ntu, shuffle=False, geometry=False, colour=False)
    loader = data_loader(args, 'valid', get_info())
    batch = next(iter(loader))
    br = batch['back_rotation'][0]
    np.testing.assert_allclose(br @ br.T, np.eye(3), atol=1e-4)


def test_mixed_loader(ntu, tmp_path):
    from depth_main import get_info
    from pose_tpu.data.loader import DepthPoseLoader
    from pose_tpu.data.mixed import MixedLoader

    args = make_args(ntu)
    a = DepthPoseLoader(args, 'train', get_info())
    b = DepthPoseLoader(args, 'train', get_info(), seed=7)
    mixed = MixedLoader([a, b], seed=0)
    assert len(mixed) == len(a) + len(b)
    batches = list(mixed)
    assert len(batches) == len(mixed)
    assert {bt['_dataset'] for bt in batches} == {0, 1}


def test_gated_impl_uses_depth_canvas_shape():
    """The banded-warp gate must validate DEPTH homographies against the
    depth canvas, not the colour canvas (regression: it passed self.canvas
    for both streams)."""
    import types
    from unittest import mock
    from pose_tpu.data.loader import PoseLoader

    calls = []

    def fake_gate(homs, src_hw, out_hw, band=32):
        calls.append(tuple(src_hw))
        return True

    self_like = types.SimpleNamespace(
        at_test=False, warp_impl='pallas_banded', eval_warp_impl='gather',
        canvas=(512, 512), side_in=257)
    homs = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    with mock.patch('pose_tpu.ops.warp_pallas.band_ok_v2', fake_gate):
        impl = PoseLoader._gated_impl(self_like, homs, src_hw=(424, 512))
        assert impl == 'pallas_banded'
        impl = PoseLoader._gated_impl(self_like, homs)
    assert calls == [(424, 512), (512, 512)]


def test_depth_warp_keeps_f32_sources(monkeypatch):
    """The depth stream must pass wdtype=f32 into the matmul/split warps:
    their bf16 TPU default is exact only for uint8-valued colour sources —
    raw depth would be quantized to 8 significant bits (~8 mm at uint16-mm
    scale) where the reference's cv2 warp is f32-exact. Pinned via kwarg
    capture so a future dispatch change can't silently drop the override."""
    import jax.numpy as jnp
    from pose_tpu.data import augment
    from pose_tpu.ops import warp

    seen = {}
    real_split, real_mxu = warp.warp_batch_split, warp.warp_batch_mxu

    def spy_split(*a, **k):
        seen['split'] = k.get('wdtype')
        return real_split(*a, **k)

    def spy_mxu(*a, **k):
        seen['mxu'] = k.get('wdtype')
        return real_mxu(*a, **k)

    monkeypatch.setattr(warp, 'warp_batch_split', spy_split)
    monkeypatch.setattr(warp, 'warp_batch_mxu', spy_mxu)
    canv = jnp.full((2, 48, 48, 1), 0.05, jnp.float32)
    homs = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    exts = jnp.tile(jnp.asarray([48, 48], jnp.int32), (2, 1))
    kinv = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    thr = jnp.full((2,), 0.1, jnp.float32)
    # __wrapped__ bypasses the jit cache so the spies always fire
    for impl in ('split_mxu', 'mxu'):
        augment.process_depth_batch.__wrapped__(
            canv, homs, exts, kinv, thr, 32, False, False, warp_impl=impl)
    assert seen == {'split': jnp.float32, 'mxu': jnp.float32}
