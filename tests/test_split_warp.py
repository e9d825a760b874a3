"""Two-stage split warp (prescale + banded residual): the round-2
augmentation-path resampler for large canvases (ops/warp.py
warp_batch_split). The general warp's cost is weight-tensor *generation*
(out_h*src_h*src_w elements); the split generates ~16x fewer at 512^2.

Checks: decomposition exactness, numerical closeness to the single-pass
bilinear warp, Pallas/matmul stage-B equivalence, the host gate, and the
runtime-loader wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_tpu.ops import warp


def smooth_image(s, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    img = np.stack([np.sin(yy / 7.0) + np.cos(xx / 9.0),
                    (yy + xx) / (2 * s),
                    np.sin((yy + 2 * xx) / 11.0)], -1)
    img = (img - img.min()) / (img.max() - img.min())
    return np.clip(img + rng.rand(s, s, 3) * 0.1, 0, 1).astype(np.float32)


def crop_hom(s, out, zoom=1.0, th=0.0, tx=0.0, ty=0.0, p=0.0):
    sc = (s * 0.7) / out / zoom
    c, sn = np.cos(th), np.sin(th)
    return np.array([[sc * c, -sc * sn, tx], [sc * sn, sc * c, ty],
                     [p, -p, 1.0]], np.float32)


class TestDecompose:
    def test_reconstructs_homography(self):
        homs = np.stack([crop_hom(96, 49, 1.1, 0.04, 3, 5, 1e-4),
                         crop_hom(96, 49, 0.9, -0.03, 8, 2)])
        residual, scale = warp.decompose_homography(homs, (49, 49), 48,
                                                    xp=np)
        for h, r, sc in zip(homs, residual, scale):
            a = np.array([[sc[1, 0], 0, sc[1, 1]],
                          [0, sc[0, 0], sc[0, 1]],
                          [0, 0, 1]])
            np.testing.assert_allclose(a @ r, h, rtol=1e-5, atol=1e-5)

    def test_output_quad_lands_inside_intermediate(self):
        m = 48
        h = crop_hom(96, 49, 1.0, 0.05, 10, 4, 2e-4)
        residual, _ = warp.decompose_homography(h[None], (49, 49), m,
                                                xp=np)[0][0], None
        residual = warp.decompose_homography(h[None], (49, 49), m,
                                             xp=np)[0][0]
        corners = np.array([[0, 0, 1], [48, 0, 1], [0, 48, 1], [48, 48, 1]],
                           np.float64)
        p = corners @ residual.T
        xy = p[:, :2] / p[:, 2:]
        assert xy.min() >= -1e-3 and xy.max() <= m - 1 + 1e-3


class TestSplitWarp:
    def setup_method(self):
        self.s, self.out, self.m = 96, 49, 48
        img = smooth_image(self.s)
        self.imgs = jnp.asarray(np.stack([img, img[::-1].copy()]))
        self.homs = np.stack([crop_hom(96, 49, 1.0, 0.03, 5, 8, 1e-4),
                              crop_hom(96, 49, 0.92, -0.05, 12, 3)])
        self.ext = jnp.asarray(np.tile([self.s, self.s], (2, 1)).astype(
            np.int32))

    def test_close_to_single_pass_bilinear(self):
        ref = np.asarray(warp.warp_batch(
            self.imgs, jnp.asarray(self.homs), (self.out, self.out),
            self.ext))
        sp = np.asarray(warp.warp_batch_split(
            self.imgs, jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=24, stage_b='mxu'))
        d = np.abs(sp - ref)
        # Pointwise the two-stage reconstruction differs from single-pass
        # bilinear by up to the image's local pixel-to-pixel variation (the
        # test image carries 0.1-scale noise); the border ring additionally
        # blends the zero padding twice (same class of effect as the
        # reference's own antialias pre-downscale, cameralib.py:676-689)
        assert d[:, 2:-2, 2:-2, :].max() < 0.08
        assert d.mean() < 0.02

    def test_tracks_smooth_content_tightly(self):
        """On low-frequency content (where resampling choice matters for
        values, not filter character) the split warp matches single-pass
        bilinear to sub-0.1% mean."""
        yy, xx = np.mgrid[0:self.s, 0:self.s].astype(np.float32)
        img = np.stack([np.sin(yy / 19.0) * 0.5 + 0.5,
                        (yy + xx) / (2 * self.s),
                        np.cos(xx / 23.0) * 0.5 + 0.5], -1).astype(np.float32)
        imgs = jnp.asarray(np.stack([img, img]))
        ref = np.asarray(warp.warp_batch(
            imgs, jnp.asarray(self.homs), (self.out, self.out), self.ext))
        sp = np.asarray(warp.warp_batch_split(
            imgs, jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=24, stage_b='mxu'))
        d = np.abs(sp - ref)
        assert d.mean() < 1e-3
        assert d[:, 2:-2, 2:-2, :].max() < 5e-3

    def test_pallas_stage_b_matches_mxu(self):
        sp_mxu = np.asarray(warp.warp_batch_split(
            self.imgs, jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=32, stage_b='mxu'))
        sp_pal = np.asarray(warp.warp_batch_split(
            self.imgs, jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=32, interpret=True))
        np.testing.assert_allclose(sp_pal, sp_mxu, atol=1e-4)

    def test_uint8_matches_float_input(self):
        u8 = np.asarray(self.imgs * 255).astype(np.uint8)
        sp_u8 = np.asarray(warp.warp_batch_split(
            jnp.asarray(u8), jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=32, stage_b='mxu'))
        sp_f = np.asarray(warp.warp_batch_split(
            jnp.asarray(u8.astype(np.float32) / 255.0),
            jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=32, stage_b='mxu'))
        np.testing.assert_allclose(sp_u8, sp_f, atol=1e-5)

    def test_uint8_through_fused_kernel(self):
        """The single-kernel path reads the uint8 canvas block directly
        (int32-hop cast inside the kernel); values must match the float
        feed through the same kernel."""
        u8 = np.asarray(self.imgs * 255).astype(np.uint8)
        k_u8 = np.asarray(warp.warp_batch_split(
            jnp.asarray(u8), jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=32, interpret=True))
        k_f = np.asarray(warp.warp_batch_split(
            jnp.asarray(u8.astype(np.float32) / 255.0),
            jnp.asarray(self.homs), (self.out, self.out),
            self.ext, m=self.m, band=32, interpret=True))
        np.testing.assert_allclose(k_u8, k_f, atol=1e-5)

    def test_gate_accepts_crop_cameras_rejects_strong_rotation(self):
        # defaults derive (m, band) from out_shape (split_defaults)
        assert warp.split_band_ok(self.homs, (self.out, self.out))
        strong = crop_hom(96, 49, 1.0, 0.6, 5, 5)   # ~34 degrees
        assert not warp.split_band_ok(strong[None], (self.out, self.out))

    def test_gate_rejects_degenerate(self):
        bad = np.eye(3, dtype=np.float32)
        bad[2, 2] = 0.0
        assert not warp.split_band_ok(bad[None], (self.out, self.out))


class TestGateSoundness:
    def test_gate_accept_implies_kernel_matches_exact_path(self):
        """Property test over a distribution WIDER than the loader's: any
        homography the gate accepts must produce (fused Pallas kernel,
        interpret) == (exact two-pass matmul split) to f32 tolerance. The
        band bound is the correctness-critical piece of the split path —
        an unsound gate would silently corrupt training crops."""
        rng = np.random.RandomState(7)
        s, out, m, band = 96, 49, 48, 32
        img = jnp.asarray(smooth_image(s)[None])
        ext = jnp.asarray(np.array([[s, s]], np.int32))
        accepted = 0
        for trial in range(40):
            h = crop_hom(
                s, out,
                zoom=rng.uniform(0.7, 1.4),
                th=rng.uniform(-0.45, 0.45),
                tx=rng.uniform(-5, 20), ty=rng.uniform(-5, 20),
                p=rng.uniform(-3e-3, 3e-3))
            if not warp.split_band_ok(h[None], (out, out), m=m, band=band):
                continue
            accepted += 1
            pal = np.asarray(warp.warp_batch_split(
                img, jnp.asarray(h[None]), (out, out), ext, m=m,
                band=band, interpret=True))
            mxu = np.asarray(warp.warp_batch_split(
                img, jnp.asarray(h[None]), (out, out), ext, m=m,
                band=band, stage_b='mxu'))
            np.testing.assert_allclose(
                pal, mxu, atol=1e-4,
                err_msg=f'gate-accepted hom diverged (trial {trial}): {h}')
        # the distribution must actually exercise the gate both ways
        assert 5 <= accepted <= 39


class TestLoaderWiring:
    def test_train_batch_through_split_impl(self, tmp_path, monkeypatch):
        from pose_tpu.data.synthetic import make_cmu_fixture
        from pose_tpu.data.loader import PoseLoader
        from datasets import build_info
        import types

        meta = make_cmu_fixture(str(tmp_path), num_train=4, num_valid=2)
        monkeypatch.setenv('POSE_TPU_WARP', 'split_mxu')
        args = types.SimpleNamespace(
            criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
            depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
            weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4, n_epochs=1,
            do_track=False, joint_space=False, shuffle=False, geometry=True,
            colour=True, eraser=False, occluder=False, occ_path=None,
            occ_count=0, batch_size=4, data_name='cmu', metadata_path=meta,
            random_zoom=0.9, n_cudas=1, workers=1)
        loader = PoseLoader(args, 'train', build_info('cmu'))
        assert loader.warp_impl == 'split_mxu'
        batch = next(iter(loader))
        img = np.asarray(batch['image'])
        assert img.shape == (4, 65, 65, 3)
        assert np.all(np.isfinite(img))
        assert img.std() > 0.1


class TestDepthChannel:
    def test_single_channel_split(self):
        """The v2 banded kernel is channel-generic: the 1-channel depth
        stream runs the same split path (loader.py depth _finalize)."""
        rng = np.random.RandomState(3)
        s, out, m = 96, 49, 48
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        d = (2.0 + np.sin(yy / 13.0) + np.cos(xx / 17.0))[..., None]
        imgs = jnp.asarray(np.stack([d, d[::-1].copy()]).astype(np.float32))
        homs = np.stack([crop_hom(s, out, 1.0, 0.03, 5, 8),
                         crop_hom(s, out, 0.95, -0.04, 10, 2)])
        ext = jnp.asarray(np.tile([s, s], (2, 1)).astype(np.int32))
        pal = np.asarray(warp.warp_batch_split(
            imgs, jnp.asarray(homs), (out, out), ext, m=m, band=32,
            interpret=True))
        mxu = np.asarray(warp.warp_batch_split(
            imgs, jnp.asarray(homs), (out, out), ext, m=m, band=32,
            stage_b='mxu'))
        np.testing.assert_allclose(pal, mxu, atol=1e-4)
        ref = np.asarray(warp.warp_batch(imgs, jnp.asarray(homs),
                                         (out, out), ext))
        assert np.abs(mxu - ref).mean() < 1e-2   # smooth depth surface
