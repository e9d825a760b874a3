"""On-device ops vs host goldens: warp vs cv2.remap, colour vs the reference
chain, soft-argmax decode vs the torch formulas, partial conv vs the reference
renormalization."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_tpu.geometry import Camera, get_homography
from pose_tpu.ops import colour, heatmap, occluder, recon, warp
from pose_tpu.ops.partial_conv import partial_conv, renormalize_xla


def _random_image(rng, h=120, w=160, c=3):
    return rng.uniform(0, 1, (h, w, c)).astype(np.float32)


class TestWarp:
    def _golden_remap(self, image, hom, out_shape):
        y, x = np.mgrid[:out_shape[0], :out_shape[1]].astype(np.float32)
        coords = np.stack([x, y, np.ones_like(x)], axis=0).reshape(3, -1)
        coords = hom @ coords
        coords = coords[:2] / coords[2:]
        coords = coords.reshape(2, *out_shape).astype(np.float32)
        return cv2.remap(image, coords[0], coords[1], cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)

    def test_identity(self):
        rng = np.random.RandomState(0)
        img = _random_image(rng, 64, 64)
        out = warp.warp_single(jnp.asarray(img), jnp.eye(3), (64, 64))
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)

    def test_vs_cv2_remap_homography(self):
        rng = np.random.RandomState(1)
        img = _random_image(rng, 120, 160)
        # a realistic crop homography from the camera pipeline
        K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], np.float32)
        cam = Camera([0, 0, 0], np.eye(3), K, None)
        new_cam = cam.copy()
        new_cam.turn_towards(target_image_point=np.float32([100, 70]))
        new_cam.square_pixels()
        new_cam.zoom(0.8)
        new_cam.center_principal_point((65, 65))
        hom = get_homography(cam, new_cam).astype(np.float32)

        golden = self._golden_remap(img, hom, (65, 65))
        ours = np.asarray(warp.warp_single(jnp.asarray(img),
                                           jnp.asarray(hom), (65, 65)))
        # cv2 uses 5-bit fixed-point interpolation weights: tolerance 2/64
        assert np.abs(ours - golden).max() < 0.04
        assert np.abs(ours - golden).mean() < 0.004

    def test_out_of_bounds_is_zero(self):
        rng = np.random.RandomState(2)
        img = _random_image(rng, 32, 32)
        hom = np.eye(3, dtype=np.float32)
        hom[0, 2] = 1000  # shift far outside
        out = np.asarray(warp.warp_single(jnp.asarray(img),
                                          jnp.asarray(hom), (32, 32)))
        assert np.all(out == 0)

    def test_extent_masks_padding(self):
        rng = np.random.RandomState(3)
        img = np.zeros((64, 64, 3), np.float32)
        img[:40, :48] = _random_image(rng, 40, 48)
        out_full = np.asarray(warp.warp_single(
            jnp.asarray(img), jnp.eye(3), (64, 64),
            extent=jnp.asarray([40, 48])))
        golden = self._golden_remap(img[:40, :48].copy(), np.eye(3, dtype=np.float32),
                                    (64, 64))
        np.testing.assert_allclose(out_full, golden, atol=0.04)

    def test_batched(self):
        rng = np.random.RandomState(4)
        imgs = np.stack([_random_image(rng, 48, 48) for _ in range(4)])
        homs = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
        homs[:, 0, 0] = rng.uniform(0.5, 2.0, 4)
        out = np.asarray(warp.warp_batch(jnp.asarray(imgs), jnp.asarray(homs),
                                         (48, 48)))
        for i in range(4):
            golden = self._golden_remap(imgs[i], homs[i], (48, 48))
            assert np.abs(out[i] - golden).max() < 0.04


class TestColour:
    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(0)
        img = _random_image(rng, 16, 16)
        hsv = colour.rgb_to_hsv(jnp.asarray(img))
        back = np.asarray(colour.hsv_to_rgb(hsv))
        np.testing.assert_allclose(back, img, atol=1e-5)

    def test_hsv_matches_cv2(self):
        rng = np.random.RandomState(1)
        img = _random_image(rng, 16, 16)
        ours = np.asarray(colour.rgb_to_hsv(jnp.asarray(img)))
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_random_color_statistics(self):
        # the op must stay in [0,1] and not be the identity
        rng = np.random.RandomState(2)
        img = jnp.asarray(_random_image(rng, 32, 32))
        out = colour.random_color(img, jax.random.PRNGKey(0))
        out = np.asarray(out)
        assert out.min() >= 0 and out.max() <= 1
        assert np.abs(out - np.asarray(img)).max() > 1e-3

    def test_quantize_matches_uint8_truncation(self):
        rng = np.random.RandomState(3)
        img = _random_image(rng, 8, 8)
        ours = np.asarray(colour.quantize_like_uint8(jnp.asarray(img)))
        ref = (img * 255).astype(np.uint8).astype(np.float32) / 255.0
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_normalize(self):
        img = jnp.ones((4, 4, 3)) * 0.5
        out = np.asarray(colour.normalize_imagenet(img))
        ref = (0.5 - np.array(colour.IMAGENET_MEAN)) / np.array(colour.IMAGENET_DEV)
        np.testing.assert_allclose(out[0, 0], ref, atol=1e-6)


class TestHeatmap:
    def test_decode3d_against_torch_formula(self):
        torch = pytest.importorskip('torch')
        rng = np.random.RandomState(0)
        b, j, h, w, d = 2, 19, 17, 17, 16
        # NCHW feature like the reference: (B, D*J, H, W)
        feat_nchw = rng.randn(b, d * j, h, w).astype(np.float32)

        t = torch.from_numpy(feat_nchw)
        heat = t.view(-1, d, j, h, w).permute(0, 2, 3, 4, 1).contiguous()
        heat = heat.view(-1, j, h * w * d)
        heat = torch.softmax(heat, dim=2).view(-1, j, h, w, d)
        heat_y = heat.sum(dim=(3, 4))
        heat_x = heat.sum(dim=(2, 4))
        heat_z = heat.sum(dim=(2, 3))
        gy = torch.linspace(0, 2, h).view(1, 1, -1)
        gx = torch.linspace(0, 2, w).view(1, 1, -1)
        gz = torch.linspace(0, 2, d).view(1, 1, -1)
        golden = torch.stack(((gx * heat_x).sum(2), (gy * heat_y).sum(2),
                              (gz * heat_z).sum(2)), dim=2).numpy() * 1000.0

        # ours takes NHWC with channels factorized (depth, joints)
        feat_nhwc = feat_nchw.reshape(b, d, j, h, w).transpose(0, 3, 4, 1, 2)
        feat_nhwc = feat_nhwc.reshape(b, h, w, d * j)
        hm = heatmap.to_heatmap3d(jnp.asarray(feat_nhwc), d, j)
        ours = np.asarray(heatmap.decode3d(hm, 1000.0))
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-2)

    def test_decode2d_against_torch_formula(self):
        torch = pytest.importorskip('torch')
        rng = np.random.RandomState(1)
        b, j, h, w = 2, 19, 17, 17
        feat_nchw = rng.randn(b, j, h, w).astype(np.float32)

        t = torch.from_numpy(feat_nchw).view(b, j, h * w)
        heat = torch.softmax(t, dim=2).view(b, j, h, w)
        hx = heat.sum(dim=2)
        hy = heat.sum(dim=3)
        gx = torch.linspace(0, 1, w).view(1, 1, -1)
        gy = torch.linspace(0, 1, h).view(1, 1, -1)
        golden = torch.stack(((gx * hx).sum(-1), (gy * hy).sum(-1)),
                             dim=2).numpy() * 257

        feat_nhwc = feat_nchw.transpose(0, 2, 3, 1)
        hm = heatmap.to_heatmap2d(jnp.asarray(feat_nhwc), j)
        ours = np.asarray(heatmap.decode2d(hm, 257))
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-3)

    def test_attention_map(self):
        coords = np.float32([[128, 128], [30, 200]])
        ours = np.asarray(heatmap.get_attention(257, 16, jnp.asarray(coords), True))

        # reference numpy version (utils.py:14-42)
        side_out = (257 - 1) // 16 + 1
        cx, cy = np.meshgrid(np.arange(side_out), np.arange(side_out))
        cx = np.expand_dims(cx, -1)
        cy = np.expand_dims(cy, -1)
        dist_x = cx - coords[:, 0] / (257 / side_out)
        dist_y = cy - coords[:, 1] / (257 / side_out)
        radial = np.exp(-(dist_x ** 2 + dist_y ** 2) / 5.0).sum(axis=-1)
        golden = (radial / np.amax(radial))[None]
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)

        flat = np.asarray(heatmap.get_attention(257, 16, jnp.asarray(coords), False))
        assert flat.shape == (1, side_out, side_out) and np.all(flat == 1)

        # the host twin the production loader uses (loader.attention_map)
        # must track the device op — a formula tweak landing in only one
        # of the two would silently skew distillation
        from pose_tpu.data.loader import attention_map
        host = attention_map(257, 16, coords, True)
        np.testing.assert_allclose(ours, host, rtol=1e-4, atol=1e-5)


class TestRecon:
    def test_recovers_known_root(self):
        rng = np.random.RandomState(0)
        b, j = 3, 19
        K = np.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]], np.float32)
        intr = np.tile(K, (b, 1, 1))
        root = rng.uniform([-200, -200, 2500], [200, 200, 4000], (b, 3)).astype(np.float32)
        relat = rng.uniform(-400, 400, (b, j, 3)).astype(np.float32)
        relat -= relat.mean(axis=1, keepdims=True)
        absolute = relat + root[:, None]
        proj = absolute[..., :2] / absolute[..., 2:]
        pix = proj @ K[:2, :2].T + K[:2, 2]

        rec = np.asarray(recon.recon_root(jnp.asarray(pix), jnp.asarray(relat),
                                          jnp.asarray(intr)))
        np.testing.assert_allclose(rec, absolute, rtol=1e-3, atol=0.5)

    def test_differentiable(self):
        rng = np.random.RandomState(1)
        b, j = 2, 17
        K = np.tile(np.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]],
                             np.float32), (b, 1, 1))
        pix = rng.uniform(0, 257, (b, j, 2)).astype(np.float32)
        relat = rng.uniform(-400, 400, (b, j, 3)).astype(np.float32)

        def loss(r):
            return jnp.sum(recon.recon_root(jnp.asarray(pix), r,
                                            jnp.asarray(K)) ** 2)

        g = jax.grad(loss)(jnp.asarray(relat))
        assert np.all(np.isfinite(np.asarray(g)))


class TestPartialConv:
    def _torch_partial_conv(self, x, mask, w, stride, padding, dilation):
        # NHWC wrapper around the ONE torch reference replica of the
        # PartialConv semantics (shared with the full-step twin tests so
        # the two suites cannot silently assert diverging semantics)
        torch = pytest.importorskip('torch')
        from test_torch_twin_steps import t_partial_conv
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        mt = torch.from_numpy(np.broadcast_to(
            mask.transpose(0, 3, 1, 2), (x.shape[0], 1) + x.shape[1:3]).copy())
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        out, mask_out = t_partial_conv(xt, mt, wt, stride, padding, dilation)
        return (out.numpy().transpose(0, 2, 3, 1),
                mask_out.numpy().transpose(0, 2, 3, 1))

    @pytest.mark.parametrize('stride,padding,dilation,k', [
        (2, 3, 1, 7),   # the 7x7 stem (partial_depthnet.py:177)
        (1, 1, 1, 3),   # stage-1 3x3
        (2, 1, 1, 3),   # strided 3x3
        (1, 2, 2, 3),   # dilated 3x3 (stage-2 under stride-8 configs)
        (1, 0, 1, 1),   # 1x1 bottleneck convs
    ])
    def test_vs_reference(self, stride, padding, dilation, k):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 16, 16, 4).astype(np.float32)
        mask = (rng.rand(2, 16, 16, 1) > 0.4).astype(np.float32)
        w = rng.randn(k, k, 4, 8).astype(np.float32) * 0.1

        golden_out, golden_mask = self._torch_partial_conv(
            x, mask, w, stride, padding, dilation)
        out, mask_out = partial_conv(jnp.asarray(x), jnp.asarray(mask),
                                     jnp.asarray(w), stride, padding, dilation,
                                     use_pallas=False)
        # XLA:CPU (oneDNN) and torch accumulate convs in different orders;
        # the renorm multiplier (up to winsize at sparse-mask borders)
        # amplifies that float noise
        np.testing.assert_allclose(np.asarray(out), golden_out,
                                   rtol=1e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(mask_out), golden_mask,
                                   rtol=1e-5, atol=1e-6)

    def test_full_mask_equals_plain_conv(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 8, 8, 3).astype(np.float32)
        mask = np.ones((1, 8, 8, 1), np.float32)
        w = rng.randn(3, 3, 3, 5).astype(np.float32)
        out, mask_out = partial_conv(jnp.asarray(x), jnp.asarray(mask),
                                     jnp.asarray(w), 1, 1, use_pallas=False)
        plain = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC')))
        # interior pixels see a full window: output must equal a plain conv
        np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-1],
                                   np.asarray(plain)[:, 1:-1, 1:-1],
                                   rtol=1e-3, atol=1e-4)

    def test_gradient_flows_only_through_data(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
        mask = jnp.asarray((rng.rand(1, 8, 8, 1) > 0.3).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))

        def loss(w_):
            out, _ = partial_conv(x, mask, w_, 1, 1, use_pallas=False)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(w)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestOccluder:
    def test_random_erase_fills_rectangle(self):
        img = jnp.ones((64, 64, 3)) * 0.5
        out = np.asarray(occluder.random_erase(img, jax.random.PRNGKey(0)))
        changed = np.any(out != 0.5, axis=-1)
        frac = changed.mean()
        assert 0.05 < frac < 0.35  # 10-25% of area, rounding slack

    def test_random_occlu_blends(self):
        sprites = np.zeros((2, 64, 64, 3), np.float32)
        alphas = np.zeros((2, 64, 64), np.float32)
        sprites[:, :32, :32] = 1.0
        alphas[:, :32, :32] = 1.0
        shapes = np.array([[32, 32], [32, 32]], np.int32)
        img = jnp.zeros((64, 64, 3))
        out = np.asarray(occluder.random_occlu(
            img, jax.random.PRNGKey(1), jnp.asarray(sprites),
            jnp.asarray(alphas), jnp.asarray(shapes)))
        assert out.max() > 0.9  # sprite pasted somewhere
        assert out.min() == 0.0


class TestDistortedWarp:
    def test_vs_cv2_general_path(self):
        """The general reproject_image path for a distorted source camera
        (cameralib.py:408-434): rays through inv(K_new R_new), forward
        distortion polynomial, remap."""
        from pose_tpu.geometry import Camera

        rng = np.random.RandomState(5)
        img = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
        K = np.array([[220.0, 0, 80], [0, 225.0, 60], [0, 0, 1]], np.float32)
        dist = np.float32([-0.2, 0.12, 1e-3, -8e-4, -0.02])
        cam = Camera([0, 0, 0], np.eye(3), K, dist)

        new_cam = cam.copy()
        new_cam.turn_towards(target_image_point=np.float32([90, 70]))
        new_cam.undistort()
        new_cam.square_pixels()
        new_cam.zoom(0.7)
        new_cam.center_principal_point((65, 65))

        # golden: per-pixel coords via the undistorted-new-camera formula
        partial = (cam.R @ np.linalg.inv(new_cam.R)
                   @ np.linalg.inv(new_cam.intrinsic_matrix))
        y, x = np.mgrid[:65, :65].astype(np.float32)
        grid = np.stack([x, y, np.ones_like(x)], -1).reshape(-1, 3)
        old_cam_coords = grid @ partial.T
        oldim = cam.camera_to_image(old_cam_coords).reshape(65, 65, 2)
        golden = cv2.remap(img, oldim[..., 0], oldim[..., 1],
                           cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
                           borderValue=0)

        d5 = np.zeros(5, np.float32)
        d5[:len(cam.distortion_coeffs)] = cam.distortion_coeffs
        ours = np.asarray(warp.warp_single_distorted(
            jnp.asarray(img), jnp.asarray(partial.astype(np.float32)),
            jnp.asarray(cam.intrinsic_matrix),
            jnp.asarray(d5), (65, 65)))
        # cv2's fixed-point interpolation quantization bounds the diff
        assert np.abs(ours - golden).max() < 0.05
        assert np.abs(ours - golden).mean() < 0.005


class TestFusedBatchNorm:
    """The Pallas fused training-BN (ops/fused_bn.py) against jnp/autodiff
    reference math (the flax nn.BatchNorm semantics: biased batch variance,
    f32 statistics), for every call-site flavor in the trunk: plain,
    +relu, +residual, +residual+relu, f32 and bf16."""

    def _ref(self, x, gamma, beta, res, relu):
        c = x.shape[-1]
        xf = x.astype(jnp.float32).reshape(-1, c)
        mean = jnp.mean(xf, axis=0)
        var = jnp.mean(xf * xf, axis=0) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        y = (y * gamma + beta).reshape(x.shape)
        if res is not None:
            y = y + res.astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(x.dtype), mean, var

    @pytest.mark.parametrize('relu', [False, True])
    @pytest.mark.parametrize('has_res', [False, True])
    @pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
    def test_fwd_bwd_vs_autodiff(self, relu, has_res, dtype):
        from pose_tpu.ops.fused_bn import fused_batch_norm

        rng = np.random.RandomState(0)
        shape = (3, 9, 9, 128)
        c = shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
        res = (jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
               if has_res else None)
        gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(c).astype(np.float32))
        dy = jnp.asarray(rng.randn(*shape).astype(np.float32))

        y_r, m_r, v_r = self._ref(x, gamma, beta, res, relu)
        y_o, m_o, v_o = jax.jit(
            lambda *a: fused_batch_norm(*a, 1e-5, relu))(x, gamma, beta, res)
        atol = 3e-2 if dtype == jnp.bfloat16 else 3e-5
        np.testing.assert_allclose(np.float32(y_o), np.float32(y_r),
                                   atol=atol)
        np.testing.assert_allclose(m_o, m_r, atol=1e-4)
        np.testing.assert_allclose(v_o, v_r, atol=1e-4, rtol=1e-4)

        def loss_ref(t):
            y, _, _ = self._ref(t[0], t[1], t[2], t[3], relu)
            return jnp.sum(y.astype(jnp.float32) * dy)

        def loss_ours(t):
            y, _, _ = fused_batch_norm(t[0], t[1], t[2], t[3], 1e-5, relu)
            return jnp.sum(y.astype(jnp.float32) * dy)

        g_r = jax.grad(loss_ref)((x, gamma, beta, res))
        g_o = jax.jit(jax.grad(loss_ours))((x, gamma, beta, res))
        names = ('dx', 'dgamma', 'dbeta', 'dres')
        gatol = 4e-1 if dtype == jnp.bfloat16 else 2e-3
        for a, b, nm in zip(g_r, g_o, names):
            if a is None:
                continue
            np.testing.assert_allclose(
                np.float32(b), np.float32(a), atol=gatol, rtol=3e-2,
                err_msg=f'relu={relu} res={has_res} {nm}')

    def test_partial_last_block_masked(self):
        """M=3*5*5=75 rows is not sublane-divisible: the stats masking must
        keep padded rows out of mean/var."""
        from pose_tpu.ops.fused_bn import fused_batch_norm

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(3, 5, 5, 256).astype(np.float32))
        gamma = jnp.ones((256,), jnp.float32)
        beta = jnp.zeros((256,), jnp.float32)
        _, mean, var = jax.jit(
            lambda *a: fused_batch_norm(*a, 1e-5, False))(x, gamma, beta,
                                                          None)
        flat = np.asarray(x).reshape(-1, 256)
        np.testing.assert_allclose(mean, flat.mean(0), atol=1e-5)
        np.testing.assert_allclose(var, flat.var(0), atol=1e-5, rtol=1e-5)


class TestOccluderMXUPaste:
    def test_matches_gather_paste(self):
        """random_occlu_mxu draws identically to random_occlu and its
        two-pass resampling stays within the documented sub-pixel envelope
        of the 2D-bilinear gather composite."""
        rng = np.random.RandomState(5)
        sprites = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
        alphas = jnp.asarray((rng.rand(4, 64, 64) > 0.4).astype(np.float32))
        shapes = jnp.asarray(
            np.array([[50, 40], [64, 64], [30, 60], [44, 20]], np.int32))
        image = jnp.asarray(rng.rand(65, 65, 3).astype(np.float32))
        for i in range(4):
            key = jax.random.PRNGKey(i)
            ref = occluder.random_occlu(image, key, sprites, alphas, shapes)
            got = occluder.random_occlu_mxu(image, key, sprites, alphas,
                                            shapes)
            diff = np.abs(np.asarray(ref) - np.asarray(got))
            assert diff.max() < 0.22, (i, diff.max())   # hard alpha edges
            assert diff.mean() < 0.004, (i, diff.mean())

    def test_paste_batch_chunking(self):
        rng = np.random.RandomState(6)
        sprites = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        alphas = jnp.asarray(np.ones((2, 32, 32), np.float32))
        shapes = jnp.asarray(np.array([[32, 32], [20, 24]], np.int32))
        images = jnp.asarray(rng.rand(16, 33, 33, 3).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        whole = jax.vmap(lambda im, k: occluder.random_occlu_mxu(
            im, k, sprites, alphas, shapes))(images, keys)
        chunked = occluder.paste_batch_mxu(images, keys, sprites, alphas,
                                           shapes, chunk=4)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                                   atol=1e-5)


def test_partial_renorm_production_shape_tiling():
    """Regression: rows=129*129=16641 (stride-16 stem at side_in 257) is not
    512-divisible; the old whole-array fallback block was 16.08 MiB and
    VMEM-OOMed at compile time on TPU. The tiled kernel with a partial last
    block must match the XLA renormalization exactly, fwd and bwd."""
    from pose_tpu.ops.partial_conv import _renorm_pallas, renormalize_xla

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(1, 129, 129, 64).astype(np.float32))
    mask_raw = jnp.asarray((rng.rand(1, 129, 129, 1) * 9).astype(np.float32))
    mask_bc = jnp.broadcast_to(mask_raw, raw.shape)
    out_p, mout_p = _renorm_pallas(raw, mask_bc, 49.0, True)
    out_x, mout_x = renormalize_xla(raw, mask_raw, 49.0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mout_p[..., :1]),
                               np.asarray(mout_x), atol=1e-7)
    g = jnp.asarray(rng.randn(1, 129, 129, 64).astype(np.float32))
    f = lambda r: jnp.sum(_renorm_pallas(r, mask_bc, 49.0, True)[0] * g)
    fx = lambda r: jnp.sum(renormalize_xla(r, mask_raw, 49.0)[0] * g)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(raw)),
                               np.asarray(jax.grad(fx)(raw)),
                               rtol=1e-6, atol=1e-6)


class TestBatchNormTorchTwin:
    """ops/batchnorm.ReferenceBatchNorm and the FusedBatchNorm module's
    running-stat update directly against torch.nn.BatchNorm2d (reference
    resnet.py:141-148 uses BatchNorm2d): multi-step train-mode running
    mean/var bookkeeping — torch folds the UNBIASED batch variance into
    running_var (momentum 0.1 torch convention == momentum 0.9 here) —
    then the eval-mode outputs those stats produce. The twin-step tests
    cover this end-to-end through the trunk; this pins the op in
    isolation."""

    C = 8
    STEPS = 4

    def _torch_bn(self, scale, bias):
        import torch
        import torch.nn as tnn
        bn = tnn.BatchNorm2d(self.C, eps=1e-5, momentum=0.1)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(scale))
            bn.bias.copy_(torch.from_numpy(bias))
        return bn

    def _drive(self, module_ctor, call):
        import torch
        rng = np.random.RandomState(7)
        scale = (rng.rand(self.C) + 0.5).astype(np.float32)
        bias = rng.randn(self.C).astype(np.float32)
        xs = [rng.randn(4, 5, 6, self.C).astype(np.float32) * 3 + 1
              for _ in range(self.STEPS)]

        bn_t = self._torch_bn(scale, bias)
        bn_t.train()
        ys_t = []
        for x in xs:
            xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            ys_t.append(np.transpose(bn_t(xt).detach().numpy(),
                                     (0, 2, 3, 1)))

        mod = module_ctor(use_running_average=False)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
        params = {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)}
        stats = variables['batch_stats']
        ys_j = []
        for x in xs:
            y, mut = call(mod, params, stats, jnp.asarray(x))
            stats = mut['batch_stats']
            ys_j.append(np.asarray(y))

        for yt, yj in zip(ys_t, ys_j):
            np.testing.assert_allclose(yj, yt, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(stats['mean']),
                                   bn_t.running_mean.numpy(),
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(stats['var']),
                                   bn_t.running_var.numpy(),
                                   atol=1e-6, rtol=1e-5)

        # eval-mode outputs from the accumulated statistics
        bn_t.eval()
        xe = xs[0]
        xt = torch.from_numpy(np.transpose(xe, (0, 3, 1, 2)))
        ye_t = np.transpose(bn_t(xt).detach().numpy(), (0, 2, 3, 1))
        mod_e = module_ctor(use_running_average=True)
        ye_j = mod_e.apply({'params': params, 'batch_stats': stats},
                           jnp.asarray(xe))
        np.testing.assert_allclose(np.asarray(ye_j), ye_t,
                                   atol=2e-5, rtol=1e-5)

    def test_reference_batchnorm(self):
        from pose_tpu.ops.batchnorm import ReferenceBatchNorm

        def call(mod, params, stats, x):
            return mod.apply({'params': params, 'batch_stats': stats}, x,
                             mutable=['batch_stats'])

        self._drive(ReferenceBatchNorm, call)

    def test_fused_batchnorm_module(self):
        from pose_tpu.ops.fused_bn import FusedBatchNorm

        def call(mod, params, stats, x):
            return mod.apply({'params': params, 'batch_stats': stats}, x,
                             mutable=['batch_stats'])

        self._drive(FusedBatchNorm, call)

    def test_single_element_channel_stays_finite(self):
        """n = 1 element per channel: torch raises in training; ours skips
        the (undefined) unbiased correction and must stay finite."""
        from pose_tpu.ops.batchnorm import ReferenceBatchNorm

        mod = ReferenceBatchNorm(use_running_average=False)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 1, 1, 4).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), x)
        y, mut = mod.apply(variables, x, mutable=['batch_stats'])
        assert np.isfinite(np.asarray(y)).all()
        assert np.isfinite(np.asarray(mut['batch_stats']['var'])).all()
