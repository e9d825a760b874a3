"""Fused Pallas warp kernel vs the gather/MXU resamplers (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from pose_tpu.ops import warp
from pose_tpu.ops.warp_pallas import warp_batch_pallas


def _inputs(shear=0.0):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 96, 128, 3), dtype=np.uint8)
    homs = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    homs[:, 0, 0] = [1.5, 1.3]
    homs[:, 1, 1] = [1.4, 1.2]
    homs[:, 0, 2] = [4, -2]
    homs[:, 0, 1] = shear
    exts = np.tile([96, 128], (2, 1)).astype(np.int32)
    return imgs, homs, exts


def test_matches_exact_gather_axis_aligned():
    imgs, homs, exts = _inputs(shear=0.0)
    g = np.asarray(warp.warp_batch(jnp.asarray(imgs).astype(jnp.float32),
                                   jnp.asarray(homs), (65, 65),
                                   jnp.asarray(exts)))
    out = np.asarray(warp_batch_pallas(jnp.asarray(imgs), jnp.asarray(homs),
                                       jnp.asarray(exts), (65, 65),
                                       interpret=True))
    np.testing.assert_allclose(out, g, atol=1e-3)


def test_matches_mxu_two_pass_with_shear():
    imgs, homs, exts = _inputs(shear=0.05)
    m = np.asarray(warp.warp_batch_mxu(
        jnp.asarray(imgs).astype(jnp.float32), jnp.asarray(homs), (65, 65),
        jnp.asarray(exts)))
    out = np.asarray(warp_batch_pallas(jnp.asarray(imgs), jnp.asarray(homs),
                                       jnp.asarray(exts), (65, 65),
                                       interpret=True))
    # identical two-pass semantics; difference is only the MXU path's bf16
    # weights (~0.5% of the 0-255 range)
    assert np.abs(out - m).max() < 2.0


def test_extent_zero_border():
    rng = np.random.RandomState(1)
    imgs = np.zeros((1, 96, 128, 3), np.uint8)
    imgs[0, :60, :80] = rng.randint(1, 255, (60, 80, 3))
    homs = np.eye(3, dtype=np.float32)[None]
    exts = np.array([[60, 80]], np.int32)
    out = np.asarray(warp_batch_pallas(jnp.asarray(imgs), jnp.asarray(homs),
                                       jnp.asarray(exts), (96, 96),
                                       interpret=True))
    # rows >= 60 and cols >= 80 read beyond the extent -> zero
    assert np.abs(out[0, 61:, :]).max() == 0
    assert np.abs(out[0, :, 81:]).max() == 0
    assert out[0, :60, :80].max() > 0


def test_banded_matches_full_kernel():
    from pose_tpu.ops.warp_pallas import (band_ok_v2,
                                          warp_batch_pallas_banded)
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 255, (2, 192, 192, 3), dtype=np.uint8)
    homs = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    homs[:, 0, 0] = homs[:, 1, 1] = 192 / 129
    homs[:, 0, 1] = [0.04, -0.03]
    exts = np.tile([192, 192], (2, 1)).astype(np.int32)
    assert band_ok_v2(homs, (192, 192), (129, 129), band=32)

    full = np.asarray(warp_batch_pallas(jnp.asarray(imgs), jnp.asarray(homs),
                                        jnp.asarray(exts), (129, 129),
                                        interpret=True))
    band = np.asarray(warp_batch_pallas_banded(
        jnp.asarray(imgs), jnp.asarray(homs), jnp.asarray(exts), (129, 129),
        band=32, interpret=True))
    np.testing.assert_allclose(band, full, atol=1e-3)


def test_band_ok_rejects_rotation():
    from pose_tpu.ops.warp_pallas import band_ok_v2
    # a 45-degree-ish rotation exceeds any reasonable band
    c, s = np.cos(0.8), np.sin(0.8)
    hom = np.array([[c, -s, 50], [s, c, -30], [0, 0, 1]], np.float32)[None]
    assert not band_ok_v2(hom, (384, 384), (257, 257), band=32)


def test_band_ok_sees_far_edge_slope():
    """The in-tile slope margin is estimated at BOTH ends of the output
    sweep (under perspective dY/dv grows ~1/w^2 toward one edge, so a
    near-edge-only estimate under-covers far tiles — a passed gate with a
    violated band silently drops warp weight). Pin: a hom whose far-edge
    slope blows the band is rejected, while the same hom without the
    perspective row passes."""
    from pose_tpu.ops.warp_pallas import band_ok_v2
    out_h = 257
    # w(v) = 1 + h21*v shrinks to 0.5 at v=out_h-1: far-edge dY/dv ~ 4x
    # the near-edge estimate (1.13 vs 4.33, measured)
    h21 = -0.5 / (out_h - 1.0)
    hom = np.array([[1.0, 0, 60], [0, 1.0, 60], [0, h21, 1]],
                   np.float64)[None]
    assert not band_ok_v2(hom, (640, 640), (out_h, out_h), band=16)
    benign = np.array([[1.0, 0, 60], [0, 1.0, 60], [0, 0, 1]],
                      np.float64)[None]
    assert band_ok_v2(benign, (640, 640), (out_h, out_h), band=16)
