"""Two-pass MXU warp vs the gather resampler."""

import numpy as np

import jax.numpy as jnp

from pose_tpu.geometry import Camera, get_homography
from pose_tpu.ops import warp


def test_axis_aligned_matches_gather():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    hom = np.array([[1.7, 0, 5], [0, 1.4, -3], [0, 0, 1]], np.float32)
    g = np.asarray(warp.warp_single(jnp.asarray(img), jnp.asarray(hom),
                                    (64, 64)))
    m = np.asarray(warp.warp_batch_mxu(jnp.asarray(img[None]),
                                       jnp.asarray(hom[None]), (64, 64)))[0]
    # bf16 weight quantization only (cv2's own fixed point is 1/32)
    assert np.abs(g - m).max() < 0.01


def test_crop_homography_close_to_gather():
    rng = np.random.RandomState(1)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(
        rng.uniform(0, 1, (96, 128, 3)).astype(np.float32), (2, 2, 0))
    K = np.array([[300., 0, 64], [0, 300., 48], [0, 0, 1]], np.float32)
    cam = Camera([0, 0, 0], np.eye(3), K, None)
    nc = cam.copy()
    nc.turn_towards(target_image_point=np.float32([80, 60]))
    nc.square_pixels()
    nc.zoom(0.8)
    nc.center_principal_point((65, 65))
    hom = get_homography(cam, nc).astype(np.float32)

    g = np.asarray(warp.warp_single(jnp.asarray(img), jnp.asarray(hom),
                                    (65, 65)))
    m = np.asarray(warp.warp_batch_mxu(jnp.asarray(img[None]),
                                       jnp.asarray(hom[None]), (65, 65)))[0]
    # two-pass sampling-locus difference: small on natural images in the
    # mean, and never grossly wrong anywhere (a band/offset bug corrupting
    # a localized patch would pass a mean-only bound)
    d = np.abs(g - m)
    assert d.mean() < 0.01
    assert d.max() < 0.5


def test_extent_masking():
    rng = np.random.RandomState(2)
    img = np.zeros((96, 128, 3), np.float32)
    img[:60, :80] = rng.uniform(0, 1, (60, 80, 3))
    hom = np.array([[1.7, 0, 5], [0, 1.4, -3], [0, 0, 1]], np.float32)
    ext = jnp.asarray([[60, 80]])
    g = np.asarray(warp.warp_single(jnp.asarray(img), jnp.asarray(hom),
                                    (64, 64), extent=jnp.asarray([60, 80])))
    m = np.asarray(warp.warp_batch_mxu(jnp.asarray(img[None]),
                                       jnp.asarray(hom[None]), (64, 64),
                                       ext))[0]
    assert np.abs(g - m).max() < 0.01


def test_chunked_batch():
    rng = np.random.RandomState(3)
    imgs = rng.uniform(0, 1, (16, 64, 64, 3)).astype(np.float32)
    homs = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1))
    homs[:, 0, 0] = rng.uniform(0.8, 1.5, 16)
    homs[:, 1, 1] = rng.uniform(0.8, 1.5, 16)
    out = np.asarray(warp.warp_batch_mxu(jnp.asarray(imgs),
                                         jnp.asarray(homs), (48, 48),
                                         chunk=8))
    assert out.shape == (16, 48, 48, 3)
    # every chunk result matches the unchunked single-sample path
    for i in (0, 7, 8, 15):
        single = np.asarray(warp.warp_batch_mxu(
            jnp.asarray(imgs[i:i + 1]), jnp.asarray(homs[i:i + 1]),
            (48, 48)))[0]
        np.testing.assert_allclose(out[i], single, atol=1e-3)


def test_ragged_batch_stays_chunked():
    """A batch that doesn't divide by `chunk` must still produce per-sample
    results (padded to a chunk multiple internally, NOT processed as one
    giant unchunked pass — that materializes every per-sample weight tensor
    at once and OOMs HBM on real canvas sizes)."""
    rng = np.random.RandomState(5)
    imgs = rng.uniform(0, 1, (10, 48, 48, 3)).astype(np.float32)
    homs = np.tile(np.eye(3, dtype=np.float32), (10, 1, 1))
    homs[:, 0, 0] = rng.uniform(0.8, 1.5, 10)
    homs[:, 1, 2] = rng.uniform(-4, 4, 10)
    out = np.asarray(warp.warp_batch_mxu(jnp.asarray(imgs),
                                         jnp.asarray(homs), (32, 32),
                                         chunk=4))
    assert out.shape == (10, 32, 32, 3)
    for i in (0, 3, 4, 9):
        single = np.asarray(warp.warp_batch_mxu(
            jnp.asarray(imgs[i:i + 1]), jnp.asarray(homs[i:i + 1]),
            (32, 32)))[0]
        np.testing.assert_allclose(out[i], single, atol=1e-3)


def test_degenerate_homography_zero():
    """w == 0 lookups map to the border constant: the output must be the
    all-zero border fill (cv2.remap semantics), not merely finite."""
    out = np.asarray(warp.warp_batch_mxu(jnp.ones((1, 32, 32, 3)),
                                         jnp.zeros((1, 3, 3)), (16, 16)))
    assert np.all(out == 0)
    gather = np.asarray(warp.warp_batch(jnp.ones((1, 32, 32, 3)),
                                        jnp.zeros((1, 3, 3)), (16, 16)))
    assert np.all(gather == 0)
