"""On-device occluder pasting and random-erase augmentation.

Re-implements augment_occluder.py TPU-natively. The reference resizes each
occluder sprite with cv2 and pastes it by array slicing (augment_occluder.py
:68-81, :7-55) — both dynamic-shape host ops. Here pasting is reformulated as
an *inverse-mapped gather*: every image pixel computes its coordinate inside
the (scaled) occluder and bilinear-samples sprite colour + alpha; pixels that
land outside get alpha 0. That keeps all shapes static, so the whole composite
jits and vmaps.

The occluder bank (occluder_<i>.npy / mask_<i>.npy under -occ_path,
augment_occluder.py:58-65) is padded onto a fixed canvas once at load time.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def load_occluder_bank(occ_path, occ_count, canvas=256):
    """Host-side: load `occ_count` sprites, pad to (canvas, canvas), return
    (sprites (N,c,c,3) float32 [0,1], alphas (N,c,c), shapes (N,2) int32)."""
    sprites = np.zeros((occ_count, canvas, canvas, 3), np.float32)
    alphas = np.zeros((occ_count, canvas, canvas), np.float32)
    shapes = np.zeros((occ_count, 2), np.int32)
    for i in range(occ_count):
        occ = np.load(os.path.join(occ_path, f'occluder_{i}.npy'))
        mask = np.load(os.path.join(occ_path, f'mask_{i}.npy'))
        if occ.dtype == np.uint8:
            occ = occ.astype(np.float32) / 255.0
        mask = mask.astype(np.float32)
        h, w = occ.shape[:2]
        if h > canvas or w > canvas:
            # keep the WHOLE sprite: downscale to fit the fixed canvas
            # (the reference resizes full sprites at paste time,
            # augment_occluder.py:76-80 — clipping would paste fragments)
            s_fit = min(canvas / h, canvas / w)
            nh = max(1, int(np.floor(h * s_fit)))
            nw = max(1, int(np.floor(w * s_fit)))
            ys = (np.arange(nh) * h / nh).astype(np.int64)
            xs = (np.arange(nw) * w / nw).astype(np.int64)
            occ = occ[ys][:, xs]
            mask = mask[ys][:, xs]
            h, w = nh, nw
        sprites[i, :h, :w] = occ[:h, :w, :3]
        alphas[i, :h, :w] = mask[:h, :w]
        shapes[i] = (h, w)
    return sprites, alphas, shapes


def _sample_sprite(sprite, alpha, shape, coords):
    """Bilinear-sample sprite colour and alpha at float (x, y) coords; alpha is
    zero outside the sprite's true extent."""
    c = sprite.shape[0]
    x, y = coords[..., 0], coords[..., 1]
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0

    eh = shape[0].astype(jnp.float32)
    ew = shape[1].astype(jnp.float32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi <= ew - 1) & (yi >= 0) & (yi <= eh - 1)
        xi_c = jnp.clip(xi, 0, c - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, c - 1).astype(jnp.int32)
        flat = yi_c * c + xi_c
        rgb = jnp.take(sprite.reshape(c * c, 3), flat.reshape(-1), axis=0)
        rgb = rgb.reshape(flat.shape + (3,))
        a = jnp.take(alpha.reshape(c * c), flat.reshape(-1)).reshape(flat.shape)
        m = valid.astype(jnp.float32)
        return rgb * m[..., None], a * m

    c00, a00 = tap(y0, x0)
    c01, a01 = tap(y0, x0 + 1)
    c10, a10 = tap(y0 + 1, x0)
    c11, a11 = tap(y0 + 1, x0 + 1)

    fxe = fx[..., None]
    rgb = ((c00 * (1 - fxe) + c01 * fxe) * (1 - fy[..., None])
           + (c10 * (1 - fxe) + c11 * fxe) * fy[..., None])
    a = ((a00 * (1 - fx) + a01 * fx) * (1 - fy)
         + (a10 * (1 - fx) + a11 * fx) * fy)
    return rgb, a


def random_occlu(image, key, sprites, alphas, shapes):
    """One sample of augment_occluder.random_occlu (:68-81): pick a sprite,
    scale by U(0.4, 0.8), paste centered at a uniform-random point.

    image: (H, W, 3) float [0,1].
    """
    k_idx, k_scale, k_center = jax.random.split(key, 3)
    n = sprites.shape[0]
    idx = jax.random.randint(k_idx, (), 0, n)
    sprite = sprites[idx]
    alpha = alphas[idx]
    shape = shapes[idx].astype(jnp.float32)

    scale = jax.random.uniform(k_scale, (), minval=0.4, maxval=0.8)
    dest_shape = jnp.round(scale * shape)                     # (h, w) scaled
    h, w = image.shape[:2]
    center = (jnp.asarray([h, w], jnp.float32)
              * jax.random.uniform(k_center, (2,)))
    center = jnp.round(center)

    # inverse map: image pixel -> sprite pixel
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    start = center - dest_shape / 2                            # (y, x) of paste origin
    # sprite coordinate: center-aligned inverse map, matching
    # cv2.resize's (x + 0.5) * ratio - 0.5 convention
    # (augment_occluder.py:79-81); remaining documented divergence is
    # bilinear sampling where cv2 INTER_AREA box-filters
    ratio = shape / jnp.maximum(dest_shape, 1.0)
    sx = (xx - start[1] + 0.5) * ratio[1] - 0.5
    sy = (yy - start[0] + 0.5) * ratio[0] - 0.5
    coords = jnp.stack([sx, sy], axis=-1)

    rgb, a = _sample_sprite(sprite, alpha, shapes[idx], coords)
    a = a[..., None]
    return image * (1 - a) + rgb * a


def random_occlu_mxu(image, key, sprites, alphas, shapes):
    """random_occlu with the resampling on the MXU: the paste is an affine
    image->sprite map, so the RGBA sprite is warped onto the image grid with
    the same two-pass banded-matmul machinery as the crop warp
    (ops.warp._warp_single_mxu) and composited elementwise. Identical random
    draws (same key splits) as random_occlu; the resampler differs by the
    two-pass property only (~0.002 mean intensity). The gather path costs
    ~325 ms/batch-64 on v5e (scalarized loads); this path rides the MXU.
    """
    from .warp import _warp_single_mxu

    k_idx, k_scale, k_center = jax.random.split(key, 3)
    n = sprites.shape[0]
    idx = jax.random.randint(k_idx, (), 0, n)
    sprite = sprites[idx]
    alpha = alphas[idx]
    shape = shapes[idx].astype(jnp.float32)

    scale = jax.random.uniform(k_scale, (), minval=0.4, maxval=0.8)
    dest_shape = jnp.round(scale * shape)
    h, w = image.shape[:2]
    center = (jnp.asarray([h, w], jnp.float32)
              * jax.random.uniform(k_center, (2,)))
    center = jnp.round(center)
    start = center - dest_shape / 2
    ratio = shape / jnp.maximum(dest_shape, 1.0)

    # image (u, v) -> sprite (sx, sy) affine, in the warp kernel's dst->src
    # homography convention
    zero = jnp.zeros(())
    one = jnp.ones(())
    hom = jnp.stack([
        jnp.stack([ratio[1], zero,
                   (0.5 - start[1]) * ratio[1] - 0.5]),
        jnp.stack([zero, ratio[0],
                   (0.5 - start[0]) * ratio[0] - 0.5]),
        jnp.stack([zero, zero, one])])   # center-aligned, as random_occlu

    rgba = jnp.concatenate([sprite, alpha[..., None]], axis=-1)
    # bf16 weights ride the MXU on TPU; XLA:CPU cannot execute an unfused
    # bf16 dot (same backend split as warp.warp_batch_mxu)
    wdtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
              else jnp.float32)
    warped = _warp_single_mxu(rgba, hom, (h, w), shapes[idx], wdtype)
    a = jnp.clip(warped[..., 3:], 0.0, 1.0)
    return image * (1 - a) + warped[..., :3] * a


def paste_batch_mxu(images, keys, sprites, alphas, shapes, chunk=8):
    """Batched random_occlu_mxu, chunked like warp.warp_batch_mxu to bound
    the transient HBM footprint of the per-sample weight matrices."""
    b = images.shape[0]

    def one_chunk(args):
        imgs, ks = args
        return jax.vmap(lambda im, k: random_occlu_mxu(
            im, k, sprites, alphas, shapes))(imgs, ks)

    if b % chunk != 0 or b == chunk:
        return one_chunk((images, keys))
    imgs = images.reshape((b // chunk, chunk) + images.shape[1:])
    ks = keys.reshape((b // chunk, chunk) + keys.shape[1:])
    out = jax.lax.map(one_chunk, (imgs, ks))
    return out.reshape((b,) + out.shape[2:])


def random_erase(image, key):
    """augment_occluder.random_erase (:84-105): fill a random rectangle
    (10-25% of area, aspect 0.4-2.5) with a random uint8 colour."""
    k_col, k_area, k_aspect, k_pos = jax.random.split(key, 4)
    h, w = image.shape[:2]
    rand_color = jax.random.randint(k_col, (3,), 0, 256).astype(jnp.float32) / 255.0

    image_area = jnp.float32(h * w)
    erase_area = jax.random.uniform(k_area, (), minval=0.1, maxval=0.25) * image_area
    aspect = jax.random.uniform(k_aspect, (), minval=0.4, maxval=2.5)
    erase_h = jnp.sqrt(erase_area * aspect)
    erase_w = jnp.sqrt(erase_area / aspect)
    erase_shape = jnp.stack([erase_h, erase_w])

    start = ((jnp.asarray([h, w], jnp.float32) - erase_shape)
             * jax.random.uniform(k_pos, (2,)))
    # round start and end independently from the UNROUNDED start, as the
    # reference does (augment_occluder.py:99-104) — rounding the start
    # first drifts the rectangle size by up to 1 px
    end = jnp.round(start + erase_shape)
    start = jnp.round(start)

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    inside = ((yy >= start[0]) & (yy < end[0])
              & (xx >= start[1]) & (xx < end[1]))
    return jnp.where(inside[..., None], rand_color, image)
