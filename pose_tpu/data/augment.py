"""Device-side batched preprocessing: warp + photometric + normalize, jitted.

This is the TPU-native replacement for the reference's per-sample CPU hot
loop (datasets.py:124-146): one compiled program takes the batch of padded
source canvases and per-sample homographies and produces normalized network
inputs. Randomness comes from a single per-step jax.random key split per
sample, so a training step is fully reproducible (SURVEY.md §7.2).

The colour branch mirrors the reference order (datasets.py:129-131):
warp -> random_color -> (x*255 trunc)/255 -> ToTensor -> ImageNet normalize.
The depth branch (depth_datasets.py:203-217) shares the same flip/zoom draw
through its own homography, then applies the ray-length correction and the
enhance_<dataset> transform in-kernel.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops import colour, occluder, warp


@functools.partial(jax.jit, static_argnames=('side_in', 'do_colour',
                                             'do_eraser', 'mxu_warp',
                                             'warp_impl'))
def process_color_batch(canvases, homographies, extents, key, side_in,
                        do_colour, do_eraser, mxu_warp=True, warp_impl=None):
    """(B, Hc, Wc, 3) uint8 canvases -> (B, side_in, side_in, 3) normalized
    float32 inputs.

    warp_impl: 'mxu' (default train path), 'gather' (strict cv2 parity, used
    at evaluation), 'pallas_banded' (fused VMEM kernel; callers must gate
    with warp_pallas.band_ok_v2), 'split' / 'split_mxu' (two-stage
    prescale+residual warp; callers must gate with warp.split_band_ok —
    'split_mxu' runs stage B on the matmul path for hosts without Pallas).
    The legacy mxu_warp bool maps to 'mxu'/'gather' when warp_impl is None."""
    if warp_impl is None:
        warp_impl = 'mxu' if mxu_warp else 'gather'
    if warp_impl in ('split', 'split_mxu'):
        # uint8 canvases go straight into the split warp's bf16 stage-A dot
        # (exact for integers <= 255); no f32 canvas copy is materialized.
        # The whole post-warp chain runs channel-planar — full (H, W) lane
        # tiles instead of a 3-wide minor dim — and transposes to NHWC once
        # at the end (identical op sequence, bit-identical values).
        crops = warp.warp_batch_split(
            canvases, homographies, (side_in, side_in), extents,
            stage_b='pallas' if warp_impl == 'split' else 'mxu',
            planar_out=True)
        crops = jnp.clip(crops, 0.0, 1.0)
        if do_colour:
            keys = jax.random.split(key, crops.shape[0])
            crops = colour.random_color_batch_planar(crops, keys)
        if do_eraser:
            crops = jnp.transpose(crops, (0, 2, 3, 1))
            ekeys = jax.random.split(jax.random.fold_in(key, 1),
                                     crops.shape[0])
            crops = jax.vmap(occluder.random_erase)(crops, ekeys)
            return colour.normalize_imagenet(crops)
        crops = colour.normalize_imagenet_planar(crops)
        return jnp.transpose(crops, (0, 2, 3, 1))
    images = canvases.astype(jnp.float32) / 255.0
    if warp_impl == 'pallas_banded':
        from ..ops.warp_pallas import warp_batch_pallas_banded
        crops = warp_batch_pallas_banded(images, homographies, extents,
                                         (side_in, side_in))
        crops = jnp.clip(crops, 0.0, 1.0)
    elif warp_impl == 'mxu':
        crops = warp.warp_batch_mxu(images, homographies,
                                    (side_in, side_in), extents)
        crops = jnp.clip(crops, 0.0, 1.0)
    else:
        crops = warp.warp_batch(images, homographies, (side_in, side_in),
                                extents)
    return _finish_color(crops, key, do_colour, do_eraser)


def _finish_color(crops, key, do_colour, do_eraser):
    """Post-warp photometric chain shared by every colour pipeline variant:
    random_color -> random_erase -> ImageNet normalize (datasets.py:129-131,
    61-63)."""
    if do_colour:
        keys = jax.random.split(key, crops.shape[0])
        crops = colour.random_color_batch(crops, keys)
    if do_eraser:
        ekeys = jax.random.split(jax.random.fold_in(key, 1), crops.shape[0])
        crops = jax.vmap(occluder.random_erase)(crops, ekeys)
    return colour.normalize_imagenet(crops)


def process_color_batch_general(canvases, partials, old_intrinsics,
                                dist_coeffs, extents, key, side_in,
                                do_colour, do_eraser, occ_bank=None):
    """Colour pipeline for batches whose *source* cameras may be distorted
    (the reference's general remap path, cameralib.py:408-433): each output
    pixel's lookup goes partial_homography -> forward distortion -> source
    intrinsics (ops.warp.warp_single_distorted). Undistorted samples mix into
    the same batch with partial=homography, intrinsics=I, coeffs=0 — with
    zero coefficients the general lookup degenerates to the plain homography
    warp exactly."""
    crops = _warp_general(canvases, partials, old_intrinsics, dist_coeffs,
                          extents, side_in)
    if occ_bank is not None:
        sprites, alphas, shapes = occ_bank
        crops = _paste_occluders(crops, jax.random.fold_in(key, 2), sprites,
                                 alphas, shapes)
    return _finish_color_jit(crops, key, do_colour, do_eraser)


@functools.partial(jax.jit, static_argnames=('side_in',))
def _warp_general(canvases, partials, old_intrinsics, dist_coeffs, extents,
                  side_in):
    images = canvases.astype(jnp.float32) / 255.0
    crops = jax.vmap(
        lambda im, ph, k, d, ex: warp.warp_single_distorted(
            im, ph, k, d, (side_in, side_in), ex))(
        images, partials, old_intrinsics, dist_coeffs, extents)
    return jnp.clip(crops, 0.0, 1.0)


@jax.jit
def _paste_occluders(crops, key, sprites, alphas, shapes):
    okeys = jax.random.split(key, crops.shape[0])
    return occluder.paste_batch_mxu(crops, okeys, sprites, alphas, shapes)


@functools.partial(jax.jit, static_argnames=('do_colour', 'do_eraser'))
def _finish_color_jit(crops, key, do_colour, do_eraser):
    return _finish_color(crops, key, do_colour, do_eraser)


@functools.partial(jax.jit, static_argnames=('side_in', 'do_colour',
                                             'do_eraser'))
def process_color_batch_occluded(canvases, homographies, extents, key,
                                 sprites, alphas, shapes, side_in, do_colour,
                                 do_eraser):
    """process_color_batch with occluder pasting (-occluder, BASELINE
    config 4) between the warp and the colour chain. Pasting rides the MXU
    (occluder.paste_batch_mxu): the gather composite costs ~325 ms/batch-64
    on v5e vs ~1 ms for the banded-matmul paste."""
    images = canvases.astype(jnp.float32) / 255.0
    crops = warp.warp_batch_mxu(images, homographies, (side_in, side_in),
                                extents)
    crops = jnp.clip(crops, 0.0, 1.0)
    okeys = jax.random.split(jax.random.fold_in(key, 2), crops.shape[0])
    crops = occluder.paste_batch_mxu(crops, okeys, sprites, alphas, shapes)
    return _finish_color(crops, key, do_colour, do_eraser)


def enhance_depth(image, nexponent, thresh):
    """enhance_ntu / enhance_pku (depth_datasets.py:39-56): scale by
    255/10 m, validity threshold (0.1 NTU / 0.5 PKU), then exp(-d)*veil or
    d/3."""
    image = image / (10.0 / 255.0)
    veil = (thresh <= image).astype(jnp.float32)
    if nexponent:
        return jnp.exp(-image) * veil
    return image / 3.0


def to_depth_correction(depth_crop, k_inv):
    """utils.to_depth (utils.py:68-75) applied to the warped crop with the
    original depth camera's intrinsics: divide by
    sqrt(|K⁻¹[u,v,1]|² + 1) per crop pixel."""
    h, w = depth_crop.shape[:2]
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = k_inv[0, 0] * u + k_inv[0, 1] * v + k_inv[0, 2]
    y = k_inv[1, 0] * u + k_inv[1, 1] * v + k_inv[1, 2]
    norm = jnp.sqrt(x * x + y * y + 1.0 + 1.0)
    return depth_crop / norm[..., None]


@functools.partial(jax.jit, static_argnames=('side_in', 'nexponent',
                                             'apply_to_depth', 'mxu_warp',
                                             'warp_impl'))
def process_depth_batch(canvases, homographies, extents, k_invs, thresh,
                        side_in, nexponent, apply_to_depth, mxu_warp=True,
                        warp_impl=None):
    """(B, Hc, Wc, 1) float32 raw-depth canvases -> (B, side_in, side_in, 1)
    enhanced depth inputs. `thresh` is the per-sample dataset validity
    threshold (0.1 ntu / 0.5 pku), enabling mixed-dataset batches.
    warp_impl as in process_color_batch (the v2 banded kernel is
    channel-generic, so 'split' serves the 1-channel depth stream too);
    the legacy mxu_warp bool maps to 'mxu'/'gather' when it is None."""
    if warp_impl is None:
        warp_impl = 'mxu' if mxu_warp else 'gather'
    # the matmul warps' bf16 TPU default is exact for uint8-valued COLOUR
    # sources only; raw-depth canvases are genuine floats, and bf16 would
    # quantize them to 8 significant bits (~0.2% of range — mm-scale on the
    # privileged depth input, where the reference's cv2 warp is f32-exact)
    f32 = jnp.float32
    if warp_impl in ('split', 'split_mxu'):
        crops = warp.warp_batch_split(
            canvases, homographies, (side_in, side_in), extents,
            stage_b='pallas' if warp_impl == 'split' else 'mxu', wdtype=f32)
    elif warp_impl == 'pallas_banded':
        from ..ops.warp_pallas import warp_batch_pallas_banded
        crops = warp_batch_pallas_banded(canvases, homographies, extents,
                                         (side_in, side_in))
    elif warp_impl == 'mxu':
        crops = warp.warp_batch_mxu(canvases, homographies,
                                    (side_in, side_in), extents, wdtype=f32)
    else:
        crops = warp.warp_batch(canvases, homographies, (side_in, side_in),
                                extents)
    if apply_to_depth:
        crops = jax.vmap(to_depth_correction)(crops, k_invs)
    return enhance_depth(crops, nexponent, thresh[:, None, None, None])


@functools.partial(jax.jit, static_argnames=('side_in',))
def bbox_mask_channel(quads, side_in):
    """Rasterize per-sample convex bbox quads (crop coords, (B, 4, 2)) into
    {0,1} masks — the -extra_channel input (opts.py:14, resnet.py:142; the
    reference snapshot never builds the dataset side of this channel, so it
    is reconstructed as the bbox-region mask the flag describes). Jitted:
    the loader calls it per batch outside any other program."""
    b = quads.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.float32, (side_in, side_in), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (side_in, side_in), 1)

    def one(quad):
        def edge(i):
            a = quad[i]
            bb = quad[(i + 1) % 4]
            return ((bb[0] - a[0]) * (yy - a[1])
                    - (bb[1] - a[1]) * (xx - a[0]))
        crosses = jnp.stack([edge(i) for i in range(4)])
        inside = (jnp.all(crosses >= 0, axis=0)
                  | jnp.all(crosses <= 0, axis=0))
        return inside.astype(jnp.float32)

    return jax.vmap(one)(quads)[..., None]                  # (B, S, S, 1)
