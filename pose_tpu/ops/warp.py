"""On-device perspective crop-warp.

Replaces the reference's per-sample host warps — `cv2.remap`/`cv2.warpAffine`
inside DataLoader workers (cameralib.py:404, :433, :696-707) — with a batched,
jit-compiled XLA resampler that runs on TPU. The host only computes one 3x3
homography per sample (pose_tpu.geometry.camera.get_homography); the pixel
work happens here.

Semantics match `cv2.remap(..., INTER_LINEAR, BORDER_CONSTANT, borderValue=0)`
up to cv2's 5-bit fixed-point weight quantization: bilinear interpolation with
zero contribution from out-of-bounds taps. The antialias pre-downscale path of
`reproject_image_fast` (cameralib.py:676-689) is provided via
`antialias_factor` + `area_downscale`.

Images are NHWC (TPU-native layout). Variable-size source images are handled
by zero-padding onto a fixed canvas and passing the true (h, w) extents;
because the border value is 0, samples straddling the true edge blend with
zeros exactly as cv2's BORDER_CONSTANT would.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def homography_source_coords(homography, out_shape):
    """Source-pixel lookup coordinates for each output pixel.

    homography: (3, 3) mapping homogeneous *output* pixel coords to *source*
    pixel coords — the `old_matrix @ inv(new_matrix)` composition of
    cameralib.py:672-674.

    Returns (out_h, out_w, 2) float32 (x, y) source coordinates.
    """
    out_h, out_w = out_shape
    y = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    # explicit FMAs rather than a matmul: jnp.dot at default precision costs
    # ~0.2 px here (bf16 passes on the MXU); elementwise ops run exact fp32
    # on the VPU and fuse into the gather kernel anyway
    h = homography
    xs = h[0, 0] * x + h[0, 1] * y + h[0, 2]
    ys = h[1, 0] * x + h[1, 1] * y + h[1, 2]
    ws = h[2, 0] * x + h[2, 1] * y + h[2, 2]
    return jnp.stack([xs / ws, ys / ws], axis=-1)


def bilinear_sample(image, coords, extent=None):
    """Bilinear resample `image` (H, W, C) at float (x, y) `coords`
    (..., 2) with zero border.

    extent: optional (h, w) true valid extent when `image` is a padded canvas;
    taps at or beyond the extent contribute zero, which reproduces cv2's
    BORDER_CONSTANT(0) exactly for a zero-padded canvas.
    """
    h, w = image.shape[:2]
    if extent is None:
        eh = jnp.asarray(h, jnp.float32)
        ew = jnp.asarray(w, jnp.float32)
    else:
        eh = extent[0].astype(jnp.float32)
        ew = extent[1].astype(jnp.float32)

    x = coords[..., 0]
    y = coords[..., 1]
    # non-finite lookup coords (degenerate homography, w≈0 horizon line) must
    # resolve to the border value like cv2.remap, not propagate NaN
    x = jnp.where(jnp.isfinite(x), x, -1e9)
    y = jnp.where(jnp.isfinite(y), y, -1e9)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi <= ew - 1) & (yi >= 0) & (yi <= eh - 1))
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = yi_c * w + xi_c
        vals = jnp.take(image.reshape(h * w, -1), flat.reshape(-1), axis=0)
        vals = vals.reshape(flat.shape + (image.shape[-1],))
        return vals * valid[..., None].astype(image.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_single(image, homography, out_shape, extent=None):
    """Warp one (H, W, C) image through `homography` to `out_shape`."""
    coords = homography_source_coords(homography, out_shape)
    return bilinear_sample(image, coords, extent)


@functools.partial(jax.jit, static_argnames=('out_shape',))
def warp_batch(images, homographies, out_shape, extents=None):
    """Batched perspective warp: (B, H, W, C) x (B, 3, 3) -> (B, oh, ow, C).

    extents: optional (B, 2) int array of per-sample true (h, w) extents for
    zero-padded canvases.
    """
    if extents is None:
        return jax.vmap(lambda im, hg: warp_single(im, hg, out_shape))(
            images, homographies)
    return jax.vmap(lambda im, hg, ex: warp_single(im, hg, out_shape, ex))(
        images, homographies, extents)


def _tri(d):
    """Bilinear hat kernel: the two integer taps around a float coordinate
    get weights (1-f, f); out-of-support taps get 0."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _warp_single_mxu(image, homography, out_shape, extent, weight_dtype):
    """Exact perspective warp as a two-pass banded-matrix contraction
    (Catmull-Smith x/y decomposition) — gathers on TPU serialize into scalar
    loads, so instead both bilinear resamplings are expressed as dense
    matmuls whose interpolation-weight matrices are built with iota
    arithmetic (no gathers anywhere). The weight matrices have exactly two
    nonzeros per row, so the dense contraction does S MACs where 2 suffice —
    but those MACs ride the MXU at full rate, which is ~50x faster than the
    gather path end-to-end.

    Pass 1 (vertical): I[v, x_s] = Src[Y(v, x_s), x_s], where Y solves the
    homography for the source row landing on output row v at source column
    x_s. Pass 2 (horizontal): Out[v, u] = I[v, X(u, v)]. The sampling locus
    is exact; the reconstruction differs from single-pass 2D bilinear by the
    classic two-pass property (the column interpolation is taken at the
    integer source columns rather than the fractional one), a sub-pixel
    effect bounded by the transform's shear |dY/dx| — ~0.002 mean intensity
    difference on natural images for this pipeline's near-upright crop
    cameras (datasets.py:78-116). Training uses this path; strict-parity
    evaluation keeps the gather path.

    Border semantics match cv2 BORDER_CONSTANT(0): coordinates outside the
    (extent-limited) source contribute zero weight.
    """
    out_h, out_w = out_shape
    src_h, src_w = image.shape[:2]
    h = homography

    if extent is None:
        eh = jnp.float32(src_h)
        ew = jnp.float32(src_w)
    else:
        eh = extent[0].astype(jnp.float32)
        ew = extent[1].astype(jnp.float32)

    v = jax.lax.broadcasted_iota(jnp.float32, (out_h, src_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, src_w), 1)

    # recover the output column u that lands on source column xs at output
    # row v, then the source row Y there
    denom_u = h[0, 0] - h[2, 0] * xs
    u_of = (xs * (h[2, 1] * v + h[2, 2]) - h[0, 1] * v - h[0, 2]) / denom_u
    w_h = h[2, 0] * u_of + h[2, 1] * v + h[2, 2]
    Y = (h[1, 0] * u_of + h[1, 1] * v + h[1, 2]) / w_h
    Y = jnp.where(jnp.isfinite(Y), Y, -1e9)
    # materialize the (out_h, src_w) inverse row map: without the barrier XLA
    # fuses this division chain into the W1 producer and re-evaluates it per
    # (v, sy, xs) element of the weight tensor inside the dot — ~4 divides
    # per MAC, which made weight generation the VPU bottleneck of the warp
    Y = jax.lax.optimization_barrier(Y)

    sy = jax.lax.broadcasted_iota(jnp.float32, (src_h, 1), 0)
    # W1[v, sy, xs]
    # per-tap validity only (no whole-coordinate mask): taps beyond the
    # extent get zero weight while the in-range tap keeps its hat weight,
    # reproducing BORDER_CONSTANT's partial blending at edges
    W1 = _tri(Y[:, None, :] - sy[None, :, :])
    W1 = W1 * (sy[None, :, :] <= eh - 1)
    W1 = W1.astype(weight_dtype)

    prec = _dot_precision(weight_dtype)
    src = image.astype(weight_dtype)
    # I[xs, c, v] = sum_sy src[sy, xs, c] * W1[v, sy, xs]
    # operand order puts the tiny channel count (c=1..4) on the LHS free
    # (sublane) axis and W1's out_h on the lane axis, and lets pass 2 consume
    # the (xs, c, v) intermediate with no transpose between the passes.
    # (XLA assigns dot layouts itself, so this is mostly about avoiding the
    # explicit transposes, not raw MXU rate.)
    inter = jax.lax.dot_general(
        src, W1,
        dimension_numbers=(((0,), (1,)), ((1,), (2,))),
        preferred_element_type=jnp.float32, precision=prec)  # (xs, c, v)

    uu = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    w_x = h[2, 0] * uu + h[2, 1] * vv + h[2, 2]
    X = (h[0, 0] * uu + h[0, 1] * vv + h[0, 2]) / w_x   # (v, u)
    X = jnp.where(jnp.isfinite(X), X, -1e9)
    X = jax.lax.optimization_barrier(X)                 # see Y above

    sx = jax.lax.broadcasted_iota(jnp.float32, (src_w, 1), 0)
    # W2[v, sx, u]: hat weights of source column sx for output column u in row v
    W2 = _tri(X[:, None, :] - sx[None, :, :])
    W2 = W2 * (sx[None, :, :] <= ew - 1)
    W2 = W2.astype(weight_dtype)

    # Out[v, c, u] = sum_sx I[sx, c, v] * W2[v, sx, u] — channels again on M,
    # out_w on N; no intermediate transpose is needed because pass 1 already
    # produced (xs, c, v)
    out = jax.lax.dot_general(
        inter.astype(weight_dtype), W2,
        dimension_numbers=(((0,), (1,)), ((2,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # (v, c, u)
    return out.transpose(0, 2, 1)                      # (v, u, c)


@functools.partial(jax.jit, static_argnames=('out_shape', 'chunk', 'wdtype'))
def warp_batch_mxu(images, homographies, out_shape, extents=None, chunk=8,
                   wdtype=None):
    """MXU-friendly batched perspective warp (see _warp_single_mxu).

    Processes the batch in chunks of `chunk` samples to bound the transient
    HBM footprint of the per-sample weight matrices
    (~out_h*src_h*src_w*2 bytes each in bf16).

    wdtype overrides the weight/source dot dtype: the bf16 TPU default is
    exact for uint8-valued colour sources but quantizes float sources
    (raw depth) to 8 significant bits — pass jnp.float32 for those.
    """
    b = images.shape[0]
    if extents is None:
        extents = jnp.tile(jnp.asarray(images.shape[1:3], jnp.int32), (b, 1))

    if wdtype is None:
        # bf16 weight matrices ride the MXU on TPU; XLA:CPU cannot execute
        # an unfused bf16 dot (tests run the same code on host), so f32 there
        wdtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
                  else jnp.float32)

    def one_chunk(args):
        imgs, homs, exts = args
        return jax.vmap(lambda im, hg, ex: _warp_single_mxu(
            im, hg, out_shape, ex, wdtype))(imgs, homs, exts)

    if b <= chunk:
        return one_chunk((images, homographies, extents))
    pad = (-b) % chunk
    if pad:
        # pad ragged batches to a chunk multiple by repeating the last
        # sample rather than abandoning chunking: one unchunked pass over a
        # large ragged batch materializes every per-sample weight tensor at
        # once (~13.5 GB at b=100, 257x512^2) and OOMs HBM
        images = jnp.concatenate(
            [images, jnp.repeat(images[-1:], pad, axis=0)])
        homographies = jnp.concatenate(
            [homographies, jnp.repeat(homographies[-1:], pad, axis=0)])
        extents = jnp.concatenate(
            [extents, jnp.repeat(extents[-1:], pad, axis=0)])
    bp = b + pad
    imgs = images.reshape((bp // chunk, chunk) + images.shape[1:])
    homs = homographies.reshape(bp // chunk, chunk, 3, 3)
    exts = extents.reshape(bp // chunk, chunk, 2)
    out = jax.lax.map(one_chunk, (imgs, homs, exts))
    return out.reshape((bp,) + out.shape[2:])[:b]


def decompose_homography(homographies, out_shape, m, xp=jnp):
    """Split each out->src homography H into H = A o R with A axis-aligned.

    A maps the intermediate grid [0, m)^2 onto the axis-aligned bounding box
    of H([0, out)^2) in source coordinates (plus a 1px bilinear margin), so
    the residual R = A^-1 H maps the output onto [0, m)^2 with unit-ish
    scale regardless of the crop's zoom — only the crop's rotation /
    perspective remains in R.

    Returns (R (..., 3, 3), scale (..., 2, 2)) where scale rows are
    (step, start) for y and x: src = start + p * step.

    Works with xp=jnp (device, vmappable) or xp=np (host gating).
    """
    h = homographies
    out_h, out_w = out_shape
    corners = xp.asarray(
        [[0.0, 0.0, 1.0], [out_w - 1.0, 0.0, 1.0],
         [0.0, out_h - 1.0, 1.0], [out_w - 1.0, out_h - 1.0, 1.0]],
        dtype=xp.float32)
    # HIGHEST: on TPU the default einsum precision drops these 3x3 dots to
    # bf16, and the -lo/step terms (~hundreds) in ainv would amplify that
    # rounding to ~px-scale translation drift in the residual — the image
    # would be warped through a slightly different homography than the one
    # the host builds the labels from (CPU tests can't see this: XLA:CPU
    # runs f32 either way). Same rule as recon.py / area_downscale.
    kw = {} if xp is np else dict(precision=jax.lax.Precision.HIGHEST)
    p = xp.einsum('...ij,cj->...ci', h, corners, **kw)
    xy = p[..., :2] / p[..., 2:3]
    lo = xp.min(xy, axis=-2) - 1.0                     # (..., 2) x, y
    hi = xp.max(xy, axis=-2) + 1.0
    step = (hi - lo) / (m - 1.0)                       # (..., 2)
    # A = [[sx, 0, x0], [0, sy, y0], [0, 0, 1]];  A^-1 H:
    zeros = xp.zeros_like(step[..., 0])
    ones = xp.ones_like(step[..., 0])
    ainv = xp.stack([
        xp.stack([1.0 / step[..., 0], zeros, -lo[..., 0] / step[..., 0]], -1),
        xp.stack([zeros, 1.0 / step[..., 1], -lo[..., 1] / step[..., 1]], -1),
        xp.stack([zeros, zeros, ones], -1)], -2)
    residual = xp.einsum('...ij,...jk->...ik', ainv, h, **kw)
    scale = xp.stack([
        xp.stack([step[..., 1], lo[..., 1]], -1),      # y: (step, start)
        xp.stack([step[..., 0], lo[..., 0]], -1)], -2) # x
    return residual, scale


def _dot_precision(weight_dtype):
    """MXU dot precision matching the chosen source dtype: with f32
    operands the TPU's DEFAULT dot precision still truncates inputs to
    bf16 (single MXU pass) — measured bit-identical to an explicit bf16
    cast (docs/experiments/r4_depthwarp_f32.log) — so a caller asking for
    f32 sources (the raw-depth stream) must also get the multi-pass
    HIGHEST dot to actually keep the mantissa."""
    return (jax.lax.Precision.HIGHEST if weight_dtype == jnp.float32
            else None)


def _scale_resample_single(image, scale, extent, m, weight_dtype,
                           post_scale=1.0):
    """Axis-aligned bilinear resample src -> (m, m) intermediate as two
    dense matmuls. The weight matrices are (m, src) — tiny next to the
    (out, src, src) banded tensors of the general warp — so this stage is
    genuinely MXU-bound.

    uint8 sources are fed straight into the bf16 dot (integers <= 255 are
    exact in bf16); pass post_scale=1/255 to fold the normalization into
    the (m, m) intermediate instead of materializing a f32 copy of the
    full-size canvas."""
    src_h, src_w = image.shape[:2]
    eh = extent[0].astype(jnp.float32)
    ew = extent[1].astype(jnp.float32)

    p = jax.lax.broadcasted_iota(jnp.float32, (m, 1), 0)
    ya = scale[0, 1] + p * scale[0, 0]                 # (m, 1)
    sy = jax.lax.broadcasted_iota(jnp.float32, (1, src_h), 1)
    w1 = _tri(ya - sy) * (sy <= eh - 1.0)              # (m, src_h)
    xa = scale[1, 1] + p * scale[1, 0]
    sx = jax.lax.broadcasted_iota(jnp.float32, (1, src_w), 1)
    w2 = _tri(xa - sx) * (sx <= ew - 1.0)              # (m, src_w)

    prec = _dot_precision(weight_dtype)
    src = image.astype(weight_dtype).reshape(src_h, src_w * image.shape[2])
    t1 = jax.lax.dot(w1.astype(weight_dtype), src,
                     preferred_element_type=jnp.float32, precision=prec)
    t1 = t1.reshape(m, src_w, image.shape[2])          # (p, x, c)
    inter = jax.lax.dot_general(
        t1.astype(weight_dtype), w2.astype(weight_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (p, c, q)
    if post_scale != 1.0:
        inter = inter * jnp.float32(post_scale)
    return inter.transpose(0, 2, 1)                    # (p, q, c)


def _scale_resample_single_planar(image, scale, extent, m, weight_dtype,
                                  post_scale=1.0):
    """_scale_resample_single emitting channel-planar (c, m, m) with both
    passes as pure dots and no transposes anywhere: pass 1 contracts src
    rows producing (x, c, p), pass 2 contracts src columns producing
    (c, p, q) — exactly the layout the banded Pallas stage B reads."""
    src_h, src_w = image.shape[:2]
    eh = extent[0].astype(jnp.float32)
    ew = extent[1].astype(jnp.float32)

    p = jax.lax.broadcasted_iota(jnp.float32, (m, 1), 0)
    ya = scale[0, 1] + p * scale[0, 0]
    sy = jax.lax.broadcasted_iota(jnp.float32, (1, src_h), 1)
    w1 = _tri(ya - sy) * (sy <= eh - 1.0)              # (m, src_h)
    xa = scale[1, 1] + p * scale[1, 0]
    sx = jax.lax.broadcasted_iota(jnp.float32, (1, src_w), 1)
    w2 = _tri(xa - sx) * (sx <= ew - 1.0)              # (m, src_w)

    prec = _dot_precision(weight_dtype)
    src = image.astype(weight_dtype)                   # (sy, x, c)
    t1 = jax.lax.dot_general(
        src, w1.astype(weight_dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (x, c, p)
    inter = jax.lax.dot_general(
        t1.astype(weight_dtype), w2.astype(weight_dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (c, p, q)
    if post_scale != 1.0:
        inter = inter * jnp.float32(post_scale)
    return inter


def split_defaults(out_shape):
    """(m, band) for warp_batch_split/split_band_ok: the intermediate side m
    tracks the output side (floor to the 8-sublane grid) so the residual
    homography always has ~unit scale; the band covers the residual's
    rotation/perspective spread at that size."""
    m = max((out_shape[0] // 8) * 8, 16)
    band = 32 if m >= 96 else 24
    return m, min(band, m - 8)


def split_band_ok(homographies, out_shape, m=None, band=None):
    """Host-side gate for warp_batch_split: the residual warps must satisfy
    the banded kernel's support bound. By construction the residual scale is
    ~m/out (~1), so this passes for any zoom; only strong rotation /
    perspective in the crop camera rejects (then callers fall back to
    warp_batch_mxu)."""
    from .warp_pallas import band_ok_v2
    defaults = split_defaults(out_shape)
    m = m if m is not None else defaults[0]
    band = band if band is not None else defaults[1]
    h = np.asarray(homographies, np.float64)
    residual, scale = decompose_homography(h, out_shape, m, xp=np)
    if not np.all(np.isfinite(residual)) or not np.all(scale[..., 0] > 0):
        return False
    return band_ok_v2(residual, (m, m), out_shape, band=band)


@functools.partial(jax.jit, static_argnames=('out_shape', 'm', 'band',
                                             'interpret', 'stage_b',
                                             'planar_out', 'wdtype'))
def warp_batch_split(images, homographies, out_shape, extents=None, m=None,
                     band=None, interpret=False, stage_b='pallas',
                     planar_out=False, wdtype=None):
    """Two-stage batched perspective warp: per-image axis-aligned MXU
    prescale onto an (m, m) intermediate, then the near-identity residual
    homography via the banded Pallas kernel (stage_b='pallas') or the
    two-pass matmul warp (stage_b='mxu', used on CPU where Pallas would
    interpret).

    This decomposition exists because the general warp's cost is the banded
    weight-tensor *generation* (out_h*src_h*src_w hat-weight elements per
    sample, ~100M at 512^2 canvases — measured generation-bound, not
    MXU-bound). Stage A's weights are (m, src) per sample (~1000x fewer) and
    stage B's are band-limited at unit scale, so the pair generates ~16x
    fewer weight elements at 512^2 canvases.

    Semantics: the same sampling locus as warp_batch_mxu; reconstruction is a
    composition of two bilinear resamplings (the reference's own antialias
    path composes resamplings the same way, cameralib.py:676-689). Callers
    must gate with split_band_ok. Train-augmentation only; evaluation keeps
    the gather path for strict cv2 parity.
    """
    b = images.shape[0]
    defaults = split_defaults(out_shape)
    m = m if m is not None else defaults[0]
    band = band if band is not None else defaults[1]
    if extents is None:
        extents = jnp.tile(jnp.asarray(images.shape[1:3], jnp.int32), (b, 1))
    on_tpu = jax.default_backend() == 'tpu'
    if wdtype is None:
        # bf16 is exact for uint8-valued colour sources; float sources
        # (raw depth) pass wdtype=jnp.float32 to keep their mantissa
        wdtype = jnp.bfloat16 if on_tpu else jnp.float32
    if stage_b == 'pallas' and not on_tpu and not interpret:
        stage_b = 'mxu'   # Pallas compiles for TPU only; hosts get the
                          # numerically-identical matmul stage B

    # uint8 canvases feed the bf16 dot directly (integers <= 255 are exact);
    # the 1/255 normalization lands on the small intermediate
    post = 1.0 / 255.0 if images.dtype == jnp.uint8 else 1.0

    residual, scale = decompose_homography(
        homographies.astype(jnp.float32), out_shape, m)
    full = jnp.tile(jnp.asarray([m, m], jnp.int32), (b, 1))
    if stage_b == 'pallas':
        # the whole warp as one VMEM-resident kernel: stage A's matmuls run
        # on the MXU inside it (no HBM intermediate, no layout copies)
        from .warp_pallas import warp_batch_split_pallas
        return warp_batch_split_pallas(images, residual, scale, extents,
                                       out_shape, m, band=band,
                                       interpret=interpret,
                                       planar_out=planar_out,
                                       post_scale=post, wdtype=wdtype)
    if stage_b == 'pallas2':
        from .warp_pallas import warp_batch_pallas_banded
        inter = jax.vmap(lambda im, sc, ex: _scale_resample_single_planar(
            im, sc, ex, m, wdtype, post))(images, scale, extents)
        return warp_batch_pallas_banded(inter, residual, full, out_shape,
                                        band=band, interpret=interpret,
                                        version=2, planar_in=True,
                                        planar_out=planar_out)
    inter = jax.vmap(lambda im, sc, ex: _scale_resample_single(
        im, sc, ex, m, wdtype, post))(images, scale, extents)
    out = warp_batch_mxu(inter, residual, out_shape, full)
    if planar_out:
        return jnp.transpose(out, (0, 3, 1, 2))
    return out


def antialias_factor(homography, out_shape):
    """Host-side: the isotropic pre-downscale factor of the reference's
    antialias path (cameralib.py:676-689). Returns a float <= 1; 1 means no
    pre-downscale is needed."""
    homography = np.asarray(homography, np.float64)
    center = np.array([out_shape[1] / 2, out_shape[0] / 2, 1.0])
    down = center + [0, 1, 0]
    right = center + [1, 0, 0]
    # the reference norms the RAW homogeneous 3-vectors — no perspective
    # division (cameralib.py:676-681); replicate that, w-component and all
    center_src, down_src, right_src = (
        np.stack([center, down, right], axis=0) @ homography.T)
    y_factor = min(1 / np.linalg.norm(center_src - down_src) * 1.5, 1)
    x_factor = min(1 / np.linalg.norm(center_src - right_src) * 1.5, 1)
    return float(np.sqrt(y_factor * x_factor))


def _area_weights(new_n, old_n):
    """(new_n, old_n) row-stochastic matrix of exact pixel-interval overlaps:
    out[i] = mean of src over [i*s, (i+1)*s), s = old_n/new_n — the true
    area-average (cv2.INTER_AREA) for arbitrary downscale factors."""
    scale = old_n / new_n
    w = np.zeros((new_n, old_n), np.float32)
    for i in range(new_n):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, old_n)):
            w[i, j] = (min(j + 1.0, hi) - max(float(j), lo)) / scale
    return w


def area_downscale(image, factor_shape):
    """Downscale to `factor_shape` = (new_h, new_w) by exact area averaging,
    matching cv2.INTER_AREA (cameralib.py:687-688) for arbitrary factors: two
    separable box-coverage matmuls (MXU-friendly, like the warp path)."""
    new_h, new_w = factor_shape
    h, w = image.shape[:2]
    wh = jnp.asarray(_area_weights(new_h, h))
    ww = jnp.asarray(_area_weights(new_w, w))
    out = jnp.tensordot(wh, image, axes=((1,), (0,)),
                        precision=jax.lax.Precision.HIGHEST)   # (new_h, w, c)
    return jnp.einsum('hwc,Ww->hWc', out, ww,
                      precision=jax.lax.Precision.HIGHEST)


def distorted_source_coords(coords_undist, old_intrinsics, dist_coeffs):
    """General-path lookup (cameralib.py:408-424): when the *source* camera has
    distortion, the undistorted normalized coords must be pushed through the
    forward distortion polynomial before applying the source intrinsics.

    coords_undist: (..., 2) normalized (pre-intrinsics) source-cam coords.
    Matches the reference's project_points polynomial (cameralib.py:636-658).
    """
    k1, k2, p1, p2, k3 = [dist_coeffs[i] for i in range(5)]
    x = coords_undist[..., 0]
    y = coords_undist[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    distorter = (1.0 + k1 * r2 + k2 * r4 + k3 * r6
                 + x * (2.0 * p2) + y * (2.0 * p1))
    xd = x * distorter + r2 * p2
    yd = y * distorter + r2 * p1
    fx = old_intrinsics[0, 0]
    fy = old_intrinsics[1, 1]
    skew = old_intrinsics[0, 1]
    cx = old_intrinsics[0, 2]
    cy = old_intrinsics[1, 2]
    u = fx * xd + skew * yd + cx
    v = fy * yd + cy
    return jnp.stack([u, v], axis=-1)


def warp_single_distorted(image, partial_homography, old_intrinsics,
                          dist_coeffs, out_shape, extent=None):
    """Warp when the source camera is distorted (the general case of
    cameralib.py:415-421): partial_homography = R_old @ inv(R_new) @ inv(K_new)
    maps output pixels to *camera-space rays* of the old camera; those are
    projected with distortion, then sampled."""
    out_h, out_w = out_shape
    y = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    h = partial_homography
    rx = h[0, 0] * x + h[0, 1] * y + h[0, 2]
    ry = h[1, 0] * x + h[1, 1] * y + h[1, 2]
    rw = h[2, 0] * x + h[2, 1] * y + h[2, 2]
    normalized = jnp.stack([rx / rw, ry / rw], axis=-1)
    coords = distorted_source_coords(normalized, old_intrinsics, dist_coeffs)
    return bilinear_sample(image, coords, extent)
