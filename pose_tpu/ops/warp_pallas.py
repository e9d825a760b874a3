"""Fused Pallas perspective-warp kernels (VMEM-resident, gather-free).

The general-warp cost on TPU is the *generation* of the banded bilinear
weight tensors (out_h*src_h*src_w hat weights per sample), whether fused
into XLA dots (warp_batch_mxu) or streamed on the VPU. These kernels keep
the whole sample resident in VMEM and touch only the ~band source rows that
can contribute to each output tile, so HBM sees the canvas read and crop
write only.

Production use: `warp_batch_pallas_banded` (the `_banded_kernel_v2`
output-tile kernel) is STAGE B of the split warp (ops.warp.warp_batch_split)
— the residual, unit-scale warp after the axis-aligned MXU prescale; it is
the TPU train-path default via POSE_TPU_WARP=split. Gate with `band_ok_v2`;
a violated band silently drops weight (the loader falls back to
warp_batch_mxu per batch).

Kernel history (v5e, 256²→257², bs128): round-1 source-scanline RMW loop
10.4 ms → output-tiles with per-tap dynamic row reads 8.9 ms → aligned
whole-block read + statically-unrolled tap loop ~2.6 ms. Dynamic-offset
accesses and loop trips price a Mosaic kernel, not FLOPs. The superseded
kernels were removed once v2 measured bit-exact against them;
`warp_batch_pallas` (full scanlines, 43 ms — ~99% of FMAs land on zero
weights) is kept solely as the independent test oracle for the banded
kernel's semantics.

Same two-pass (Catmull-Smith) semantics as _warp_single_mxu: pass 1
resamples columns at Y(v, x_s), pass 2 resamples rows at X(u, v); zero
border beyond the per-sample extent.

Layout notes:
- channel-planar (B, C, S, S): every VPU op is a clean 2-D (sublane, lane)
  tile; channels in the minor dim would waste most of the 128 lanes.
- pass 2 accumulates transposed (out_w, v) so its reads slice the *sublane*
  dim (cheap dynamic addressing); a lane-dim dynamic slice per iteration
  would serialize.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _warp_kernel(hom_ref, ext_ref, src_ref, out_ref, inter_ref, *, src_hw,
                 out_hw, v_pad):
    src_h, src_w = src_hw
    out_h, out_w = out_hw

    i = pl.program_id(0)
    h00 = hom_ref[i, 0]
    h01 = hom_ref[i, 1]
    h02 = hom_ref[i, 2]
    h10 = hom_ref[i, 3]
    h11 = hom_ref[i, 4]
    h12 = hom_ref[i, 5]
    h20 = hom_ref[i, 6]
    h21 = hom_ref[i, 7]
    h22 = hom_ref[i, 8]
    eh = ext_ref[i, 0]
    ew = ext_ref[i, 1]

    # ---- pass 1: I[c, v, xs] = sum_sy tri(Y - sy) * src[c, sy, xs]
    # Mosaic iota is integer-only
    v = jax.lax.broadcasted_iota(jnp.int32, (v_pad, src_w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (v_pad, src_w), 1).astype(jnp.float32)
    denom_u = h00 - h20 * xs
    u_of = (xs * (h21 * v + h22) - h01 * v - h02) / denom_u
    w_h = h20 * u_of + h21 * v + h22
    Y = (h10 * u_of + h11 * v + h12) / w_h
    Y = jnp.where(jnp.isfinite(Y), Y, -1e9)

    def pass1_body(sy, carry):
        syf = sy.astype(jnp.float32)
        w = _tri(Y - syf) * jnp.where(syf <= eh - 1, 1.0, 0.0)
        return tuple(
            acc + w * src_ref[0, c, pl.ds(sy, 1), :].astype(jnp.float32)
            for c, acc in enumerate(carry))

    init = tuple(jnp.zeros((v_pad, src_w), jnp.float32) for _ in range(3))
    inter = jax.lax.fori_loop(0, src_h, pass1_body, init)
    # park the transposed intermediate in VMEM scratch so pass 2's per-sx
    # reads are *ref* sublane slices (Mosaic has no dynamic_slice on values)
    for c in range(3):
        inter_ref[c, :, :] = jnp.transpose(inter[c])        # (src_w, v_pad)

    # ---- pass 2 (transposed): out_t[c, u, v] = sum_sx tri(X_t - sx) * I_t
    u_t = jax.lax.broadcasted_iota(jnp.int32, (out_w, v_pad), 0).astype(jnp.float32)
    v_t = jax.lax.broadcasted_iota(jnp.int32, (out_w, v_pad), 1).astype(jnp.float32)
    w_x = h20 * u_t + h21 * v_t + h22
    X_t = (h00 * u_t + h01 * v_t + h02) / w_x
    X_t = jnp.where(jnp.isfinite(X_t), X_t, -1e9)

    def pass2_body(sx, carry):
        sxf = sx.astype(jnp.float32)
        w2 = _tri(X_t - sxf) * jnp.where(sxf <= ew - 1, 1.0, 0.0)
        return tuple(
            acc + w2 * inter_ref[c, pl.ds(sx, 1), :]
            for c, acc in enumerate(carry))

    init2 = tuple(jnp.zeros((out_w, v_pad), jnp.float32) for _ in range(3))
    out_t = jax.lax.fori_loop(0, src_w, pass2_body, init2)

    for c in range(3):
        out_ref[0, c, :, :] = jnp.transpose(out_t[c])[:out_h, :]


def _banded_kernel_v2(hom_ref, ext_ref, src_ref, out_ref, y_ref, xt_ref,
                      inter_ref, intert_ref, outt_ref, *, src_hw, out_hw,
                      v_pad, u_pad, band):
    """Output-centric banded warp: iterate over 8-row *output* tiles instead
    of source scanlines. Each tile reads ONE aligned (band+8)-row source
    block and accumulates over a statically-unrolled tap loop — v1's
    per-scanline read-modify-write of a (band, src_w) VMEM window and v2.0's
    per-tap dynamic row reads are both gone; every access inside the unroll
    has a static offset into the block. `band` is the semantic support
    window; the physical block adds 8 rows so the block start can be
    8-sublane aligned without shrinking coverage.
    Same two-pass semantics and weights as v1/_warp_single_mxu; callers gate
    with band_ok_v2 — a violated band silently drops weight.

    Channel-generic: the loop count comes from the src block's static shape
    (RGB crops use 3, raw-depth crops 1)."""
    src_h, src_w = src_hw
    n_ch = src_ref.shape[1]
    i = pl.program_id(0)
    hvals = tuple(hom_ref[i, k] for k in range(9))
    eh = ext_ref[i, 0]
    ew = ext_ref[i, 1]
    src_read = lambda c, lo, size: src_ref[0, c, pl.ds(lo, size), :].astype(
        jnp.float32)
    _banded_core(hvals, eh, ew, src_read, n_ch, out_ref, y_ref, xt_ref,
                 inter_ref, intert_ref, outt_ref, src_hw=src_hw,
                 out_hw=out_hw, v_pad=v_pad, u_pad=u_pad, band=band)


def _banded_core(hvals, eh, ew, src_read, n_ch, out_ref, y_ref, xt_ref,
                 inter_ref, intert_ref, outt_ref, *, src_hw, out_hw, v_pad,
                 u_pad, band):
    """The output-tile banded two-pass body shared by _banded_kernel_v2 and
    _split_kernel. `src_read(c, lo, size)` returns a (size, src_w) f32 row
    block (8-aligned lo); `hvals` is the flattened out->src homography."""
    src_h, src_w = src_hw
    out_h, out_w = out_hw
    h00, h01, h02, h10, h11, h12, h20, h21, h22 = hvals

    def y_scalar(vf, xf):
        denom_u = h00 - h20 * xf
        u_of = (xf * (h21 * vf + h22) - h01 * vf - h02) / denom_u
        w_h = h20 * u_of + h21 * vf + h22
        return (h10 * u_of + h11 * vf + h12) / w_h

    # full inverse row map, one vectorized pass
    v = jax.lax.broadcasted_iota(jnp.int32, (v_pad, src_w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (v_pad, src_w), 1).astype(jnp.float32)
    denom_u = h00 - h20 * xs
    u_of = (xs * (h21 * v + h22) - h01 * v - h02) / denom_u
    w_h = h20 * u_of + h21 * v + h22
    Y = (h10 * u_of + h11 * v + h12) / w_h
    y_ref[:, :] = jnp.where(jnp.isfinite(Y), Y, -1e9)

    xm = jnp.float32(src_w // 2)
    block = band + 8

    def vtile_body(t, _):
        vc = (8 * t + 4).astype(jnp.float32)
        y_c = y_scalar(vc, xm)
        y_c = jnp.where(jnp.isfinite(y_c), y_c, 0.0)
        vlo = jnp.clip(y_c.astype(jnp.int32) - band // 2, 0, src_h - block)
        vlo = (vlo // 8) * 8                 # aligned whole-block read below
        yb = y_ref[pl.ds(8 * t, 8), :] - vlo.astype(jnp.float32)  # (8, src_w)
        blocks = [src_read(c, vlo, block) for c in range(n_ch)]
        top = eh - vlo.astype(jnp.float32)   # taps at >= top are padding

        accs = [jnp.zeros((8, src_w), jnp.float32) for _ in range(n_ch)]
        for k in range(block):               # static unroll, static offsets
            w = _tri(yb - k) * jnp.where(k <= top - 1, 1.0, 0.0)
            for c in range(n_ch):
                accs[c] = accs[c] + w * blocks[c][k:k + 1, :]
        for c in range(n_ch):
            inter_ref[c, pl.ds(8 * t, 8), :] = accs[c]
        return 0

    jax.lax.fori_loop(0, v_pad // 8, vtile_body, 0)

    for c in range(n_ch):
        intert_ref[c, :, :] = jnp.transpose(inter_ref[c, :, :])

    # pass 2 (transposed accumulation) over 8-column output tiles
    u_t = jax.lax.broadcasted_iota(jnp.int32, (u_pad, v_pad), 0).astype(jnp.float32)
    v_t = jax.lax.broadcasted_iota(jnp.int32, (u_pad, v_pad), 1).astype(jnp.float32)
    w_x = h20 * u_t + h21 * v_t + h22
    X_t = (h00 * u_t + h01 * v_t + h02) / w_x
    xt_ref[:, :] = jnp.where(jnp.isfinite(X_t), X_t, -1e9)

    vm = jnp.float32(out_h // 2)

    def x_scalar(uf, vf):
        return (h00 * uf + h01 * vf + h02) / (h20 * uf + h21 * vf + h22)

    def utile_body(t, _):
        uc = (8 * t + 4).astype(jnp.float32)
        x_c = x_scalar(uc, vm)
        x_c = jnp.where(jnp.isfinite(x_c), x_c, 0.0)
        xlo = jnp.clip(x_c.astype(jnp.int32) - band // 2, 0, src_w - block)
        xlo = (xlo // 8) * 8
        xb = xt_ref[pl.ds(8 * t, 8), :] - xlo.astype(jnp.float32)  # (8, v_pad)
        blocks = [intert_ref[c, pl.ds(xlo, block), :] for c in range(n_ch)]
        top = ew - xlo.astype(jnp.float32)

        accs = [jnp.zeros((8, v_pad), jnp.float32) for _ in range(n_ch)]
        for k in range(block):
            w2 = _tri(xb - k) * jnp.where(k <= top - 1, 1.0, 0.0)
            for c in range(n_ch):
                accs[c] = accs[c] + w2 * blocks[c][k:k + 1, :]
        for c in range(n_ch):
            outt_ref[c, pl.ds(8 * t, 8), :] = accs[c]
        return 0

    jax.lax.fori_loop(0, u_pad // 8, utile_body, 0)

    for c in range(n_ch):
        out_ref[0, c, :, :] = jnp.transpose(outt_ref[c, :, :])[:out_h, :out_w]


def _split_kernel(scal_ref, src_ref, out_ref, y_ref, xt_ref, a_ref,
                  inter_ref, intert_ref, outt_ref, *, src_hw, m, out_hw,
                  v_pad, u_pad, band, post_scale, wdtype):
    """The WHOLE split warp as one VMEM-resident kernel: stage A's two
    axis-aligned resampling matmuls run on the MXU inside the kernel (the
    uint8 canvas block is the only HBM read, the crop plane the only write —
    the (B, 3, m, m) stage-A intermediate never touches HBM, and the layout
    copies XLA inserted around the two-op version disappear), then the
    banded residual core consumes the in-VMEM intermediate.

    scal_ref rows: [R (9) | ystep ystart xstep xstart | eh ew]."""
    src_h, src_w = src_hw
    n_ch = src_ref.shape[1]
    i = pl.program_id(0)
    hvals = tuple(scal_ref[i, k] for k in range(9))
    ystep, ystart = scal_ref[i, 9], scal_ref[i, 10]
    xstep, xstart = scal_ref[i, 11], scal_ref[i, 12]
    eh, ew = scal_ref[i, 13], scal_ref[i, 14]

    # stage A: (m, src_h) @ (src_h, src_w) then contract columns -> (m, m)
    p1 = jax.lax.broadcasted_iota(jnp.int32, (m, src_h), 0).astype(jnp.float32)
    sy = jax.lax.broadcasted_iota(jnp.int32, (m, src_h), 1).astype(jnp.float32)
    w1 = (_tri(ystart + p1 * ystep - sy)
          * jnp.where(sy <= eh - 1.0, 1.0, 0.0)).astype(wdtype)
    p2 = jax.lax.broadcasted_iota(jnp.int32, (m, src_w), 0).astype(jnp.float32)
    sx = jax.lax.broadcasted_iota(jnp.int32, (m, src_w), 1).astype(jnp.float32)
    w2 = (_tri(xstart + p2 * xstep - sx)
          * jnp.where(sx <= ew - 1.0, 1.0, 0.0)).astype(wdtype)

    # with f32 operands the MXU's DEFAULT dot still truncates to bf16 (one
    # pass); the f32-source path (raw depth) needs HIGHEST to keep mantissa
    prec = (jax.lax.Precision.HIGHEST if wdtype == jnp.float32 else None)
    for c in range(n_ch):
        # Mosaic has no direct uint8->bf16 cast; go through int32 (exact
        # for pixel values, and int32->bf16 is supported)
        srcc = src_ref[0, c, :, :]
        if srcc.dtype == jnp.uint8:
            srcc = srcc.astype(jnp.int32)
        srcc = srcc.astype(wdtype)
        t1 = jax.lax.dot_general(
            w1, srcc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                              # (m, src_w)
        a_c = jax.lax.dot_general(
            t1.astype(wdtype), w2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                              # (m, m)
        a_ref[c, :, :] = a_c * post_scale

    src_read = lambda c, lo, size: a_ref[c, pl.ds(lo, size), :]
    _banded_core(hvals, jnp.float32(m), jnp.float32(m), src_read, n_ch,
                 out_ref, y_ref, xt_ref, inter_ref, intert_ref, outt_ref,
                 src_hw=(m, m), out_hw=out_hw, v_pad=v_pad, u_pad=u_pad,
                 band=band)


def band_ok_v2(homographies, src_hw, out_hw, band=32):
    """Host-side gate for the output-centric kernel: every output 8-tile's
    true source taps (bilinear pair + in-tile spread + cross-width deviation
    from the tile-center estimate) must fit within band/2 of the estimate.
    The kernel's physical block is band+8 rows so 8-sublane alignment costs
    no coverage. numpy, O(B) scalars."""
    import numpy as np

    h = np.asarray(homographies, np.float64)
    src_h, src_w = src_hw
    out_h, out_w = out_hw
    if src_h < band + 8 or src_w < band + 8:
        return False

    def y_at(hh, vf, xf):
        denom_u = hh[0, 0] - hh[2, 0] * xf
        if abs(denom_u) < 1e-9:
            return np.nan
        u_of = (xf * (hh[2, 1] * vf + hh[2, 2]) - hh[0, 1] * vf
                - hh[0, 2]) / denom_u
        w_h = hh[2, 0] * u_of + hh[2, 1] * vf + hh[2, 2]
        return (hh[1, 0] * u_of + hh[1, 1] * vf + hh[1, 2]) / w_h

    def x_at(hh, uf, vf):
        d = hh[2, 0] * uf + hh[2, 1] * vf + hh[2, 2]
        if abs(d) < 1e-9:
            return np.nan
        return (hh[0, 0] * uf + hh[0, 1] * vf + hh[0, 2]) / d

    half = band // 2 - 2            # bilinear tap pair
    for hh in h:
        xm = src_w // 2
        vm = out_h // 2
        # in-tile slope at BOTH ends of the sweep: under perspective the
        # derivative grows ~1/w^2 toward one edge, so a near-edge-only
        # estimate can under-cover far tiles (weight silently drops when
        # the band misses taps) — take the max (np.maximum: NaN-propagating,
        # unlike builtin max)
        slope = np.maximum(
            abs(y_at(hh, 8.0, xm) - y_at(hh, 0.0, xm)),
            abs(y_at(hh, out_h - 1.0, xm)
                - y_at(hh, out_h - 9.0, xm))) / 8.0
        slope2 = np.maximum(
            abs(x_at(hh, 8.0, vm) - x_at(hh, 0.0, vm)),
            abs(x_at(hh, out_w - 1.0, vm)
                - x_at(hh, out_w - 9.0, vm))) / 8.0
        if not (np.isfinite(slope) and np.isfinite(slope2)):
            return False
        for vf in (0.0, out_h / 2, out_h - 1.0):
            y_c = y_at(hh, vf, xm)
            if not np.isfinite(y_c):
                return False
            for xf in (0.0, src_w - 1.0):
                yv = y_at(hh, vf, xf)
                if not np.isfinite(yv):
                    return False
                if abs(yv - y_c) + 4.0 * abs(slope) > half:
                    return False
        for uf in (0.0, out_w / 2, out_w - 1.0):
            x_c = x_at(hh, uf, vm)
            if not np.isfinite(x_c):
                return False
            for vf in (0.0, out_h - 1.0):
                xv = x_at(hh, uf, vf)
                if not np.isfinite(xv):
                    return False
                if abs(xv - x_c) + 4.0 * abs(slope2) > half:
                    return False
    return True


@functools.partial(jax.jit, static_argnames=('out_shape', 'interpret',
                                             'band', 'version', 'planar_in',
                                             'planar_out'))
def warp_batch_pallas_banded(canvases, homographies, extents, out_shape,
                             band=32, interpret=False, version=2,
                             planar_in=False, planar_out=False):
    """Band-limited fused warp (output-tile iteration, _banded_kernel_v2);
    gate with band_ok_v2. planar_in=True takes
    (B, C, H, W) f32 directly (the split warp's stage A emits this),
    skipping the NHWC transpose; channel-generic (RGB crops C=3,
    raw-depth crops C=1). The v1 source-scanline kernel (round-1, 10.4 ms
    vs 2.6 at 256^2/bs128) was removed once v2 measured bit-exact against
    both it and the matmul warp; `version` stays for call-site clarity."""
    if planar_in:
        b, n_ch, src_h, src_w = canvases.shape
        planar = canvases.astype(jnp.float32)
    else:
        b, src_h, src_w, n_ch = canvases.shape
        planar = jnp.transpose(canvases, (0, 3, 1, 2)).astype(jnp.float32)
    out_h, out_w = out_shape
    v_pad = ((out_h + 7) // 8) * 8

    homs = homographies.reshape(b, 9).astype(jnp.float32)
    exts = extents.reshape(b, 2).astype(jnp.float32)

    u_pad = ((out_w + 7) // 8) * 8
    assert version == 2
    kernel = functools.partial(
        _banded_kernel_v2,
        src_hw=(src_h, src_w), out_hw=(out_h, out_w), v_pad=v_pad,
        u_pad=u_pad, band=band)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_ch, src_h, src_w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_ch, out_h, out_w),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((v_pad, src_w), jnp.float32),       # Y
            pltpu.VMEM((((out_w + 7) // 8) * 8, v_pad), jnp.float32),  # X_t
            pltpu.VMEM((n_ch, v_pad, src_w), jnp.float32),    # inter
            pltpu.VMEM((n_ch, src_w, v_pad), jnp.float32),    # inter_t
            pltpu.VMEM((n_ch, ((out_w + 7) // 8) * 8, v_pad),
                       jnp.float32),                          # out_t
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_ch, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(homs, exts, planar)
    if planar_out:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=('out_shape', 'm', 'band',
                                             'interpret', 'planar_out',
                                             'post_scale', 'wdtype'))
def warp_batch_split_pallas(canvases, residual, scale, extents, out_shape,
                            m, band=32, interpret=False, planar_out=False,
                            post_scale=1.0, wdtype=jnp.bfloat16):
    """Single-kernel split warp (see _split_kernel): NHWC uint8/float
    canvases + per-image residual homography and axis-aligned scale params
    (from ops.warp.decompose_homography) -> (B, out, out, C) f32 crops
    (or (B, C, out, out) with planar_out). Gate with the same band_ok_v2
    bound on the residual as the two-op path."""
    b, src_h, src_w, n_ch = canvases.shape
    out_h, out_w = out_shape
    v_pad = ((out_h + 7) // 8) * 8
    u_pad = ((out_w + 7) // 8) * 8

    planar = jnp.transpose(canvases, (0, 3, 1, 2))   # dtype preserved
    scal = jnp.concatenate([
        residual.reshape(b, 9).astype(jnp.float32),
        scale.reshape(b, 4).astype(jnp.float32),
        extents.reshape(b, 2).astype(jnp.float32)], axis=1)

    kernel = functools.partial(
        _split_kernel, src_hw=(src_h, src_w), m=m, out_hw=(out_h, out_w),
        v_pad=v_pad, u_pad=u_pad, band=band, post_scale=post_scale,
        wdtype=wdtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_ch, src_h, src_w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_ch, out_h, out_w),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((v_pad, m), jnp.float32),             # Y
            pltpu.VMEM((u_pad, v_pad), jnp.float32),         # X_t
            pltpu.VMEM((n_ch, m, m), jnp.float32),           # stage-A out
            pltpu.VMEM((n_ch, v_pad, m), jnp.float32),       # inter
            pltpu.VMEM((n_ch, m, v_pad), jnp.float32),       # inter_t
            pltpu.VMEM((n_ch, u_pad, v_pad), jnp.float32),   # out_t
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_ch, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(scal, planar)
    if planar_out:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=('out_shape', 'interpret'))
def warp_batch_pallas(canvases, homographies, extents, out_shape,
                      interpret=False):
    """(B, H, W, 3) uint8/float canvases + (B, 3, 3) homographies ->
    (B, oh, ow, 3) float32 crops, one fused VMEM-resident kernel per sample.
    """
    b, src_h, src_w, _ = canvases.shape
    out_h, out_w = out_shape
    v_pad = ((out_h + 7) // 8) * 8

    planar = jnp.transpose(canvases, (0, 3, 1, 2)).astype(jnp.float32)
    homs = homographies.reshape(b, 9).astype(jnp.float32)
    exts = extents.reshape(b, 2).astype(jnp.float32)

    kernel = functools.partial(_warp_kernel, src_hw=(src_h, src_w),
                               out_hw=(out_h, out_w), v_pad=v_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # homs, exts: whole-array SMEM refs
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, src_h, src_w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, out_h, out_w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, src_w, v_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(homs, exts, planar)
    return jnp.transpose(out, (0, 2, 3, 1))
