"""Fully-fused Pallas perspective-warp kernel (experimental alternative).

The XLA two-pass matmul warp (ops.warp.warp_batch_mxu) is HBM-bound: its
banded weight matrices cost ~8 GB of traffic per batch-64. This kernel keeps
the whole sample resident in VMEM — source canvas, intermediate and output —
and regenerates the hat weights on the VPU per scanline, so HBM sees only the
canvas read and the crop write (~60 MB/batch).

Status (v5e, batch 64, 384²→257²):
- warp_batch_pallas (full scanlines): correct, 43 ms — ~99% of VPU FMAs land
  on zero hat-weights.
- warp_batch_pallas_banded: correct (validated vs the gather and MXU paths on
  TPU), 8.2 ms at band=64 / 6.7 ms at band=32, vs 9.5 ms for the MXU matmul
  path. The band-start estimate assumes near-upright transforms; callers gate
  with `pallas_band_ok` (conservative) and fall back to warp_batch_mxu.
  warp_batch_mxu remains the default production path — the ~1-3 ms gain does
  not yet justify the host-side gating in the loader; revisit when the train
  step (56 ms) stops dominating.

Same two-pass (Catmull-Smith) semantics as _warp_single_mxu: pass 1 resamples
columns at Y(v, x_s), pass 2 resamples rows at X(u, v); zero border beyond
the per-sample extent.

Layout notes:
- channel-planar (B, 3, S, S): every VPU op is a clean 2-D (sublane, lane)
  tile; channels in the minor dim would waste 125/128 lanes.
- pass 2 accumulates transposed (out_w, v) so its scanline reads slice the
  *sublane* dim (cheap dynamic addressing); a lane-dim dynamic slice per
  iteration would serialize.
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


def _banded_kernel(hom_ref, ext_ref, src_ref, out_ref, y_ref, xt_ref,
                   inter_ref, intert_ref, outt_ref, *, src_hw, out_hw,
                   v_pad, u_pad, band):
    """Band-limited variant: each source scanline updates only the ~band
    output rows whose hat weights can be nonzero (the resampling is locally
    supported: 2 taps + the shear spread across the tile width). The band
    start comes from the scanline's inverse-map slope; callers must gate on
    `pallas_band_ok` — a violated band silently drops weight."""
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

    def y_scalar(vf, xf):
        denom_u = h00 - h20 * xf
        u_of = (xf * (h21 * vf + h22) - h01 * vf - h02) / denom_u
        w_h = h20 * u_of + h21 * vf + h22
        return (h10 * u_of + h11 * vf + h12) / w_h

    # precompute the full inverse maps once (cheap: one pass each)
    v = jax.lax.broadcasted_iota(jnp.int32, (v_pad, src_w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (v_pad, src_w), 1).astype(jnp.float32)
    denom_u = h00 - h20 * xs
    u_of = (xs * (h21 * v + h22) - h01 * v - h02) / denom_u
    w_h = h20 * u_of + h21 * v + h22
    Y = (h10 * u_of + h11 * v + h12) / w_h
    y_ref[:, :] = jnp.where(jnp.isfinite(Y), Y, -1e9)

    for c in range(3):
        inter_ref[c, :, :] = jnp.zeros((v_pad, src_w), jnp.float32)

    # per-scanline band start from the inverse slope at mid-image
    xm = jnp.float32(src_w // 2)
    y0 = y_scalar(jnp.float32(0), xm)
    slope = (y_scalar(jnp.float32(8), xm) - y0) / 8.0

    def pass1_body(sy, _):
        syf = sy.astype(jnp.float32)
        v_c = (syf - y0) / slope
        # dynamic sublane offsets must be 8-aligned for multi-tile loads
        vlo = jnp.clip(v_c.astype(jnp.int32) - band // 2, 0, v_pad - band)
        vlo = (vlo // 8) * 8
        yb = y_ref[pl.ds(vlo, band), :]
        w = _tri(yb - syf) * jnp.where(syf <= eh - 1, 1.0, 0.0)
        for c in range(3):
            row = src_ref[0, c, pl.ds(sy, 1), :].astype(jnp.float32)
            inter_ref[c, pl.ds(vlo, band), :] = (
                inter_ref[c, pl.ds(vlo, band), :] + w * row)
        return 0

    jax.lax.fori_loop(0, src_h, pass1_body, 0)

    for c in range(3):
        intert_ref[c, :, :] = jnp.transpose(inter_ref[c, :, :])

    # pass 2 (transposed accumulation), banded over u; rows are padded to
    # u_pad so the 8-aligned band clamp can still cover the last column
    u_t = jax.lax.broadcasted_iota(jnp.int32, (u_pad, v_pad), 0).astype(jnp.float32)
    v_t = jax.lax.broadcasted_iota(jnp.int32, (u_pad, v_pad), 1).astype(jnp.float32)
    w_x = h20 * u_t + h21 * v_t + h22
    X_t = (h00 * u_t + h01 * v_t + h02) / w_x
    xt_ref[:, :] = jnp.where(jnp.isfinite(X_t), X_t, -1e9)

    for c in range(3):
        outt_ref[c, :, :] = jnp.zeros((u_pad, v_pad), jnp.float32)

    vm = jnp.float32(out_h // 2)

    def x_scalar(uf, vf):
        return (h00 * uf + h01 * vf + h02) / (h20 * uf + h21 * vf + h22)

    x0 = x_scalar(jnp.float32(0), vm)
    slope2 = (x_scalar(jnp.float32(8), vm) - x0) / 8.0

    def pass2_body(sx, _):
        sxf = sx.astype(jnp.float32)
        u_c = (sxf - x0) / slope2
        ulo = jnp.clip(u_c.astype(jnp.int32) - band // 2, 0, u_pad - band)
        ulo = (ulo // 8) * 8
        xb = xt_ref[pl.ds(ulo, band), :]
        w2 = _tri(xb - sxf) * jnp.where(sxf <= ew - 1, 1.0, 0.0)
        for c in range(3):
            col = intert_ref[c, pl.ds(sx, 1), :]
            outt_ref[c, pl.ds(ulo, band), :] = (
                outt_ref[c, pl.ds(ulo, band), :] + w2 * col)
        return 0

    jax.lax.fori_loop(0, src_w, pass2_body, 0)

    for c in range(3):
        out_ref[0, c, :, :] = jnp.transpose(outt_ref[c, :, :])[:out_h, :out_w]


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
    out_h, out_w = out_hw
    n_ch = src_ref.shape[1]

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

    def y_scalar(vf, xf):
        denom_u = h00 - h20 * xf
        u_of = (xf * (h21 * vf + h22) - h01 * vf - h02) / denom_u
        w_h = h20 * u_of + h21 * vf + h22
        return (h10 * u_of + h11 * vf + h12) / w_h

    # full inverse row map, one vectorized pass (as v1)
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
        blocks = [src_ref[0, c, pl.ds(vlo, block), :].astype(jnp.float32)
                  for c in range(n_ch)]
        top = eh - vlo.astype(jnp.float32)   # taps at >= top are padding

        accs = [jnp.zeros((8, src_w), jnp.float32) for _ in range(3)]
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

        accs = [jnp.zeros((8, v_pad), jnp.float32) for _ in range(3)]
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
        slope = (y_at(hh, 8.0, xm) - y_at(hh, 0.0, xm)) / 8.0
        slope2 = (x_at(hh, 8.0, vm) - x_at(hh, 0.0, vm)) / 8.0
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


def pallas_band_ok(homographies, src_hw, out_hw, band=64, margin=12):
    """Host-side gate for the banded kernel: True when every sample's inverse
    maps are monotone with bounded band support. numpy, O(B) scalars."""
    import numpy as np

    h = np.asarray(homographies, np.float64)
    src_h, src_w = src_hw
    out_h, out_w = out_hw

    def y_at(hh, vf, xf):
        denom_u = hh[0, 0] - hh[2, 0] * xf
        if abs(denom_u) < 1e-9:
            return np.nan
        u_of = (xf * (hh[2, 1] * vf + hh[2, 2]) - hh[0, 1] * vf
                - hh[0, 2]) / denom_u
        w_h = hh[2, 0] * u_of + hh[2, 1] * vf + hh[2, 2]
        return (hh[1, 0] * u_of + hh[1, 1] * vf + hh[1, 2]) / w_h

    def x_at(hh, uf, vf):
        return ((hh[0, 0] * uf + hh[0, 1] * vf + hh[0, 2])
                / (hh[2, 0] * uf + hh[2, 1] * vf + hh[2, 2]))

    half = band // 2 - margin
    for hh in h:
        xm = src_w // 2
        y0 = y_at(hh, 0.0, xm)
        slope = (y_at(hh, 8.0, xm) - y0) / 8.0
        if not np.isfinite(slope) or slope <= 1e-3:
            return False
        # worst deviation of the true band center from the linear estimate
        for vf in (0.0, out_h / 2, out_h - 1.0):
            for xf in (0.0, src_w - 1.0):
                yv = y_at(hh, vf, xf)
                if not np.isfinite(yv):
                    return False
                v_est = (yv - y0) / slope
                if abs(v_est - vf) + 2.0 / slope > half:
                    return False
        vm = out_h // 2
        x0 = x_at(hh, 0.0, vm)
        slope2 = (x_at(hh, 8.0, vm) - x0) / 8.0
        if not np.isfinite(slope2) or slope2 <= 1e-3:
            return False
        for uf in (0.0, out_w - 1.0):
            for vf in (0.0, out_h - 1.0):
                xv = x_at(hh, uf, vf)
                u_est = (xv - x0) / slope2
                if abs(u_est - uf) + 2.0 / slope2 > half:
                    return False
    return True


@functools.partial(jax.jit, static_argnames=('out_shape', 'interpret',
                                             'band', 'version', 'planar_in',
                                             'planar_out'))
def warp_batch_pallas_banded(canvases, homographies, extents, out_shape,
                             band=64, interpret=False, version=1,
                             planar_in=False, planar_out=False):
    """Band-limited fused warp; gate with pallas_band_ok (version=1,
    source-scanline iteration) or band_ok_v2 (version=2, output-tile
    iteration — faster, see _banded_kernel_v2). planar_in=True takes
    (B, C, H, W) f32 directly (the split warp's stage A emits this),
    skipping the NHWC transpose. version=2 is channel-generic (RGB crops
    C=3, raw-depth crops C=1); version=1 requires C=3."""
    if planar_in:
        b, n_ch, src_h, src_w = canvases.shape
        planar = canvases.astype(jnp.float32)
    else:
        b, src_h, src_w, n_ch = canvases.shape
        planar = jnp.transpose(canvases, (0, 3, 1, 2)).astype(jnp.float32)
    assert version == 2 or n_ch == 3, 'v1 kernel is 3-channel only'
    out_h, out_w = out_shape
    v_pad = ((out_h + 7) // 8) * 8

    homs = homographies.reshape(b, 9).astype(jnp.float32)
    exts = extents.reshape(b, 2).astype(jnp.float32)

    u_pad = ((out_w + 7) // 8) * 8
    kernel = functools.partial(
        _banded_kernel if version == 1 else _banded_kernel_v2,
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
