"""Fully-fused Pallas perspective-warp kernel (experimental alternative).

The XLA two-pass matmul warp (ops.warp.warp_batch_mxu) is HBM-bound: its
banded weight matrices cost ~8 GB of traffic per batch-64. This kernel keeps
the whole sample resident in VMEM — source canvas, intermediate and output —
and regenerates the hat weights on the VPU per scanline, so HBM sees only the
canvas read and the crop write (~60 MB/batch).

Status (v5e, batch 64, 384²→257²): correct (matches the MXU path within its
bf16 weight tolerance) but 43 ms vs the MXU path's 9.5 ms — the full-height
scanline loop spends ~99% of its VPU FMAs on zero hat-weights. Making it win
requires band-limiting each scanline to the ~2-tap support per output tile
(planned: v/x tiling with per-tile dynamic band start); until then
warp_batch_mxu remains the production path.

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
