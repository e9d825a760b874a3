"""Pallas stem convolution (7x7 stride-2, 4->64) — MEASURED NEGATIVE
RESULT, kept as a tested reference point; the trunk stays on XLA's conv.

Motivation: XLA's NHWC conv pads the 4 input channels onto 128 lanes, so
the stem moves ~32x more VREG data than the tensor holds (measured
2.17 ms fwd + 2.26 ms filter-grad at bs128/257^2 on v5e — ~4% of the
honest train step, r2_perf20; the input-gradient is never needed since
the image is data).

Verdict (r2_perf21, real chip): bit-exact vs the XLA conv (maxdiff 0.0)
but **15.4 ms vs 2.1 ms — 7x slower**. The 196 per-tap patch copies are
each STATIC but sublane/lane-MISALIGNED (offsets kh//2, kw//2 in
{1, 2, 3}), and every misaligned slice costs a VREG relayout — extending
the round-2 kernel-pricing rule: not just dynamic offsets, *any*
non-tile-aligned access prices a TPU Pallas kernel. A 7x7/2 conv is
misaligned in both axes by construction, which is exactly the relayout
work XLA's conv emitter already does with register-level control Mosaic
does not expose. Dead ends measured for the stem so far: space-to-depth
(20.9 ms, r2_perf2), tap-einsum filter-grad (86.5 ms, r2_perf20), this
kernel (15.4 ms).

Design (kernel lessons from the split warp, docs/ROUND2_NOTES.md): the
kernel reads an aligned (4, 24, Wp) *channel-planar* row block per 8-row
output tile, deinterleaves row/column parity ONCE via four tiny 0/1
selection dots (stride-2 taps then become STATIC slices — no strided
vector accesses anywhere), builds the 196-row patch tensor P3
(tap-major, matching w.reshape(196, 64)) with static block copies, and
contracts output rows on the MXU: out_row (64, Wh) = w (196, 64) .T@
P3[:, r, :]. Output is written NHWC, so the trunk consumes it directly.

Reference stem being replaced: resnet.py:27 (conv1 7x7/2) — numerics are
the same bf16 conv the XLA path runs under -half_acc.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plan(side_in):
    """Static geometry: output side, tile count, padded planar input size.
    side_in odd (reference crops are 2^k + 1)."""
    oh = (side_in + 2 * 3 - 7) // 2 + 1
    tiles = (oh + 7) // 8
    hp = 16 * (tiles - 1) + 24
    wh = oh + 4                     # deinterleaved half-width incl. taps
    wp = 2 * wh                     # padded planar width (even)
    return oh, tiles, hp, wp, wh


def pad_planar(x_planar, side_in):
    """(B, 4, S, S) -> (B, 4, Hp, Wp) zero-padded with the conv's 3-pixel
    border at offset (3, 3)."""
    _, tiles, hp, wp, _ = plan(side_in)
    b, c, s, _ = x_planar.shape
    return jnp.pad(x_planar,
                   ((0, 0), (0, 0), (3, hp - s - 3), (3, wp - s - 3)))


def _stem_kernel(x_ref, w_ref, out_ref, xe_ref, xo_ref, pl_ref, p3_ref,
                 *, wh, oh, n_ci):
    """One (image, 8-row-tile) grid step. The whole padded image block
    stays resident across its 17 tile steps (index map constant in t);
    the 24-row window is an 8-aligned dynamic slice (16*t)."""
    wp = x_ref.shape[3]
    t = pl.program_id(1)
    xb = x_ref[0, :, pl.dslice(16 * t, 24), :].astype(
        jnp.bfloat16)                              # (n_ci, 24, Wp)

    # column deinterleave via 0/1 selection dots (MXU): E[p, j] = (p == 2j)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (wp, wh), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (wp, wh), 1)
    esel = (pcol == 2 * jcol).astype(jnp.bfloat16)
    osel = (pcol == 2 * jcol + 1).astype(jnp.bfloat16)
    flat = xb.reshape(n_ci * 24, wp)
    xe_ref[...] = jax.lax.dot_general(
        flat, esel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(
        jnp.bfloat16).reshape(n_ci, 24, wh)
    xo_ref[...] = jax.lax.dot_general(
        flat, osel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(
        jnp.bfloat16).reshape(n_ci, 24, wh)

    # row deinterleave, same trick: R[i, p] = (p == 2i [+1])
    irow = jax.lax.broadcasted_iota(jnp.int32, (12, 24), 0)
    prow = jax.lax.broadcasted_iota(jnp.int32, (12, 24), 1)
    re_sel = (prow == 2 * irow).astype(jnp.bfloat16)
    ro_sel = (prow == 2 * irow + 1).astype(jnp.bfloat16)
    for ci in range(n_ci):
        for cp, src in ((0, xe_ref), (1, xo_ref)):
            half = src[ci]                        # (24, Wh)
            pl_ref[0, cp, ci] = jax.lax.dot_general(
                re_sel, half, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            pl_ref[1, cp, ci] = jax.lax.dot_general(
                ro_sel, half, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # patch tensor: P3[(kh*7+kw)*n_ci + ci] = plane rows kh//2..+8, cols
    # shifted kw//2 (static everything). Garbage tail lanes beyond the
    # valid width never reach the output slice.
    for kh in range(7):
        for kw in range(7):
            for ci in range(n_ci):
                t = (kh * 7 + kw) * n_ci + ci
                src = pl_ref[kh % 2, kw % 2, ci]   # (12, Wh)
                width = wh - kw // 2
                p3_ref[t, :, :width] = src[kh // 2:kh // 2 + 8, kw // 2:]

    # contract each output row on the MXU and emit NHWC
    w = w_ref[...]                                 # (196, 64) bf16
    for r in range(8):
        row = jax.lax.dot_general(
            w, p3_ref[:, r, :], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (64, Wh)
        out_ref[0, r, :, :] = jnp.transpose(row)[:out_ref.shape[2], :]


@functools.partial(jax.jit, static_argnames=('side_in', 'interpret'))
def stem_conv_fwd(x_padded, w, side_in, interpret=False):
    """x_padded: (B, 4, Hp, Wp) planar bf16 (pad_planar); w: (7, 7, 4, 64).
    Returns (B, OH, OH, 64) f32 NHWC — bit-comparable to the XLA bf16 conv
    up to accumulation order."""
    b, n_ci, hp, wp = x_padded.shape
    oh, tiles, hp_want, wp_want, wh = plan(side_in)
    assert (hp, wp) == (hp_want, wp_want), (hp, wp, hp_want, wp_want)
    wmat = w.reshape(49 * n_ci, 64).astype(jnp.bfloat16)

    kernel = functools.partial(_stem_kernel, wh=wh, oh=oh, n_ci=n_ci)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, n_ci, hp, wp), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49 * n_ci, 64), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, oh, 64), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_ci, 24, wh), jnp.bfloat16),       # xe
            pltpu.VMEM((n_ci, 24, wh), jnp.bfloat16),       # xo
            pltpu.VMEM((2, 2, n_ci, 12, wh), jnp.bfloat16),  # parity planes
            pltpu.VMEM((49 * n_ci, 8, wh), jnp.bfloat16),   # P3
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8 * tiles, oh, 64), jnp.float32),
        interpret=interpret,
    )(x_padded, wmat)
    return out[:, :oh]
