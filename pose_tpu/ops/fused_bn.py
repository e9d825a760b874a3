"""Fused training-mode BatchNorm as Pallas TPU kernels.

MEASURED NEGATIVE RESULT (v5e, bs64 bf16, fwd+bwd per layer; kept opt-in via
POSE_TPU_BN=pallas, default stays nn.BatchNorm):

    shape                  XLA        these kernels
    (64,129,129, 64)      4.66 ms       43.5 ms
    (64, 65, 65, 64)      1.55 ms        3.8 ms
    (64, 65, 65,256)      2.75 ms        5.3 ms

XLA:TPU's decomposed-BN fusion already sits within ~2-3x of the HBM roofline
and these streaming kernels lose to it on per-grid-step DMA overhead, so the
7.8 ms/step batch-statistics tax measured by the frozen-BN ablation
(docs/ROUND1_NOTES.md) is dominated by *irreducible* reduction traffic, not
missing fusion. Revisit only with a conv-epilogue-level design.

Background: training BN is a fusion barrier for XLA — the batch statistics
force a full reduction pass over the conv output before the normalize pass,
and the backward needs two more channel reductions (sum dy, sum dy*xhat)
before dx. These kernels pin the pass count at the bandwidth minimum and
additionally fold the block-tail elementwise ops (residual add + ReLU) into
the same VMEM pass so switching BN out of XLA does not *add* elementwise
traffic:

- forward:  stats kernel (read x once -> per-channel sum/sumsq held resident
            in VMEM, written back once) + apply kernel (read x [+residual]
            once, write y once, ReLU folded).
- backward: reduction kernel (read dy [+y for the ReLU mask] + x once ->
            sum dy, sum dy*(x-mean)) + dx kernel (read dy/x [+y] once, write
            dx [+dres] once). dx is expressed as an affine map
            c1*dy + c2*x + c3 with (1, C) coefficients computed in XLA.

Semantics match flax nn.BatchNorm(momentum=0.9, eps) in train mode, i.e. the
reference's torch BatchNorm2d (resnet.py:141-148): biased batch variance for
normalization; the running-stat update stays in the caller.

The (y, mean, var) triple is the primal output; the custom VJP ignores
cotangents on mean/var (they feed only the stop-gradient running-stat
update), while the y path carries the full statistics gradient.

Numerics: all accumulation and normalization math is f32 regardless of the
(typically bf16) activation dtype; y/dx are cast back to the input dtype.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret():
    return jax.default_backend() != 'tpu'


def _cdiv(a, b):
    return (a + b - 1) // b


def _pick_bm(c, m):
    """Rows per block: ~1 MiB of f32 work per operand, sublane-aligned."""
    bm = max(8, min(2048, (1 << 20) // (c * 4)))
    bm = (bm // 8) * 8
    return min(bm, max(8, ((m + 7) // 8) * 8))


def _row_mask(i, bm, m_total, shape):
    """Boolean in-range mask; OOB rows of a partial last block may read as
    garbage/NaN, so callers must jnp.where them out (0*NaN is NaN)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * bm
    return rows < m_total


# ------------------------------------------------------------------ forward


def _stats_kernel(x_ref, sums_ref, *, bm, m_total):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    xb = x_ref[...].astype(jnp.float32)
    xb = jnp.where(_row_mask(i, bm, m_total, xb.shape), xb, 0.0)
    sums_ref[0, :] += jnp.sum(xb, axis=0)
    sums_ref[1, :] += jnp.sum(xb * xb, axis=0)


def _apply_kernel(scale_ref, shift_ref, x_ref, *rest, relu, has_res):
    if has_res:
        res_ref, y_ref = rest
    else:
        (y_ref,) = rest
    y = x_ref[...].astype(jnp.float32) * scale_ref[0, :] + shift_ref[0, :]
    if has_res:
        y = y + res_ref[...].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    y_ref[...] = y.astype(y_ref.dtype)


def _channel_sums(x, bm, grid):
    m, c = x.shape
    return pl.pallas_call(
        functools.partial(_stats_kernel, bm=bm, m_total=m),
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=_interpret(),
    )(x)


def _fused_bn_fwd_impl(x, gamma, beta, residual, eps, relu):
    c = x.shape[-1]
    xm = x.reshape(-1, c)
    m = xm.shape[0]
    bm = _pick_bm(c, m)
    grid = _cdiv(m, bm)

    sums = _channel_sums(xm, bm, grid)
    mean = sums[0] / m
    var = sums[1] / m - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    scale = gamma.astype(jnp.float32) * rstd
    shift = beta.astype(jnp.float32) - mean * scale

    has_res = residual is not None
    ins = [scale[None], shift[None], xm]
    in_specs = [
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((bm, c), lambda i: (i, 0)),
    ]
    if has_res:
        ins.append(residual.reshape(-1, c))
        in_specs.append(pl.BlockSpec((bm, c), lambda i: (i, 0)))
    y = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu, has_res=has_res),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=_interpret(),
    )(*ins)
    return y.reshape(x.shape), mean, var, rstd


# ----------------------------------------------------------------- backward


def _bwd_sums_kernel(mean_ref, *refs, bm, m_total, relu):
    if relu:
        x_ref, dy_ref, y_ref, sums_ref = refs
    else:
        x_ref, dy_ref, sums_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    mask = _row_mask(i, bm, m_total, dy_ref.shape)
    dy = jnp.where(mask, dy_ref[...].astype(jnp.float32), 0.0)
    if relu:
        dy = dy * (y_ref[...].astype(jnp.float32) > 0.0)
    xc = jnp.where(mask, x_ref[...].astype(jnp.float32) - mean_ref[0, :], 0.0)
    sums_ref[0, :] += jnp.sum(dy, axis=0)
    sums_ref[1, :] += jnp.sum(dy * xc, axis=0)


def _dx_kernel(c1_ref, c2_ref, c3_ref, *refs, relu, has_res):
    if relu:
        x_ref, dy_ref, y_ref = refs[:3]
        rest = refs[3:]
    else:
        x_ref, dy_ref = refs[:2]
        rest = refs[2:]
    if has_res:
        dx_ref, dres_ref = rest
    else:
        (dx_ref,) = rest
    dy = dy_ref[...].astype(jnp.float32)
    if relu:
        dy = dy * (y_ref[...].astype(jnp.float32) > 0.0)
    if has_res:
        dres_ref[...] = dy.astype(dres_ref.dtype)
    dx = (c1_ref[0, :] * dy + c2_ref[0, :] * x_ref[...].astype(jnp.float32)
          + c3_ref[0, :])
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _fused_bn_bwd_impl(x, gamma, mean, rstd, y, dy, eps, relu, has_res):
    c = x.shape[-1]
    xm = x.reshape(-1, c)
    dym = dy.reshape(-1, c)
    m = xm.shape[0]
    bm = _pick_bm(c, m)
    grid = _cdiv(m, bm)

    blk = pl.BlockSpec((bm, c), lambda i: (i, 0))
    vec = pl.BlockSpec((1, c), lambda i: (0, 0))

    ins = [mean[None], xm, dym]
    in_specs = [vec, blk, blk]
    if relu:
        ins.append(y.reshape(-1, c))
        in_specs.append(blk)
    sums = pl.pallas_call(
        functools.partial(_bwd_sums_kernel, bm=bm, m_total=m, relu=relu),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=_interpret(),
    )(*ins)

    sum_dy = sums[0]
    sum_dy_xhat = sums[1] * rstd
    gamma32 = gamma.astype(jnp.float32)
    a = gamma32 * rstd
    c2 = -a * rstd * sum_dy_xhat / m
    c3 = a * (rstd * sum_dy_xhat * mean - sum_dy) / m

    ins = [a[None], c2[None], c3[None], xm, dym]
    in_specs = [vec, vec, vec, blk, blk]
    if relu:
        ins.append(y.reshape(-1, c))
        in_specs.append(blk)
    out_specs = [blk]
    out_shapes = [jax.ShapeDtypeStruct((m, c), x.dtype)]
    if has_res:
        out_specs.append(blk)
        out_shapes.append(jax.ShapeDtypeStruct((m, c), x.dtype))
    out = pl.pallas_call(
        functools.partial(_dx_kernel, relu=relu, has_res=has_res),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*ins)
    dx = out[0].reshape(x.shape)
    dres = out[1].reshape(x.shape) if has_res else None
    dgamma = (sum_dy_xhat).astype(gamma.dtype)
    dbeta = sum_dy.astype(gamma.dtype)
    return dx, dgamma, dbeta, dres


# ---------------------------------------------------------------- custom vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_batch_norm(x, gamma, beta, residual, eps=1e-5, relu=False):
    """Training-mode BN: y = relu?(gamma*(x-mean)/sqrt(var+eps)+beta [+res]).

    residual may be None. Returns (y, mean, var) with *biased* var; mean/var
    cotangents are treated as zero in the VJP (they only feed the
    stop-gradient running-stat update).
    """
    y, mean, var, _ = _fused_bn_fwd_impl(x, gamma, beta, residual, eps, relu)
    return y, mean, var


def _fbn_fwd(x, gamma, beta, residual, eps, relu):
    y, mean, var, rstd = _fused_bn_fwd_impl(x, gamma, beta, residual, eps,
                                            relu)
    keep_y = y if relu else None
    # structural None marker: `has_res` must stay a static Python bool in the
    # bwd trace, so encode it in the pytree structure, not as a leaf
    res_marker = None if residual is None else ()
    return (y, mean, var), (x, gamma, mean, rstd, keep_y, res_marker)


def _fbn_bwd(eps, relu, res, cots):
    x, gamma, mean, rstd, y, res_marker = res
    has_res = res_marker is not None
    dy = cots[0]  # mean/var cotangents: zero by contract (see docstring)
    dx, dgamma, dbeta, dres = _fused_bn_bwd_impl(x, gamma, mean, rstd, y, dy,
                                                 eps, relu, has_res)
    return dx, dgamma, dbeta, dres


fused_batch_norm.defvjp(_fbn_fwd, _fbn_bwd)


# --------------------------------------------------------------- flax module


class FusedBatchNorm(nn.Module):
    """Drop-in nn.BatchNorm replacement running the fused kernels in train
    mode, with the block-tail residual add and ReLU foldable into the same
    pass. Param ('scale'/'bias') and batch_stats ('mean'/'var') naming and
    init match nn.BatchNorm so checkpoint conversion (models/convert.py) and
    torch parity are unchanged.

    Eval mode is the plain affine map in jnp (XLA fuses it into neighbors,
    which is already optimal); only training-mode statistics benefit from the
    Pallas path.
    """
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    relu: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        c = x.shape[-1]
        scale = self.param('scale', jax.nn.initializers.ones, (c,))
        bias = self.param('bias', jax.nn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average or self.is_initializing():
            mul = scale.astype(jnp.float32) * jax.lax.rsqrt(
                ra_var.value + self.epsilon)
            y = (x.astype(jnp.float32) - ra_mean.value) * mul \
                + bias.astype(jnp.float32)
            if residual is not None:
                y = y + residual.astype(jnp.float32)
            if self.relu:
                y = jnp.maximum(y, 0.0)
            return y.astype(x.dtype)

        y, mean, var = fused_batch_norm(x, scale, bias, residual,
                                        self.epsilon, self.relu)
        # torch BatchNorm2d folds the UNBIASED variance into running_var
        # (ops/batchnorm.py rationale); normalization above stays biased
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / (n - 1)) if n > 1 else var
        ra_mean.value = self.momentum * ra_mean.value \
            + (1.0 - self.momentum) * mean
        ra_var.value = self.momentum * ra_var.value \
            + (1.0 - self.momentum) * unbiased
        return y
