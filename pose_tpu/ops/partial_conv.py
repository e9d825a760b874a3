"""Mask-propagating partial convolution (NVIDIA-style), TPU-native.

Re-implements the reference's PartialConv (partial_conv.py:6-58):

    mask_raw   = conv(mask_in, ones(kh, kw))            # coverage count
    multiplier = winsize / (mask_raw + 1e-6)
    mask_out   = clamp(mask_raw, 0, 1)
    multiplier = multiplier * mask_out
    raw        = conv(input * mask_in, W) [+ bias]
    out        = bias is None: raw * multiplier
                 else:        (raw - b) * multiplier + b, then * mask_out

The two convolutions run on the MXU via lax.conv_general_dilated (the mask
conv is single-channel and cheap); the renormalization chain — which the
reference executes as five separate CUDA elementwise kernels — runs as plain
jnp ops that XLA fuses into the surrounding convolution epilogues.

MEASURED: an alternative single-pass Pallas VMEM renorm kernel with a
hand-written VJP (kept below, use_pallas=True) HALVES config-4 throughput in
the full partial_depthnet train step — 514 vs 1039 img/s at bs64/257²/v5e —
because the opaque kernel boundary (plus the broadcast full-channel mask it
needs) defeats XLA's elementwise fusion, the same lesson as the fused-BN
experiment (ops/fused_bn.py). XLA is the default; the kernel remains as the
documented experiment with interpret-mode tests.

All reference call sites use bias-free convs (partial_depthnet.py:177,
:21-37); the bias branch exists for API completeness and runs on the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(raw_ref, maskraw_ref, out_ref, maskout_ref, mult_ref,
                *, winsize):
    mask_raw = maskraw_ref[:]
    multiplier = winsize / (mask_raw + 1e-6)
    mask_out = jnp.clip(mask_raw, 0.0, 1.0)
    multiplier = multiplier * mask_out
    out_ref[:] = raw_ref[:] * multiplier
    maskout_ref[:] = mask_out
    mult_ref[:] = multiplier


def _bwd_kernel(g_ref, mult_ref, draw_ref):
    draw_ref[:] = g_ref[:] * mult_ref[:]


def _block_call(kernel, n_in, n_out, rows, c, dtype, interpret):
    """Row-tiled elementwise pallas_call. The last block may be partial:
    out-of-range rows read garbage and their stores are dropped, which is
    safe here because both kernels are purely elementwise (no cross-row
    reduction). A whole-array block at production shapes (129^2 rows x 64ch
    f32 x 3 outputs = 16.08 MiB) exceeds the 16 MiB VMEM scope — seen as a
    compile-time OOM at the partial stem with side_in 257."""
    tile = max(8, min(rows, 512) // 8 * 8)
    spec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=((rows + tile - 1) // tile,),
        in_specs=[spec] * n_in,
        out_specs=tuple([spec] * n_out) if n_out > 1 else spec,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, c), dtype)
                        for _ in range(n_out)) if n_out > 1
        else jax.ShapeDtypeStruct((rows, c), dtype),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _renorm_pallas(raw, mask_raw_bc, winsize, interpret):
    (out, mask_out), _ = _renorm_pallas_fwd(raw, mask_raw_bc, winsize, interpret)
    return out, mask_out


def _renorm_pallas_fwd(raw, mask_raw_bc, winsize, interpret):
    b, h, w, c = raw.shape
    rows = b * h * w
    kernel = functools.partial(_fwd_kernel, winsize=float(winsize))
    out, mask_out, mult = _block_call(kernel, 2, 3, rows, c, raw.dtype,
                                      interpret)(
        raw.reshape(rows, c), mask_raw_bc.reshape(rows, c))
    shape = (b, h, w, c)
    return ((out.reshape(shape), mask_out.reshape(shape)),
            (mult, shape))


def _renorm_pallas_bwd(winsize, interpret, residuals, grads):
    mult, shape = residuals
    g_out, _ = grads  # mask_out carries no gradient (reference no_grad path)
    b, h, w, c = shape
    rows = b * h * w
    draw = _block_call(_bwd_kernel, 2, 1, rows, c, g_out.dtype, interpret)(
        g_out.reshape(rows, c), mult)
    return draw.reshape(shape), jnp.zeros(shape, g_out.dtype)


_renorm_pallas.defvjp(_renorm_pallas_fwd, _renorm_pallas_bwd)


def renormalize_xla(raw, mask_raw, winsize, bias=None):
    """Pure-XLA renormalization (also the CPU/test path)."""
    multiplier = winsize / (mask_raw + 1e-6)
    mask_out = jnp.clip(mask_raw, 0.0, 1.0)
    multiplier = jax.lax.stop_gradient(multiplier * mask_out)
    if bias is None:
        out = raw * multiplier
    else:
        bias = bias.reshape(1, 1, 1, -1)
        out = ((raw - bias) * multiplier + bias) * mask_out
    return out, jax.lax.stop_gradient(mask_out)


def partial_conv(x, mask, kernel, stride, padding, dilation=1, bias=None,
                 use_pallas=False):
    """Functional partial convolution.

    Args:
        x: (B, H, W, Cin) input features.
        mask: (B, H, W, 1) validity mask in {0, 1}.
        kernel: (kh, kw, Cin, Cout) conv weights (HWIO).
        stride, dilation: ints; padding: int (symmetric), matching the
            reference's Conv2d(padding=p).
    Returns:
        (out (B, H', W', Cout), mask_out (B, H', W', 1)).
    """
    kh, kw = kernel.shape[:2]
    winsize = kh * kw  # ones kernel is (1, 1, kh, kw): partial_conv.py:26-28
    strides = (stride, stride)
    pads = ((padding, padding), (padding, padding))
    dils = (dilation, dilation)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))

    ones = jnp.ones((kh, kw, 1, 1), x.dtype)
    mask_raw = jax.lax.stop_gradient(jax.lax.conv_general_dilated(
        mask.astype(x.dtype), ones, strides, pads, rhs_dilation=dils,
        dimension_numbers=dn))

    raw = jax.lax.conv_general_dilated(
        x * mask.astype(x.dtype), kernel, strides, pads, rhs_dilation=dils,
        dimension_numbers=dn)

    if use_pallas and bias is None and jax.default_backend() == 'tpu':
        mask_bc = jnp.broadcast_to(mask_raw, raw.shape)
        out, mask_out_c = _renorm_pallas(raw, mask_bc, winsize, False)
        mask_out = jax.lax.stop_gradient(mask_out_c[..., :1])
    else:
        out, mask_out = renormalize_xla(raw, mask_raw, winsize, bias)
    return out, mask_out
