"""Post-training int8 quantization for the serving path.

The v5e MXU runs int8 convolutions at ~2x the bf16 rate (measured on chip:
3x3 256->256 @33^2 bs128 = 0.474 ms int8 vs 0.893 ms bf16 = 1.89x, ~88% of
the 394-TOPS int8 peak — docs/ROUND3_NOTES.md). This module converts any
PoseResNet inference forward to int8 convs with no model-code changes and no
checkpoint surgery:

- weights: symmetric per-output-channel int8, scales derived from the
  checkpoint's own bf16/f32 kernels at trace time (constant-folded when the
  graph is exported with baked weights);
- activations: symmetric per-tensor int8 with scales CALIBRATED by running
  representative crops through the bf16 forward and recording each conv
  input's absmax;
- accumulation: int32 on the MXU (`preferred_element_type`), dequantized
  back to the compute dtype before the (bf16) BatchNorm/relu that follows.

Both passes are Flax method interceptors over `nn.Conv.__call__`
(`nn.intercept_methods`): calibration records per-conv-path input absmax as
traced scalars returned from the jitted forward; the quantized pass replaces
the conv body with quantize -> int8 `lax.conv_general_dilated` -> dequant.
Partial-conv variants keep their mask-renormalizing convs untouched (those
run through `ops.partial_conv`, not `nn.Conv`, and their renorm is
precision-sensitive); everything else — stems, stages, fusion block, heads —
quantizes uniformly, with an optional skip list (regressor heads stay bf16
by default: their logits feed the volumetric softmax directly, so head noise
moves decoded millimetres one-for-one, and the heads are <1% of the FLOPs).

The reference has no inference deployment path at all (training repo only);
this is a beyond-reference serving feature. Accuracy cost is measured in
decoded millimetres in tests/test_quant.py and docs/PERF.md.
"""

import json

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# regressor heads (rgb dual heads + the depth/fusion family's single head)
DEFAULT_SKIP = ('cam_regressor', 'mat_regressor', 'regressor')


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _conv_path(module):
    return '/'.join(module.path)


class Calibrator:
    """Streaming per-conv-path input-absmax calibration.

    Holds ONE jitted recording forward and a running max, so batches can be
    fed as they arrive (e.g. the serving CLI's first N request batches)
    without re-tracing per batch — through a remote-device transport a
    fresh trace per batch would pay a full compile each time. Feed with
    `update(batch)`, read `scales` when done (N-batch running-max
    calibration; VERDICT round-3 item 5)."""

    def __init__(self, apply_fn):
        records = {}

        def recorder(next_fun, args, kwargs, context):
            if (isinstance(context.module, nn.Conv)
                    and context.method_name == '__call__'):
                path = _conv_path(context.module)
                cur = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                prev = records.get(path)
                # max over CALL SITES too: a weight-shared conv module
                # applied twice per forward must calibrate on both inputs
                records[path] = cur if prev is None else jnp.maximum(prev,
                                                                     cur)
            return next_fun(*args, **kwargs)

        @jax.jit
        def fwd(*inputs):
            records.clear()       # per-trace recording dict; runs at trace
            with nn.intercept_methods(recorder):  # time only, so
                out = apply_fn(*inputs)           # same-shaped batches
            return out, dict(records)             # reuse one compile

        self._fwd = fwd
        self._totals = {}
        self.count = 0

    def update(self, batch):
        """Fold one input tuple into the running absmax."""
        _, seen = self._fwd(*batch)
        for path, val in jax.device_get(seen).items():
            self._totals[path] = max(self._totals.get(path, 0.0),
                                     float(val))
        self.count += 1
        return self

    @property
    def scales(self):
        if not self._totals:
            raise ValueError('calibration saw no nn.Conv calls — is the '
                             'model a partial-conv-only variant?')
        return dict(self._totals)


def calibrate(apply_fn, batches):
    """Per-conv-path input absmax over calibration batches.

    `apply_fn(*batch)` must run the model's inference forward (e.g. a
    closure over `model.apply(variables, ...)`); `batches` is an iterable of
    input tuples. Returns {conv_path: float_absmax}. The recording happens
    inside the traced forward, so one jitted execution per batch suffices —
    no eager per-op dispatch (which through a remote-device transport would
    pay one round trip per op).
    """
    cal = Calibrator(apply_fn)
    for batch in batches:
        cal.update(batch)
    return cal.scales


def quantize_kernel(kernel):
    """Symmetric per-out-channel int8 for one HWIO kernel: returns
    `(int8_kernel, float32_scales)` with `scales` shaped (out_channels,)."""
    kf = jnp.asarray(kernel).astype(jnp.float32)
    sw = jnp.maximum(
        jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def prequantize_params(params, absmax, skip=DEFAULT_SKIP,
                       dtype=jnp.bfloat16):
    """One-time weight quantization: replace every calibrated, non-skipped
    conv kernel in the params pytree with its int8 tensor (quantized from
    the `dtype`-cast kernel, matching what the interceptor would see inside
    a `dtype` forward) and return `(new_params, {path: per-channel scale})`.

    Doing this once at quantize time instead of inside the traced forward
    matters when the params are jit ARGUMENTS (the live `Predictor` path):
    argument-derived quantization cannot be constant-folded, so every
    inference call would re-run abs-max/round/clip over all ~25M kernel
    weights. Export with baked weights folds either way."""
    flat = flax.traverse_util.flatten_dict(params)
    out, wscales = {}, {}
    for key, val in flat.items():
        path = '/'.join(key[:-1])
        if (key[-1] == 'kernel' and path in absmax
                and key[-2] not in skip
                and jnp.issubdtype(jnp.asarray(val).dtype, jnp.floating)):
            wq, sw = quantize_kernel(jnp.asarray(val).astype(dtype))
            out[key] = wq
            wscales[path] = sw
        else:
            out[key] = val
    return flax.traverse_util.unflatten_dict(out), wscales


def make_interceptor(absmax, skip=DEFAULT_SKIP, wscales=None,
                     acc_dtype=jnp.int32):
    """A Flax method interceptor replacing every calibrated `nn.Conv` with
    quantize -> int8 MXU conv -> dequant. Convs whose path is missing from
    `absmax`, or whose final path component is in `skip`, run unchanged.
    A kernel that is ALREADY int8 (see `prequantize_params`) is used as-is
    with its scale looked up in `wscales`.

    `acc_dtype` is the conv's materialized output dtype
    (`preferred_element_type`). int32 is the exact MXU accumulator;
    bfloat16 halves the HBM bytes the dequant/requant chain reads back
    (measured the serving Amdahl limiter, docs/experiments/
    r3_serve_profile.log) at the cost of rounding the int32 accumulator
    to 8 mantissa bits on output."""

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if not isinstance(m, nn.Conv) or context.method_name != '__call__':
            return next_fun(*args, **kwargs)
        path = _conv_path(m)
        if path not in absmax or path.rsplit('/', 1)[-1] in skip:
            return next_fun(*args, **kwargs)
        x = args[0]
        # fail LOUDLY on nn.Conv attributes the int8 body does not
        # replicate — a silent mismatch would compute a different conv
        if m.input_dilation not in (None, 1) and tuple(
                _pair(m.input_dilation)) != (1, 1):
            raise NotImplementedError(
                f'int8 interceptor: input_dilation at {path!r}')
        if isinstance(m.padding, str) and m.padding not in (
                'SAME', 'VALID', 'SAME_LOWER'):
            raise NotImplementedError(
                f'int8 interceptor: padding {m.padding!r} at {path!r}')
        if getattr(m, 'mask', None) is not None:
            raise NotImplementedError(
                f'int8 interceptor: masked convolution at {path!r} (the '
                'int8 body would silently convolve the unmasked kernel)')
        kernel = m.scope.get_variable('params', 'kernel')    # HWIO
        bias = m.scope.get_variable('params', 'bias') if m.use_bias else None

        # symmetric per-tensor activation scale (calibrated), per-out-channel
        # weight scales (from the checkpoint kernel; constant-folded when the
        # kernel is a baked export constant, precomputed by
        # prequantize_params when it is a runtime argument)
        sx = jnp.float32(max(absmax[path], 1e-12) / 127.0)
        if kernel.dtype == jnp.int8:
            if wscales is None or path not in wscales:
                raise ValueError(f'int8 kernel at {path!r} but no '
                                 'prequantized weight scale was provided')
            wq, sw = kernel, wscales[path]
        else:
            wq, sw = quantize_kernel(kernel)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        # normalize padding the way flax canonicalizes it for the float
        # conv: strings pass through; a bare int pads both dims; a per-dim
        # sequence may mix ints (symmetric) and (low, high) pairs —
        # lax.conv_general_dilated accepts ONLY strings or pair sequences,
        # so e.g. flax-legal padding=(1, 1) must become ((1, 1), (1, 1))
        pad = m.padding
        if not isinstance(pad, str):
            if isinstance(pad, int):
                pad = ((pad, pad), (pad, pad))
            else:
                pad = tuple((p, p) if isinstance(p, int) else tuple(p)
                            for p in pad)
        y = lax.conv_general_dilated(
            xq, wq, window_strides=_pair(m.strides or 1), padding=pad,
            rhs_dilation=_pair(m.kernel_dilation or 1),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=m.feature_group_count,
            preferred_element_type=acc_dtype)
        y = y.astype(jnp.float32) * (sx * sw)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)

    return interceptor


def quantized_call(apply_fn, absmax, skip=DEFAULT_SKIP, wscales=None,
                   acc_dtype=jnp.int32):
    """Wrap an inference forward so its convs run int8 (jit-compatible)."""

    def fwd(*inputs):
        with nn.intercept_methods(
                make_interceptor(absmax, skip, wscales, acc_dtype)):
            return apply_fn(*inputs)

    return fwd


def save_scales(path, absmax):
    with open(path, 'w') as f:
        json.dump({k: float(v) for k, v in absmax.items()}, f, indent=0,
                  sort_keys=True)


def load_scales(path):
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}
