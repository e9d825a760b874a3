"""r3_int8acc: can a narrower int8-conv output dtype cut the serving
Amdahl limiter?

r3_serve_profile.log showed the int8 serving step's elementwise
quant/requant fusions (~14 ms/batch of the 17 ms step) sitting at the HBM
bandwidth floor of READING the int32 conv outputs (4 B/elt). If the conv
can emit bfloat16 (`preferred_element_type=bfloat16`) at the int8 MXU rate,
the requant chain reads 2 B/elt instead — worth ~40% of the elementwise
time — at the cost of rounding the int32 accumulator to 8 mantissa bits.

Measures on the real chip:
  1. micro conv (3x3 256->256 @33^2 bs128, the r3_int8probe shape):
     int8 in / {int32, bf16, f32} out timings vs the bf16 conv.
  2. micro accuracy: bf16-out vs int32-out accumulator deltas.
  3. end-to-end flagship serving step (rgb joint_space resnet50 @257 bs128):
     bf16 / int8-i32 / int8-bf16acc pipelined throughput + decoded-mm delta.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pose_tpu import serve
from pose_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
BS = 128


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, args, label, iters=30):
    out = None
    for _ in range(5):
        out = fn(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt * 1e3:.3f} ms', flush=True)
    return dt


def micro():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (BS, 33, 33, 256)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 256, 256)), jnp.int8)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def conv(pt):
        return jax.jit(lambda a, b: lax.conv_general_dilated(
            a, b, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=pt))

    time_fn(conv(jnp.bfloat16), (xb, wb), 'micro conv bf16xbf16->bf16')
    time_fn(conv(jnp.int32), (x, w), 'micro conv int8->int32')
    t_bf = time_fn(conv(jnp.bfloat16), (x, w), 'micro conv int8->bf16')
    time_fn(conv(jnp.float32), (x, w), 'micro conv int8->f32')

    yi = conv(jnp.int32)(x, w)
    yb = conv(jnp.bfloat16)(x, w)
    ref = np.asarray(yi, np.float64)
    got = np.asarray(yb, np.float64)
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    print(f'micro acc: int8->bf16 vs int32 accumulator: '
          f'max rel {rel.max():.3e}, mean rel {rel.mean():.3e}', flush=True)
    return t_bf


def timed(compiled, variables, x, label):
    out = None
    for _ in range(5):
        out = compiled(variables, x)
    fetch(out['relat_cam'])
    for w in (30, 60):
        t0 = time.perf_counter()
        for _ in range(w):
            out = compiled(variables, x)
        fetch(out['relat_cam'])
        dt = (time.perf_counter() - t0) / w
        print(f'{label} pipelined win={w}: {dt * 1e3:.2f} ms '
              f'= {BS / dt:.1f} img/s', flush=True)
    return np.asarray(out['relat_cam'])


def main():
    print('devices:', jax.devices(), flush=True)
    micro()

    args = serve.default_args()
    p = serve.Predictor(args, 'rgb', batch_size=BS)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BS, 257, 257, 3).astype(np.float32))

    compiled = p.aot_compile()
    r_bf16 = timed(compiled, p.serve_variables, x, 'bf16 full')

    scales = p.quantize([x])
    compiled = p.aot_compile()
    r_i32 = timed(compiled, p.serve_variables, x, 'int8-i32 full')

    p.quantize_with_scales(scales, acc_dtype=jnp.bfloat16)
    compiled = p.aot_compile()
    r_bacc = timed(compiled, p.serve_variables, x, 'int8-bf16acc full')

    d_q = np.abs(r_i32 - r_bf16).max()
    d_acc = np.abs(r_bacc - r_i32).max()
    print(f'decoded relat_cam delta (mm): int8-i32 vs bf16 {d_q:.3f}; '
          f'bf16acc vs i32 {d_acc:.3f}', flush=True)


if __name__ == '__main__':
    main()
