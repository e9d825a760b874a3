"""r3_serve_int8c: int8 serving with PREQUANTIZED weights.

Rerun of the r3_serve_int8b measurement after quant.prequantize_params:
the live Predictor path now runs on int8 kernels stored in serve_variables,
so the per-call jit no longer re-runs abs-max/round/clip over ~25M kernel
weights (they were jit ARGUMENTS, so XLA could not constant-fold the
quantization). Same flagship config: rgb joint_space resnet50 @257, bf16
compute, bs128, AOT-compiled, device-resident inputs, fetch-synced.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from pose_tpu import serve
from pose_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
BS = 128


def timed(compiled, variables, x, label):
    out = None
    for _ in range(5):                      # warmup past queue effects
        out = compiled(variables, x)
    float(jnp.sum(out['relat_cam']))
    for w in (30, 60):
        t0 = time.perf_counter()
        for _ in range(w):
            out = compiled(variables, x)
        float(jnp.sum(out['relat_cam']))    # value fetch = only real sync
        dt = (time.perf_counter() - t0) / w
        print(f'{label} pipelined win={w}: {dt * 1e3:.2f} ms '
              f'= {BS / dt:.1f} img/s', flush=True)
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = compiled(variables, x)
        float(jnp.sum(out['relat_cam']))
        lat.append(time.perf_counter() - t0)
    lat = np.sort(lat) * 1e3
    print(f'{label} per-request fetch-synced: median={np.median(lat):.2f} '
          f'ms, p10={lat[3]:.2f}, p90={lat[-4]:.2f}', flush=True)


def main():
    print('devices:', jax.devices(), flush=True)
    args = serve.default_args()
    p = serve.Predictor(args, 'rgb', batch_size=BS)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BS, 257, 257, 3).astype(np.float32))

    compiled = p.aot_compile()
    timed(compiled, p.serve_variables, x, 'bf16 full')

    p.quantize([x])
    compiled = p.aot_compile()
    timed(compiled, p.serve_variables, x, 'int8-preq full')


if __name__ == '__main__':
    main()
