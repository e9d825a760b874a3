"""r3_serve_profile: op-level profile of the flagship serving forward.

Where do the 21.0 ms (bf16) / 17.0 ms (int8-preq) per bs128 batch go?
The int8 A/B (r3_serve_int8c) implies ~half the bf16 step is non-conv
work (conv rate 1.89x but e2e only 1.24x) — rank the ops to see whether
a real serving lever exists (softmax decode? BN chains? quant/dequant?).
"""
import glob
import gzip
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from pose_tpu import serve
from pose_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
BS = 128


def top_ops(trace_dir, k=30):
    paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    durs = {}
    for p in paths:
        with gzip.open(p, 'rt') as f:
            data = json.load(f)
        for e in data.get('traceEvents', []):
            if e.get('ph') == 'X' and 'dur' in e:
                name = e.get('name', '?')
                if name.startswith('$') or 'tree_map' in name:
                    continue
                durs[name] = durs.get(name, 0.0) + e['dur']
    items = sorted(durs.items(), key=lambda kv: -kv[1])
    return [(n[:110], round(d / 1000.0, 2)) for n, d in items[:k]]


def classify(name):
    for cls in ('convolution', 'fusion', 'copy', 'transpose', 'reduce',
                'dot', 'convert', 'dynamic'):
        if cls in name:
            return cls
    return 'other'


def profile(label, compiled, variables, x):
    out = None
    for _ in range(5):
        out = compiled(variables, x)
    float(jnp.sum(out['relat_cam']))
    trace_dir = f'/tmp/trace_serve_{label}'
    os.system(f'rm -rf {trace_dir}')
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            out = compiled(variables, x)
        float(jnp.sum(out['relat_cam']))
    dt = (time.perf_counter() - t0) / 10
    print(f'== {label}: {dt * 1e3:.2f} ms/batch over the traced window',
          flush=True)
    ops = top_ops(trace_dir, k=200)
    by_cls = {}
    for name, ms in ops:
        by_cls[classify(name)] = by_cls.get(classify(name), 0.0) + ms
    print(f'{label} class totals (ms over 10 batches):',
          {c: round(v, 2) for c, v in
           sorted(by_cls.items(), key=lambda kv: -kv[1])}, flush=True)
    for name, ms in ops[:25]:
        print(f'  {ms:8.2f}  {name}', flush=True)


def main():
    print('devices:', jax.devices(), flush=True)
    args = serve.default_args()
    p = serve.Predictor(args, 'rgb', batch_size=BS)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BS, 257, 257, 3).astype(np.float32))

    compiled = p.aot_compile()
    profile('bf16', compiled, p.serve_variables, x)

    p.quantize([x])
    compiled = p.aot_compile()
    profile('int8', compiled, p.serve_variables, x)


if __name__ == '__main__':
    main()
