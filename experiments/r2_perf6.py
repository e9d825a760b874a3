"""Round-2 perf #6: op-level profile of the warp programs via jax.profiler.

Captures traces for (a) the standalone warp (sum output), (b) the full aug
program, then parses the trace.json.gz for the top ops by self duration.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, honest_batch


def top_ops(trace_dir, k=14):
    paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        return [('no-trace', 0.0)]
    events = []
    for p in paths:
        with gzip.open(p, 'rt') as f:
            data = json.load(f)
        events.extend(data.get('traceEvents', []))
    durs = {}
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e:
            name = e.get('name', '?')
            durs[name] = durs.get(name, 0.0) + e['dur']
    items = sorted(durs.items(), key=lambda kv: -kv[1])
    return [(n[:90], round(d / 1000.0, 2)) for n, d in items[:k]]


def profile(tag, fn, n=10):
    for i in range(3):
        out = fn(i)
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    trace_dir = f'/tmp/trace_{tag}'
    os.system(f'rm -rf {trace_dir}')
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i)
        jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
        dt = (time.perf_counter() - t0) / n
    emit(exp=f'profile_{tag}', ms=round(dt * 1000, 2),
         top_ops_total_ms=top_ops(trace_dir))


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.ops import warp
    from pose_tpu.data import augment

    rng = np.random.RandomState(5)
    d = honest_batch(rng, 128, 512, 19, 257)

    @jax.jit
    def warp_sum(canvases, homs, extents):
        images = canvases.astype(jnp.float32) / 255.0
        crops = warp.warp_batch_mxu.__wrapped__(images, homs, (257, 257),
                                                extents)
        return jnp.sum(crops)

    profile('warpsum', lambda i: warp_sum(d['canvases'], d['homs'],
                                          d['extents']))

    def aug(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257, True, False)

    profile('aug', aug)


if __name__ == '__main__':
    main()
