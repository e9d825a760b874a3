"""Round-2 perf #15: profile the current (planar) split aug — where do
stage A's ~3 ms go? Plus a no-convert variant check: feed pre-converted
bf16 canvases to isolate the uint8->bf16 materialization cost."""

import os
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, honest_batch
from r2_perf9 import top_ops


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.ops import warp
    from pose_tpu.data import augment

    rng = np.random.RandomState(1)
    d = honest_batch(rng, 128, 512, 19, 257)

    def aug(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    for i in range(3):
        out = aug(i)
    float(jnp.ravel(out)[0])
    trace_dir = '/tmp/trace_split2'
    os.system(f'rm -rf {trace_dir}')
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(10):
            out = aug(10 + i)
        float(jnp.ravel(out)[0])
        dt = (time.perf_counter() - t0) / 10
    emit(exp='aug_split_planar_profile', ms=round(dt * 1000, 2))
    for name, ms in top_ops(trace_dir, k=16):
        emit(op=name, total_ms_over_10=ms)

    # bf16 canvases: stage A without the uint8 convert
    cbf = d['canvases'].astype(jnp.bfloat16) / 255.0
    cbf = jax.block_until_ready(cbf)

    def aug_bf(i):
        return augment.process_color_batch(
            cbf, d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    dt = timeit(aug_bf)
    emit(exp='aug_split_bf16src_512_bs128', ms=round(dt * 1000, 2))


if __name__ == '__main__':
    main()
