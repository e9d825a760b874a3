"""Round-2 perf #10: where do aug_split's 15.6 ms go? Op-level trace of the
split-warp aug program + piecewise timings (stage A alone, banded stage B
alone, colour chain, uint8 conversion)."""

import functools
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

from r2_perf1 import emit, timeit, honest_batch
from r2_perf9 import top_ops


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.ops import warp
    from pose_tpu.ops.warp_pallas import warp_batch_pallas_banded
    from pose_tpu.data import augment

    rng = np.random.RandomState(1)
    d = honest_batch(rng, 128, 512, 19, 257)
    m, band = 256, 48

    # piecewise: stage A alone
    @jax.jit
    def stage_a(canvases, homs, extents):
        images = canvases.astype(jnp.float32) / 255.0
        residual, scale = warp.decompose_homography(
            homs.astype(jnp.float32), (257, 257), m)
        inter = jax.vmap(lambda im, sc, ex: warp._scale_resample_single(
            im, sc, ex, m, jnp.bfloat16))(images, scale, extents)
        return inter, residual

    dt = timeit(lambda i: stage_a(d['canvases'], d['homs'], d['extents'])[0])
    emit(exp='split_stageA_bs128', ms=round(dt * 1000, 2))

    inter, residual = stage_a(d['canvases'], d['homs'], d['extents'])
    inter = jax.block_until_ready(inter)
    full = jnp.tile(jnp.asarray([m, m], jnp.int32), (128, 1))

    @jax.jit
    def stage_b(inter, residual, full):
        return warp_batch_pallas_banded(inter, residual, full, (257, 257),
                                        band=band)

    dt = timeit(lambda i: stage_b(inter, residual, full))
    emit(exp='split_stageB_bs128', ms=round(dt * 1000, 2))

    # colour chain alone on a ready crop
    crops = stage_b(inter, residual, full)
    crops = jax.block_until_ready(jnp.clip(crops, 0, 1))

    @jax.jit
    def colour_only(crops, key):
        return augment._finish_color(crops, key, True, False)

    dt = timeit(lambda i: colour_only(
        crops, jax.random.fold_in(jax.random.PRNGKey(0), i)))
    emit(exp='split_colour_bs128', ms=round(dt * 1000, 2))

    # profile the full aug program
    def aug(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    for i in range(3):
        out = aug(i)
    float(jnp.ravel(out)[0])
    trace_dir = '/tmp/trace_split'
    os.system(f'rm -rf {trace_dir}')
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(10):
            out = aug(10 + i)
        float(jnp.ravel(out)[0])
        dt = (time.perf_counter() - t0) / 10
    emit(exp='split_aug_profile', ms=round(dt * 1000, 2))
    for name, ms in top_ops(trace_dir, k=18):
        emit(op=name, total_ms_over_10=ms)


if __name__ == '__main__':
    main()
