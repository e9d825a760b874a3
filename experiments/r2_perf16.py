"""Round-2 perf #16: the single-kernel split warp (stage A's MXU matmuls
inside the banded Pallas kernel, no HBM intermediate / layout copies) vs
the two-op path (planar stage A + warp_batch_pallas_banded).

Measures on the real chip, honest shape (bs128, 512^2 uint8 canvases,
257^2 crops): warp-only both ways, full process_color_batch (which now
routes 'split' -> fused kernel), and an on-device max-diff correctness
check fused-vs-two-op."""

import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, honest_batch


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.ops import warp
    from pose_tpu.data import augment

    rng = np.random.RandomState(1)
    d = honest_batch(rng, 128, 512, 19, 257)
    canv, homs, ext = d['canvases'], d['homs'], d['extents']

    # correctness first: fused vs two-op on device
    fused = warp.warp_batch_split(canv, homs, (257, 257), ext,
                                  stage_b='pallas')
    twoop = warp.warp_batch_split(canv, homs, (257, 257), ext,
                                  stage_b='pallas2')
    md = float(jnp.max(jnp.abs(fused - twoop)))
    emit(exp='fused_vs_twoop_maxdiff', maxdiff=round(md, 5))

    dt = timeit(lambda i: warp.warp_batch_split(
        canv, homs, (257, 257), ext, stage_b='pallas'))
    emit(exp='warp_only_fused', ms=round(dt * 1000, 2))
    dt = timeit(lambda i: warp.warp_batch_split(
        canv, homs, (257, 257), ext, stage_b='pallas2'))
    emit(exp='warp_only_twoop', ms=round(dt * 1000, 2))

    def aug(i):
        return augment.process_color_batch(
            canv, homs, ext,
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    dt = timeit(aug)
    emit(exp='aug_split_fused', ms=round(dt * 1000, 2),
         note='r2_perf15 two-op measured 12.94')


if __name__ == '__main__':
    main()
