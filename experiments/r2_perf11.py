"""Round-2 perf #11: v2 (output-centric) banded stage B + uint8 stage A.

Measures stage B v1 vs v2 head-to-head, the full split aug, and the honest
step with the updated split warp. Also checks v1/v2 agreement on device.
"""

import functools
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, honest_batch
from r2_perf7 import run_honest_split


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.ops import warp
    from pose_tpu.ops.warp_pallas import warp_batch_pallas_banded
    from pose_tpu.data import augment

    rng = np.random.RandomState(1)
    d = honest_batch(rng, 128, 512, 19, 257)
    m, band = 256, 48

    @jax.jit
    def stage_a(canvases, homs, extents):
        residual, scale = warp.decompose_homography(
            homs.astype(jnp.float32), (257, 257), m)
        inter = jax.vmap(lambda im, sc, ex: warp._scale_resample_single(
            im, sc, ex, m, jnp.bfloat16, 1.0 / 255.0))(
            canvases, scale, extents)
        return inter, residual

    dt = timeit(lambda i: stage_a(d['canvases'], d['homs'], d['extents'])[0])
    emit(exp='split_stageA_u8_bs128', ms=round(dt * 1000, 2))

    inter, residual = stage_a(d['canvases'], d['homs'], d['extents'])
    inter = jax.block_until_ready(inter)
    full = jnp.tile(jnp.asarray([m, m], jnp.int32), (128, 1))

    outs = {}
    for ver in (2, 1):
        @functools.partial(jax.jit, static_argnames=())
        def stage_b(inter, residual, full, ver=ver):
            return warp_batch_pallas_banded(inter, residual, full,
                                            (257, 257), band=band,
                                            version=ver)
        dt = timeit(lambda i: stage_b(inter, residual, full))
        emit(exp=f'split_stageB_v{ver}_bs128', ms=round(dt * 1000, 2))
        outs[ver] = np.asarray(stage_b(inter, residual, full))
    emit(exp='stageB_v1_v2_max_diff',
         val=float(np.abs(outs[1] - outs[2]).max()))

    def aug(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    dt = timeit(aug)
    emit(exp='aug_split_v2_512_bs128', ms=round(dt * 1000, 2))

    t0 = time.perf_counter()
    try:
        run_honest_split()
    except Exception as e:
        emit(exp='run_honest_split', error=repr(e)[:500])
    emit(done='run_honest_split', wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
