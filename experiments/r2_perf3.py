"""Round-2 perf #3: re-measure after the MXU-warp operand swap
(channels on M/sublanes instead of N/lanes, ops/warp.py)."""

import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

import r2_perf1 as p1
from r2_perf1 import emit, timeit


def run_warp_only():
    from pose_tpu.ops import warp
    rng = np.random.RandomState(5)
    d = p1.honest_batch(rng, 128, 512, 19, 257)

    @jax.jit
    def warp_only(canvases, homs, extents):
        images = canvases.astype(jnp.float32) / 255.0
        crops = warp.warp_batch_mxu.__wrapped__(images, homs, (257, 257),
                                                extents)
        return jnp.clip(crops, 0.0, 1.0)

    dt = timeit(lambda i: warp_only(d['canvases'], d['homs'], d['extents']))
    emit(exp='warp_only_512_bs128_swapped', ms=round(dt * 1000, 2))


def run_aug512():
    from pose_tpu.data import augment
    rng = np.random.RandomState(1)
    d = p1.honest_batch(rng, 128, 512, 19, 257)

    def once(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257, True, False)
    dt = timeit(once)
    emit(exp='aug_canvas512_bs128_swapped', ms=round(dt * 1000, 2))


def main():
    emit(devices=[str(dev) for dev in jax.devices()])
    for fn in (run_warp_only, run_aug512, p1.run_honest,
               p1.run_light_control):
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            emit(exp=fn.__name__, error=repr(e)[:500])
        emit(done=fn.__name__, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
