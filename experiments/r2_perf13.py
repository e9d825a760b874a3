"""Round-2 perf #13: planar colour chain + final bench program, and a
batch-size re-sweep now that aug is cheap (the round-1 sweep that picked
bs128 ran with the 3x-costlier matmul warp)."""

import sys
import time
import types

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, honest_batch


def run_aug():
    from pose_tpu.data import augment
    rng = np.random.RandomState(1)
    d = honest_batch(rng, 128, 512, 19, 257)

    def aug(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    dt = timeit(aug)
    emit(exp='aug_split_planarchain_512_bs128', ms=round(dt * 1000, 2))


def run_bench_program(batch_size=128):
    import bench
    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16,
        batch_size=batch_size,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)
    state, run_once = bench.build(args)
    for i in range(3):
        state, out = run_once(state, i)
    float(out['cam_loss'])
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        state, out = run_once(state, 100 + i)
    float(out['cam_loss'])
    dt = (time.perf_counter() - t0) / n
    emit(exp=f'bench_honest_planar_bs{batch_size}', ms=round(dt * 1000, 2),
         img_s=round(batch_size / dt, 1))


def main():
    emit(devices=[str(d) for d in jax.devices()])
    for fn in (run_aug,
               lambda: run_bench_program(128),
               lambda: run_bench_program(256)):
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            emit(error=repr(e)[:500])
        emit(done=True, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
