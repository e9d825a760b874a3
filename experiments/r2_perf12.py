"""Round-2 perf #12: block-unrolled stage B (aligned block read + static tap
unroll, semantic band 32) + transpose-free planar stage A. Measures the
pieces, the full aug, device-side v2-vs-mxu agreement, then runs bench.py's
exact honest program."""

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

    # agreement: split (pallas stage B) vs split (mxu stage B) on device
    sp_p = warp.warp_batch_split(d['canvases'], d['homs'], (257, 257),
                                 d['extents'])
    sp_m = warp.warp_batch_split(d['canvases'], d['homs'], (257, 257),
                                 d['extents'], stage_b='mxu')
    diff = float(jnp.abs(sp_p - sp_m).max())
    emit(exp='stageB_unrolled_vs_mxu_max', val=round(diff, 7))

    def warp_only(i):
        return warp.warp_batch_split(d['canvases'], d['homs'], (257, 257),
                                     d['extents'])

    dt = timeit(warp_only)
    emit(exp='split_warp_unrolled_512_bs128', ms=round(dt * 1000, 2))

    def aug(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    dt = timeit(aug)
    emit(exp='aug_split_unrolled_512_bs128', ms=round(dt * 1000, 2))

    # the exact bench.py program
    import bench
    args_ns = __import__('types').SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)
    state, run_once = bench.build(args_ns)
    for i in range(3):
        state, out = run_once(state, i)
    float(out['cam_loss'])
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        state, out = run_once(state, 100 + i)
    float(out['cam_loss'])
    dt = (time.perf_counter() - t0) / n
    emit(exp='bench_honest_split_unrolled_bs128', ms=round(dt * 1000, 2),
         img_s=round(128 / dt, 1))


if __name__ == '__main__':
    main()
