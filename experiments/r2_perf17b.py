"""Round-2 perf #17: (a) does bs256 beat bs128 on the honest full step now
that aug is cheaper (fixed per-step costs amortize)? (b) op-level profile
of the bs128 full step with the fused split warp — is anything
warp-adjacent still on the clock, and what does the conv tail look like."""

import os
import sys
import time
import types

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit
from r2_perf9 import top_ops
import bench


def make_args(bs):
    return types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=bs,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)


def window(state, run_once, n=30, warmup=5):
    for i in range(warmup):
        state, out = run_once(state, i)
    if warmup:
        float(out['cam_loss'])
    t0 = time.perf_counter()
    for i in range(n):
        state, out = run_once(state, warmup + i)
    float(out['cam_loss'])
    return state, (time.perf_counter() - t0) / n


def main():
    emit(devices=[str(d) for d in jax.devices()])

    for bs in (128,):
        state, run_once = bench.build(make_args(bs))
        state, dt = window(state, run_once)
        emit(exp=f'honest_full_bs{bs}', ms=round(dt * 1000, 2),
             img_s=round(bs / dt, 1))
        if bs == 128:
            trace_dir = '/tmp/trace_full17'
            os.system(f'rm -rf {trace_dir}')
            with jax.profiler.trace(trace_dir):
                state, dt = window(state, run_once, n=10, warmup=0)
            for name, ms in top_ops(trace_dir, k=30):
                emit(op=name, total_ms_over_10=ms)
        del state, run_once


if __name__ == '__main__':
    main()
