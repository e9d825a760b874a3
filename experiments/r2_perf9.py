"""Round-2 perf #9: op-level profile of the honest trunk-only step
(98.99 ms at bs128) — which convs/fusions own the time.

Aggregates trace events by op name and also by prefix class
(conv/fusion/copy/transpose/all-reduce/...) to rank the levers.
"""

import glob
import gzip
import json
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


def top_ops(trace_dir, k=28):
    paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    events = []
    for p in paths:
        with gzip.open(p, 'rt') as f:
            data = json.load(f)
        events.extend(data.get('traceEvents', []))
    durs = {}
    # restrict to XLA op events on the device track: they carry 'run_id'
    # or appear under pid of the TPU; fall back to all complete events
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e:
            name = e.get('name', '?')
            if name.startswith('$') or 'tree_map' in name:
                continue
            durs[name] = durs.get(name, 0.0) + e['dur']
    items = sorted(durs.items(), key=lambda kv: -kv[1])
    return [(n[:110], round(d / 1000.0, 2)) for n, d in items[:k]]


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.models import build_model
    from pose_tpu.train import steps

    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)
    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx, (jnp.ones((1, 257, 257, 4)),))
    train_step = steps.make_joint_train_step(model, args, 2, tx,
                                             do_track=True)

    rng = np.random.RandomState(6)
    b = args.batch_size
    batch = dict(
        image=jnp.asarray(rng.randn(b, 257, 257, 4).astype(np.float32)),
        true_cam=jnp.asarray(
            rng.uniform(-400, 400, (b, 19, 3)).astype(np.float32) + 2500),
        true_mat=jnp.asarray(rng.uniform(20, 230, (b, 19, 2)
                                         ).astype(np.float32)),
        intrinsics=jnp.asarray(np.tile(np.array(
            [[1400., 0., 128.], [0., 1400., 128.], [0., 0., 1.]],
            np.float32), (b, 1, 1))),
        true_val=jnp.ones((b, 19), bool))

    holder = {'state': state}

    def once(i):
        holder['state'], out = train_step(holder['state'], batch, 1e-4)
        return out['cam_loss']

    for i in range(3):
        out = once(i)
    float(out)

    trace_dir = '/tmp/trace_trunk'
    os.system(f'rm -rf {trace_dir}')
    n = 10
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(n):
            out = once(10 + i)
        float(out)
        dt = (time.perf_counter() - t0) / n
    ops = top_ops(trace_dir)
    emit(exp='trunk_profile_bs128', ms=round(dt * 1000, 2))
    for name, ms in ops:
        emit(op=name, total_ms_over_10=ms)


if __name__ == '__main__':
    main()
