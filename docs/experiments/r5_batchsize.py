"""Round-5: batch-size probe between the documented points.

r2 established bs128 > bs256 (1210 vs 1163 img/s) and bs128 became the
flagship point; the 128-256 interior was never measured. One compile each
for bs160/bs192, interleaved normalized-img/s windows against bs128 in
the same process.

Run (chip): python docs/experiments/r5_batchsize.py
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (enables the compile cache)


def make_args(bs):
    return types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=bs,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)


def main():
    arms = {}
    for bs in (128, 160, 192):
        state, run_once = bench.build(make_args(bs))
        t0 = time.perf_counter()
        for i in range(3):
            state, out = run_once(state, i)
        float(out['cam_loss'])
        arms[bs] = dict(state=state, run=run_once)
        print(json.dumps({'compiled': bs,
                          'warm_s': round(time.perf_counter() - t0, 1)}),
              flush=True)

    n_imgs = 128 * 30          # equal images per window across arms
    times = {k: [] for k in arms}
    for r in range(4):
        for bs, arm in arms.items():
            n_steps = max(n_imgs // bs, 1)
            t0 = time.perf_counter()
            for i in range(n_steps):
                arm['state'], out = arm['run'](arm['state'],
                                               100 + 1000 * r + i)
            float(out['cam_loss'])
            dt = time.perf_counter() - t0
            times[bs].append(bs * n_steps / dt)
            print(json.dumps({'round': r, 'bs': bs,
                              'img_s': round(bs * n_steps / dt, 1)}),
                  flush=True)

    print(json.dumps({'exp': 'batch_size_interior_r5',
                      **{str(bs): dict(median=round(float(np.median(xs)), 1),
                                       max=round(float(np.max(xs)), 1))
                         for bs, xs in times.items()}}), flush=True)


if __name__ == '__main__':
    main()
