"""In-process A/B of the fused dual-head regressor (round-5 perf lever 1).

The two 3x3 heads (cam 304ch, mat 19ch) read the same stage-4 feature in
the flagship config, so they can run as ONE 323-channel conv (bit-exact
forward; params unchanged). Hypothesis: the mat head's 19->128 MXU lane
padding is deleted in fwd/dgrad/wgrad. Counter-hypothesis: XLA already
handles the small head well and the concat/slice breaks a fusion.

Separate-process captures disagree within transport noise (baseline
1212.4 vs fused 1200.2, ~1% relay spread), so this interleaves windows of
BOTH programs in one process: any transport drift hits both arms equally.

Run (chip): python docs/experiments/r5_fusedhead_ab.py
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402


def make_args():
    return types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)


def main():
    import bench

    arms = {}
    for label, env in (('fused', '1'), ('separate', '0')):
        # the flag is read at TRACE time (resnet.py __call__), so each
        # arm must build AND warm (trace+compile) before the env flips
        os.environ['POSE_TPU_FUSED_HEAD'] = env
        state, run_once = bench.build(make_args())
        t0 = time.perf_counter()
        for i in range(3):
            state, out = run_once(state, i)
        float(out['cam_loss'])
        arms[label] = dict(state=state, run=run_once)
        print(json.dumps({'compiled': label,
                          'warm_s': round(time.perf_counter() - t0, 1)}),
              flush=True)

    # interleaved fetch-synced windows; the arms' PRNG state already
    # diverged during warmup but the programs are fixed now
    n_steps, n_rounds = 30, 6
    times = {k: [] for k in arms}
    for r in range(n_rounds):
        for label, arm in arms.items():
            t0 = time.perf_counter()
            for i in range(n_steps):
                arm['state'], out = arm['run'](arm['state'],
                                               100 + 1000 * r + i)
            float(out['cam_loss'])
            dt = time.perf_counter() - t0
            times[label].append(128 * n_steps / dt)
            print(json.dumps({'round': r, 'arm': label,
                              'img_s': round(128 * n_steps / dt, 1)}),
                  flush=True)

    summary = {}
    for label, xs in times.items():
        summary[label] = dict(median=round(float(np.median(xs)), 1),
                              max=round(float(np.max(xs)), 1),
                              all=[round(x, 1) for x in xs])
    rel = summary['fused']['median'] / summary['separate']['median']
    print(json.dumps({'exp': 'fused_dual_head_ab', **summary,
                      'fused_over_separate_median': round(rel, 4)}),
          flush=True)


if __name__ == '__main__':
    main()
