"""Round-5 compiler_options sweep over UNEXPLORED TPU flags (VERDICT r4
next-#1: "latency-hiding compiler_options beyond scoped-vmem").

r2_perf19 established that per-program `lowered.compile(compiler_options)`
IS honored through the axon relay (XLA_FLAGS cannot be set), and swept
scoped-vmem / LHS-priority / dot-strength-reduction (neutral or worse).
This sweep probes scheduler/fusion knobs not yet tried, one compile each,
against the in-process default-arm baseline re-timed in the SAME process
(transport drift hits all arms equally). Unknown flags fail the compile —
caught and reported, which is itself the negative result.

Run (chip): python docs/experiments/r5_compileropts.py
"""
import functools
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

import bench  # noqa: E402  (enables the compile cache)


OPTIONS = {
    'default': None,
    'licm_inflation_2': {'xla_tpu_licm_size_inflation_ratio': '2'},
    'lhs_rerun_2': {'xla_latency_hiding_scheduler_rerun': '2'},
    'aggressive_bcast_prio': {
        'xla_tpu_enable_aggressive_broadcast_priority_update': 'true'},
    'rwb_fusion_off': {'xla_tpu_rwb_fusion': 'false'},
    'dp_diff_sized_ops': {
        'xla_tpu_data_parallel_opt_different_sized_ops': 'true'},
}


def main():
    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)

    # bench.build jits full_step internally; to pass compiler_options we
    # need the lowered object, so rebuild the step through build() and
    # reach the jitted function via its closure-free re-jit: simplest is
    # to re-wrap run_once is not possible — instead compile via
    # jax.jit(...).lower().compile(compiler_options) on a fresh builder.
    import jax.numpy as jnp
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state0 = steps.init_state(
        model, args, tx, (jnp.ones((1, args.side_in, args.side_in, 4)),))
    train_step = steps.make_joint_train_step(model, args, 2, tx,
                                             do_track=True)

    def full_step(state, d, key, i, lr):
        key = jax.random.fold_in(key, i)
        image = augment.process_color_batch.__wrapped__(
            d['canvases'], d['homs'], d['extents'], key, args.side_in,
            True, False, warp_impl='split')
        mask = augment.bbox_mask_channel(d['quads'], args.side_in)
        image = jnp.concatenate([image, mask], axis=-1)
        batch = dict(image=image, true_cam=d['true_cam'],
                     true_mat=d['true_mat'], intrinsics=d['intr'],
                     true_val=d['true_val'])
        return train_step.__wrapped__(state, batch, lr)

    rng = np.random.RandomState(0)
    b = args.batch_size
    canvas = 512
    d = dict(
        canvases=jnp.asarray(
            rng.randint(0, 255, (b, canvas, canvas, 3), dtype=np.uint8)),
        homs=jnp.asarray(bench.realistic_homs(rng, b, canvas, args.side_in)),
        extents=jnp.asarray(
            np.tile([canvas, canvas], (b, 1)).astype(np.int32)),
        true_cam=jnp.asarray(np.concatenate([
            rng.uniform(-400, 400, (b, args.num_joints, 2)),
            rng.uniform(2600, 3400, (b, args.num_joints, 1))],
            -1).astype(np.float32)),
        true_mat=jnp.asarray(
            rng.uniform(20, 230, (b, args.num_joints, 2)).astype(np.float32)),
        intr=jnp.asarray(np.tile(np.array(
            [[1400., 0., 128.], [0., 1400., 128.], [0., 0., 1.]], np.float32),
            (b, 1, 1))),
        true_val=jnp.ones((b, args.num_joints), jnp.bool_),
        quads=jnp.asarray(np.stack([
            np.stack([rng.uniform(10, 60, b), rng.uniform(10, 60, b)], -1),
            np.stack([rng.uniform(200, 250, b), rng.uniform(10, 60, b)], -1),
            np.stack([rng.uniform(200, 250, b),
                      rng.uniform(200, 250, b)], -1),
            np.stack([rng.uniform(10, 60, b), rng.uniform(200, 250, b)], -1),
        ], axis=1).astype(np.float32)))
    key = jax.random.PRNGKey(0)

    jitted = jax.jit(full_step, donate_argnums=(0,))
    lowered = jitted.lower(state0, d, key, np.uint32(0), 1e-4)

    compiled = {}
    for name, opts in OPTIONS.items():
        try:
            t0 = time.perf_counter()
            compiled[name] = (lowered.compile(compiler_options=opts)
                              if opts else lowered.compile())
            print(json.dumps({'compiled': name,
                              'compile_s': round(time.perf_counter() - t0,
                                                 1)}), flush=True)
        except Exception as e:
            print(json.dumps({'compiled': name, 'error': repr(e)[:200]}),
                  flush=True)

    n_steps, n_rounds = 30, 4
    times = {k: [] for k in compiled}
    # warm each arm (donation: keep a fresh state copy per arm)
    states = {}
    for name, ex in compiled.items():
        st = jax.device_put(jax.device_get(state0))
        for i in range(3):
            st, out = ex(st, d, key, np.uint32(i), 1e-4)
        float(out['cam_loss'])
        states[name] = st
    for r in range(n_rounds):
        for name, ex in compiled.items():
            st = states[name]
            t0 = time.perf_counter()
            for i in range(n_steps):
                st, out = ex(st, d, key, np.uint32(100 + 1000 * r + i), 1e-4)
            float(out['cam_loss'])
            dt = time.perf_counter() - t0
            states[name] = st
            times[name].append(128 * n_steps / dt)
            print(json.dumps({'round': r, 'arm': name,
                              'img_s': round(128 * n_steps / dt, 1)}),
                  flush=True)

    summary = {name: dict(median=round(float(np.median(xs)), 1),
                          max=round(float(np.max(xs)), 1))
               for name, xs in times.items()}
    print(json.dumps({'exp': 'compiler_options_sweep_r5', **summary}),
          flush=True)


if __name__ == '__main__':
    main()
