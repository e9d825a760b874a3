"""Round-2 perf #19: per-program XLA:TPU compiler options through the
relay. XLA_FLAGS cannot be set via env through axon (the local process
rejects libtpu flags), but AOT `lowered.compile(compiler_options=...)`
embeds options in the compile request — probe whether that path works and
whether any known conv-workload knob moves the honest step.

Candidates: scoped-vmem limit (bigger scoped vmem can deepen conv
fusions), flag names unknown to the compiler error out cleanly per trial."""

import sys
import time
import types

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit
import bench


def main():
    emit(devices=[str(d) for d in jax.devices()])

    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)

    # rebuild the bench step but keep the unjitted callable for AOT
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment
    import functools

    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state0 = steps.init_state(
        model, args, tx, (jnp.ones((1, args.side_in, args.side_in, 4)),))
    train_step = steps.make_joint_train_step(model, args, 2, tx,
                                             do_track=True)

    rng = np.random.RandomState(0)
    b = args.batch_size
    d = dict(
        canvases=jnp.asarray(rng.randint(0, 255, (b, 512, 512, 3),
                                         dtype=np.uint8)),
        homs=jnp.asarray(bench.realistic_homs(rng, b, 512, args.side_in)),
        extents=jnp.asarray(np.tile([512, 512], (b, 1)).astype(np.int32)),
        true_cam=jnp.asarray(np.concatenate([
            rng.uniform(-400, 400, (b, 19, 2)),
            rng.uniform(2600, 3400, (b, 19, 1))], -1).astype(np.float32)),
        true_mat=jnp.asarray(
            rng.uniform(20, 230, (b, 19, 2)).astype(np.float32)),
        intr=jnp.asarray(np.tile(np.array(
            [[1400., 0., 128.], [0., 1400., 128.], [0., 0., 1.]],
            np.float32), (b, 1, 1))),
        true_val=jnp.ones((b, 19), jnp.bool_),
        quads=jnp.asarray(np.stack([
            np.stack([rng.uniform(10, 60, b), rng.uniform(10, 60, b)], -1),
            np.stack([rng.uniform(200, 250, b), rng.uniform(10, 60, b)], -1),
            np.stack([rng.uniform(200, 250, b),
                      rng.uniform(200, 250, b)], -1),
            np.stack([rng.uniform(10, 60, b), rng.uniform(200, 250, b)], -1),
        ], axis=1).astype(np.float32)))
    key = jax.random.PRNGKey(0)

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

    jitted = jax.jit(full_step, donate_argnums=(0,))
    lowered = jitted.lower(state0, d, key, np.uint32(0), 1e-4)

    def timed(compiled, state):
        def once(state, i):
            return compiled(state, d, key, np.uint32(i), 1e-4)
        for i in range(5):
            state, out = once(state, i)
        float(out['cam_loss'])
        t0 = time.perf_counter()
        for i in range(30):
            state, out = once(state, 5 + i)
        float(out['cam_loss'])
        return (time.perf_counter() - t0) / 30

    import os
    trials = [
        ('control', None),
        ('lhs', {'xla_tpu_enable_latency_hiding_scheduler': 'true'}),
        ('no_dot_sr', {'xla_tpu_enable_dot_strength_reduction': 'false'}),
    ] if os.environ.get('P19_SET') == '2' else [
        ('control', None),
        ('scoped_vmem_48m', {'xla_tpu_scoped_vmem_limit_kib': '49152'}),
        ('scoped_vmem_96m', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ]
    for name, opts in trials:
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            state = jax.tree_util.tree_map(jnp.array, state0)  # fresh donate
            dt = timed(compiled, state)
            emit(exp=f'opts_{name}', ms=round(dt * 1000, 2),
                 img_s=round(b / dt, 1))
        except Exception as e:
            emit(exp=f'opts_{name}', error=repr(e)[:300])


if __name__ == '__main__':
    main()
