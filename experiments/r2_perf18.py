"""Round-2 perf #18: refresh the per-config train-step throughput table
(round-1 notes measured depth 1171 / fusion 747 / partial 1039 img/s with
the round-1 warp). Each config runs its production device path: split-warp
aug + the real step, bs128, device-resident 512^2 (colour) / 424x512
(depth) canvases, fetch-synced 30-step windows."""

import functools
import os
import sys
import time
import types

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, realistic_homs


def make_args(**over):
    args = types.SimpleNamespace(
        model=os.environ.get('P18_MODEL', 'resnet50'), criterion='SmoothL1', half_acc=True,
        extra_channel=False, joint_space=False, skip_relu=False,
        early_dist=False, depth_only=False, sigmoid=False, bin_dist=False,
        do_freeze=False,
        side_in=SIDE, stride=int(os.environ.get('P18_STRIDE', 16)), num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)
    for k, v in over.items():
        setattr(args, k, v)
    return args


CANVAS = int(os.environ.get('P18_CANVAS', 512))
DCANVAS_H = 424 * CANVAS // 512
SIDE = int(os.environ.get('P18_SIDE', 257))


def color_feed(rng, b):
    return (jnp.asarray(rng.randint(0, 255, (b, CANVAS, CANVAS, 3),
                                    dtype=np.uint8)),
            jnp.asarray(realistic_homs(rng, b, CANVAS, SIDE)),
            jnp.asarray(np.tile([CANVAS, CANVAS], (b, 1)).astype(np.int32)))


def depth_feed(rng, b):
    d = rng.uniform(0.5, 8.0, (b, DCANVAS_H, CANVAS, 1)).astype(np.float32)
    return (jnp.asarray(d),
            jnp.asarray(realistic_homs(rng, b, DCANVAS_H, SIDE)),
            jnp.asarray(np.tile([DCANVAS_H, CANVAS],
                                (b, 1)).astype(np.int32)),
            jnp.asarray(np.tile(np.eye(3, dtype=np.float32) / 500,
                                (b, 1, 1))),
            jnp.asarray(np.full((b,), 0.1, np.float32)))


def gt_feed(rng, b, j):
    return (jnp.asarray(np.concatenate(
                [rng.uniform(-400, 400, (b, j, 2)),
                 rng.uniform(2600, 3400, (b, j, 1))], -1).astype(np.float32)),
            jnp.ones((b, j), jnp.bool_))


def window(run, n=30, warmup=5):
    out = None
    for i in range(warmup):
        out = run(i)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = run(warmup + i)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / n


def run_config(name, builder):
    try:
        dt = builder()
        emit(exp=name, ms=round(dt * 1000, 2),
             img_s=round(int(os.environ.get('P18_BS', 128)) / dt, 1))
    except Exception as e:
        emit(exp=name, error=repr(e)[:300])


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    b = int(os.environ.get('P18_BS', 128))
    rng = np.random.RandomState(3)
    canv, homs, ext = color_feed(rng, b)
    dcanv, dhoms, dext, kinv, thresh = depth_feed(rng, b)
    true_cam, true_val = gt_feed(rng, b, 19)
    key0 = jax.random.PRNGKey(0)

    def config2():
        args = make_args()
        model = build_model(args, 'depth')
        tx = steps.make_optimizer(args)
        state = steps.init_state(model, args, tx,
                                 (jnp.ones((1, SIDE, SIDE, 3)),))
        train_step = steps.make_vanilla_train_step(model, args, 2, tx)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def full(state, i):
            key = jax.random.fold_in(key0, i)
            color = augment.process_color_batch.__wrapped__(
                canv, homs, ext, key, SIDE, True, False, warp_impl='split')
            batch = dict(in_image=color, true_cam=true_cam,
                         true_val=true_val)
            return train_step(state, batch, 1e-4)

        holder = {'s': state}

        def run(i):
            holder['s'], out = full(holder['s'], np.uint32(i))
            return out['cam_loss']
        return window(run)

    def config3():
        args = make_args()
        model = build_model(args, 'fusion')
        tx = steps.make_optimizer(args)
        state = steps.init_state(
            model, args, tx, (jnp.ones((1, SIDE, SIDE, 3)),
                              jnp.ones((1, SIDE, SIDE, 1))))
        train_step = steps.make_fusion_train_step(model, args, 2, tx)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def full(state, i):
            key = jax.random.fold_in(key0, i)
            color = augment.process_color_batch.__wrapped__(
                canv, homs, ext, key, SIDE, True, False, warp_impl='split')
            depth = augment.process_depth_batch.__wrapped__(
                dcanv, dhoms, dext, kinv, thresh, SIDE, False, False,
                warp_impl='split')
            batch = dict(color=color, depth=depth, true_cam=true_cam,
                         true_val=true_val)
            return train_step(state, batch, 1e-4)

        holder = {'s': state}

        def run(i):
            holder['s'], out = full(holder['s'], np.uint32(i))
            return out['cam_loss']
        return window(run)

    def config4():
        args = make_args(depth_only=True)
        model = build_model(args, 'partial_depth')
        tx = steps.make_optimizer(args)
        state = steps.init_state(model, args, tx,
                                 (jnp.ones((1, SIDE, SIDE, 1)),))
        train_step = steps.make_vanilla_train_step(model, args, 2, tx)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def full(state, i):
            depth = augment.process_depth_batch.__wrapped__(
                dcanv, dhoms, dext, kinv, thresh, SIDE, False, False,
                warp_impl='split')
            batch = dict(in_image=depth, true_cam=true_cam,
                         true_val=true_val)
            return train_step(state, batch, 1e-4)

        holder = {'s': state}

        def run(i):
            holder['s'], out = full(holder['s'], np.uint32(i))
            return out['cam_loss']
        return window(run)

    def distill():
        args = make_args()
        model = build_model(args, 'depth')
        teacher = build_model(args, 'depth')
        tx = steps.make_optimizer(args)
        state = steps.init_state(model, args, tx,
                                 (jnp.ones((1, SIDE, SIDE, 3)),))
        t_vars = jax.device_get(teacher.init(
            jax.random.PRNGKey(7), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        t_vars = dict(params=t_vars['params'],
                      batch_stats=t_vars['batch_stats'])
        train_step = steps.make_distill_train_step(
            model, teacher, args, 2, tx, teacher_is_fusion=False,
            with_semi=False)
        atten = jnp.asarray(
            rng.rand(b, SIDE // int(os.environ.get('P18_STRIDE', 16)) + 1, SIDE // int(os.environ.get('P18_STRIDE', 16)) + 1, 1).astype(np.float32))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def full(state, t_vars, i):
            key = jax.random.fold_in(key0, i)
            color = augment.process_color_batch.__wrapped__(
                canv, homs, ext, key, SIDE, True, False, warp_impl='split')
            batch = dict(color=color, true_cam=true_cam, true_val=true_val,
                         atten_map=atten)
            return train_step.__wrapped__(state, t_vars, batch,
                                          jnp.float32(1e-4),
                                          jnp.float32(0.5))

        holder = {'s': state, 't': t_vars}

        def run(i):
            holder['s'], holder['t'], out = full(holder['s'], holder['t'],
                                                 np.uint32(i))
            return out['cam_loss']
        return window(run)

    run_config('config2_vanilla_depthnet_full', config2)
    run_config('config3_fusion_full', config3)
    run_config('config4_partial_depth_full', config4)
    run_config('distill_full', distill)


if __name__ == '__main__':
    main()
