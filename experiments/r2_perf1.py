"""Round-2 perf exploration #1 (runs on the real v5e chip via axon).

Measures, in priority order (each prints one JSON line, flushed):
  1. honest512: the flagship cmu_train.sh config (joint_space + do_track +
     extra_channel) with representative 512^2 canvases and ~1.5x-scale crop
     homographies — the number VERDICT round 2 item 1+3 asks for.
  2. aug-only cost vs canvas size (512/384/320) — quantifies the windowing
     lever for the warp (W1 traffic scales with src_h*src_w).
  3. stem space-to-depth: 7x7/2 conv on (257,257,4) as an equivalent 4x4/1
     conv on the 2x2 space-to-depth input (132,132,16) — the MLPerf-style
     stem optimization for the measured stem+stage1 bwd hotspot.
  4. stage-4 dilated conv vs space-to-batch.
  5. light-config control (round-1 bench shape) for drift.

Timing: through the axon relay only a value fetch is a reliable sync
(CLAUDE.md); every window ends with a float() fetch. 30-step windows.
"""

import functools
import json
import sys
import time
import types

import numpy as np

import jax
import jax.numpy as jnp


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, n=30, warmup=3):
    for i in range(warmup):
        out = fn(i)
    jax.tree_util.tree_map(
        lambda x: float(jnp.ravel(x)[0]), out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(warmup + i)
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    return (time.perf_counter() - t0) / n


def make_args(**over):
    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=False, joint_space=False, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)
    for k, v in over.items():
        setattr(args, k, v)
    return args


def realistic_homs(rng, b, canvas, side_in):
    """Crop homographies as the runtime loader produces them: the 257^2
    output maps to a ~side_in*1.5-sized region of the canvas with random
    placement, zoom in [0.9, 1/0.9], small rotation and perspective."""
    homs = np.zeros((b, 3, 3), np.float32)
    for i in range(b):
        zoom = rng.uniform(0.9, 1.0 / 0.9)
        s = 384.0 / side_in / zoom
        th = rng.uniform(-0.05, 0.05)
        c, sn = np.cos(th), np.sin(th)
        span = s * side_in
        tx = rng.uniform(0, max(canvas - span, 1))
        ty = rng.uniform(0, max(canvas - span, 1))
        h = np.array([[s * c, -s * sn, tx],
                      [s * sn, s * c, ty],
                      [rng.uniform(-1, 1) * 2e-5, rng.uniform(-1, 1) * 2e-5,
                       1.0]], np.float32)
        homs[i] = h
    return homs


def honest_batch(rng, b, canvas, num_joints, side_in):
    canvases = np.asarray(
        rng.randint(0, 255, (b, canvas, canvas, 3), dtype=np.uint8))
    homs = realistic_homs(rng, b, canvas, side_in)
    extents = np.tile([canvas, canvas], (b, 1)).astype(np.int32)
    true_cam = rng.uniform(-400, 400, (b, num_joints, 3)).astype(np.float32)
    true_cam[..., 2] += 3000.0
    true_mat = rng.uniform(20, 230, (b, num_joints, 2)).astype(np.float32)
    intr = np.tile(np.array([[1400., 0., 128.], [0., 1400., 128.],
                             [0., 0., 1.]], np.float32), (b, 1, 1))
    true_val = np.ones((b, num_joints), bool)
    quads = np.stack([
        np.stack([rng.uniform(10, 60, b), rng.uniform(10, 60, b)], -1),
        np.stack([rng.uniform(200, 250, b), rng.uniform(10, 60, b)], -1),
        np.stack([rng.uniform(200, 250, b), rng.uniform(200, 250, b)], -1),
        np.stack([rng.uniform(10, 60, b), rng.uniform(200, 250, b)], -1),
    ], axis=1).astype(np.float32)
    return dict(canvases=jnp.asarray(canvases), homs=jnp.asarray(homs),
                extents=jnp.asarray(extents), true_cam=jnp.asarray(true_cam),
                true_mat=jnp.asarray(true_mat), intr=jnp.asarray(intr),
                true_val=jnp.asarray(true_val), quads=jnp.asarray(quads))


def run_honest(canvas=512):
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    args = make_args(extra_channel=True, joint_space=True)
    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx, (jnp.ones((1, args.side_in, args.side_in, 4)),))
    train_step = steps.make_joint_train_step(model, args, 2, tx,
                                             do_track=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, d, key, lr):
        image = augment.process_color_batch.__wrapped__(
            d['canvases'], d['homs'], d['extents'], key, args.side_in,
            True, False)
        mask = augment.bbox_mask_channel(d['quads'], args.side_in)
        image = jnp.concatenate([image, mask], axis=-1)
        batch = dict(image=image, true_cam=d['true_cam'],
                     true_mat=d['true_mat'], intrinsics=d['intr'],
                     true_val=d['true_val'])
        return train_step(state, batch, lr)

    rng = np.random.RandomState(0)
    d = honest_batch(rng, args.batch_size, canvas, args.num_joints,
                     args.side_in)
    key = jax.random.PRNGKey(0)

    holder = {'state': state}

    def once(i):
        holder['state'], out = full_step(holder['state'], d,
                                         jax.random.fold_in(key, i), 1e-4)
        return out['cam_loss']

    dt = timeit(once)
    emit(exp=f'honest{canvas}_bs128', ms=round(dt * 1000, 2),
         img_s=round(args.batch_size / dt, 1))


def run_aug_sweep():
    from pose_tpu.data import augment

    args = make_args()
    rng = np.random.RandomState(1)
    b = args.batch_size
    for canvas in (512, 384, 320):
        d = honest_batch(rng, b, canvas, args.num_joints, args.side_in)

        def once(i, d=d):
            img = augment.process_color_batch(
                d['canvases'], d['homs'], d['extents'],
                jax.random.fold_in(jax.random.PRNGKey(0), i), args.side_in,
                True, False)
            return img
        dt = timeit(once)
        emit(exp=f'aug_canvas{canvas}_bs128', ms=round(dt * 1000, 2))


def s2d_kernel(k7):
    """(7,7,C,F) -> (4,4,4C,F) space-to-depth stem kernel."""
    kp = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    c, f = k7.shape[2], k7.shape[3]
    kp = kp.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return kp.reshape(4, 4, 4 * c, f)


def s2d_input(x):
    """(B,257,257,C) -> (B,132,132,4C) with pad ((4,3),(4,3))."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 3), (4, 3), (0, 0)))
    hp, wp = h + 7, w + 7
    xp = xp.reshape(b, hp // 2, 2, wp // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(b, hp // 2, wp // 2, 4 * c)


def run_stem_s2d():
    b, c = 128, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, 257, 257, c).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, c, 64) * 0.05).astype(np.float32))

    def conv_std(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    def conv_s2d(x, k):
        return jax.lax.conv_general_dilated(
            s2d_input(x), s2d_kernel(k), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    # numeric check in fp32
    a = conv_std(x[:2], k)
    bb = conv_s2d(x[:2], k)
    err = float(jnp.max(jnp.abs(a - bb)))
    emit(exp='stem_s2d_check', max_abs_err=err,
         shapes=[list(a.shape), list(bb.shape)])

    xb = x.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)

    for name, conv in (('std', conv_std), ('s2d', conv_s2d)):
        @jax.jit
        def fwdbwd(x, k, conv=conv):
            def loss(k):
                o = conv(x, k)
                return jnp.sum(o * o * 1e-6)
            l, g = jax.value_and_grad(loss)(k)
            return l, jnp.sum(g)

        dt = timeit(lambda i: fwdbwd(xb, kb)[0])
        emit(exp=f'stem_{name}_fwdbwd_bs128', ms=round(dt * 1000, 3))


def run_stage4_s2b():
    b = 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, 17, 17, 512).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray((rng.randn(3, 3, 512, 512) * 0.02).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def conv_dil(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)), rhs_dilation=(2, 2),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    def conv_s2b(x, k):
        bb, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # 17 -> 18
        xp = xp.reshape(bb, 9, 2, 9, 2, c).transpose(0, 2, 4, 1, 3, 5)
        xp = xp.reshape(bb * 4, 9, 9, c)
        o = jax.lax.conv_general_dilated(
            xp, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        o = o.reshape(bb, 2, 2, 9, 9, -1).transpose(0, 3, 1, 4, 2, 5)
        o = o.reshape(bb, 18, 18, -1)
        return o[:, :17, :17]

    a = conv_dil(x[:2].astype(jnp.float32), k.astype(jnp.float32))
    c2 = conv_s2b(x[:2].astype(jnp.float32), k.astype(jnp.float32))
    emit(exp='stage4_s2b_check',
         max_abs_err=float(jnp.max(jnp.abs(a - c2))))

    for name, conv in (('dil', conv_dil), ('s2b', conv_s2b)):
        @jax.jit
        def fwdbwd(x, k, conv=conv):
            def loss(k):
                o = conv(x, k)
                return jnp.sum(o * o * 1e-6)
            l, g = jax.value_and_grad(loss)(k)
            return l, jnp.sum(g)

        dt = timeit(lambda i: fwdbwd(x, k)[0])
        emit(exp=f'stage4_{name}_fwdbwd_bs128', ms=round(dt * 1000, 3))


def run_light_control():
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    args = make_args()
    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx, (jnp.ones((1, args.side_in, args.side_in, 3)),))
    train_step = steps.make_cam_train_step(model, args, 2, tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, canvases, homs, extents, key, true_cam, true_val,
                  lr):
        image = augment.process_color_batch.__wrapped__(
            canvases, homs, extents, key, args.side_in, True, False)
        return train_step(state, dict(image=image, true_cam=true_cam,
                                      true_val=true_val), lr)

    rng = np.random.RandomState(0)
    b = args.batch_size
    canvas = 384
    canvases = jnp.asarray(
        rng.randint(0, 255, (b, canvas, canvas, 3), dtype=np.uint8))
    homs = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    homs[:, 0, 0] = canvas / args.side_in
    homs[:, 1, 1] = canvas / args.side_in
    homs += rng.uniform(-1e-3, 1e-3, homs.shape).astype(np.float32)
    extents = jnp.asarray(np.tile([canvas, canvas], (b, 1)).astype(np.int32))
    true_cam = jnp.asarray(
        rng.uniform(-400, 400, (b, args.num_joints, 3)).astype(np.float32))
    true_val = jnp.ones((b, args.num_joints), jnp.bool_)
    key = jax.random.PRNGKey(0)
    holder = {'state': state}

    def once(i):
        holder['state'], out = full_step(
            holder['state'], canvases, jnp.asarray(homs), extents,
            jax.random.fold_in(key, i), true_cam, true_val, 1e-4)
        return out['cam_loss']

    dt = timeit(once)
    emit(exp='light384_bs128_control', ms=round(dt * 1000, 2),
         img_s=round(b / dt, 1))


def main():
    emit(devices=[str(d) for d in jax.devices()])
    for fn in (run_honest, run_aug_sweep, run_stem_s2d, run_stage4_s2b,
               run_light_control):
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            emit(exp=fn.__name__, error=repr(e)[:500])
        emit(done=fn.__name__, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
