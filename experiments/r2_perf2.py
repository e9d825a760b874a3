"""Round-2 perf exploration #2: decompose the honest-config 121.45 ms step.

  a. stem 7x7/2 conv: standard vs space-to-depth, fwd+bwd, correct bf16
     cotangents this time (loss casts the fp32 output back to bf16's grad
     path by summing the bf16 activations).
  b. stage-4 dilated conv vs space-to-batch, fwd+bwd.
  c. maxpool 3x3/2 fwd+bwd at the stem shape (select-and-scatter cost).
  d. aug stage decomposition at bs128/512^2: warp-only, colour-chain-only,
     full aug in bf16.
  e. honest trunk-only step (pre-augmented images): isolates aug vs train.
"""

import functools
import json
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
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(warmup + i)
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    return (time.perf_counter() - t0) / n


def s2d_kernel(k7):
    kp = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    c, f = k7.shape[2], k7.shape[3]
    kp = kp.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return kp.reshape(4, 4, 4 * c, f)


def s2d_input(x):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 3), (4, 3), (0, 0)))
    hp, wp = h + 7, w + 7
    xp = xp.reshape(b, hp // 2, 2, wp // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(b, hp // 2, wp // 2, 4 * c)


def _bench_fwdbwd(name, conv, x, k):
    @jax.jit
    def fwdbwd(x, k):
        def loss(k):
            o = conv(x, k)
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
        l, g = jax.value_and_grad(loss)(k)
        return l, jnp.sum(g.astype(jnp.float32))

    dt = timeit(lambda i: fwdbwd(x, k)[0])
    emit(exp=name, ms=round(dt * 1000, 3))


def run_stem():
    b, c = 128, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, 257, 257, c)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(7, 7, c, 64) * 0.05).astype(jnp.bfloat16)

    def conv_std(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def conv_s2d(x, k):
        return jax.lax.conv_general_dilated(
            s2d_input(x), s2d_kernel(k), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    _bench_fwdbwd('stem_std_fwdbwd_bs128', conv_std, x, k)
    _bench_fwdbwd('stem_s2d_fwdbwd_bs128', conv_s2d, x, k)


def run_stage4():
    b = 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, 17, 17, 512)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 512, 512) * 0.02).astype(jnp.bfloat16)

    def conv_dil(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)), rhs_dilation=(2, 2),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def conv_s2b(x, k):
        bb, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        xp = xp.reshape(bb, 9, 2, 9, 2, c).transpose(0, 2, 4, 1, 3, 5)
        xp = xp.reshape(bb * 4, 9, 9, c)
        o = jax.lax.conv_general_dilated(
            xp, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        o = o.reshape(bb, 2, 2, 9, 9, -1).transpose(0, 3, 1, 4, 2, 5)
        o = o.reshape(bb, 18, 18, -1)
        return o[:, :17, :17]

    _bench_fwdbwd('stage4_dil_fwdbwd_bs128', conv_dil, x, k)
    _bench_fwdbwd('stage4_s2b_fwdbwd_bs128', conv_s2b, x, k)


def run_maxpool():
    import flax.linen as nn
    b = 128
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(b, 129, 129, 64)).astype(jnp.bfloat16)

    @jax.jit
    def fwdbwd(x):
        def loss(x):
            o = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
        l, g = jax.value_and_grad(loss)(x)
        return l, jnp.sum(g.astype(jnp.float32))

    dt = timeit(lambda i: fwdbwd(x)[0])
    emit(exp='maxpool_129_fwdbwd_bs128', ms=round(dt * 1000, 3))


def _honest_batch_parts(rng, b, canvas):
    import experiments.r2_perf1 as p1
    return p1.honest_batch(rng, b, canvas, 19, 257)


def run_aug_decomp():
    from pose_tpu.ops import warp, colour

    rng = np.random.RandomState(5)
    b, canvas = 128, 512
    import sys
    sys.path.insert(0, '/root/repo/experiments')
    import r2_perf1 as p1
    d = p1.honest_batch(rng, b, canvas, 19, 257)

    @jax.jit
    def warp_only(canvases, homs, extents):
        images = canvases.astype(jnp.float32) / 255.0
        crops = warp.warp_batch_mxu.__wrapped__(images, homs, (257, 257),
                                                extents)
        return jnp.clip(crops, 0.0, 1.0)

    dt = timeit(lambda i: warp_only(d['canvases'], d['homs'], d['extents']))
    emit(exp='warp_only_512_bs128', ms=round(dt * 1000, 2))

    crops0 = warp_only(d['canvases'], d['homs'], d['extents'])
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chain_only(crops, key):
        keys = jax.random.split(key, crops.shape[0])
        out = colour.random_color_batch(crops, keys)
        return colour.normalize_imagenet(out)

    dt = timeit(lambda i: chain_only(crops0, jax.random.fold_in(key, i)))
    emit(exp='colour_chain_only_bs128', ms=round(dt * 1000, 2))

    @jax.jit
    def aug_bf16(canvases, homs, extents, key):
        images = canvases.astype(jnp.bfloat16) / 255.0
        crops = warp.warp_batch_mxu.__wrapped__(images, homs, (257, 257),
                                                extents)
        crops = jnp.clip(crops, 0.0, 1.0).astype(jnp.bfloat16)
        keys = jax.random.split(key, crops.shape[0])
        out = colour.random_color_batch(crops, keys)
        return colour.normalize_imagenet(out)

    dt = timeit(lambda i: aug_bf16(d['canvases'], d['homs'], d['extents'],
                                   jax.random.fold_in(key, i)))
    emit(exp='aug_bf16_512_bs128', ms=round(dt * 1000, 2))


def run_trunk_only():
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

    dt = timeit(once)
    emit(exp='honest_trunk_only_bs128', ms=round(dt * 1000, 2),
         img_s=round(b / dt, 1))


def main():
    emit(devices=[str(d) for d in jax.devices()])
    for fn in (run_stem, run_stage4, run_maxpool, run_aug_decomp,
               run_trunk_only):
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            emit(exp=fn.__name__, error=repr(e)[:500])
        emit(done=fn.__name__, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
