"""Round-2 perf #7: the split warp (prescale + banded residual) at the
honest 512^2/bs128 shape.

  1. gate: split_band_ok on the realistic crop homographies.
  2. numerics: split vs exact-mxu warp on a natural-ish canvas (interior and
     full max/mean).
  3. aug-only timing with warp_impl='split'.
  4. honest full step (joint_space+do_track+extra_channel) with split warp.
"""

import functools
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, make_args, honest_batch


def run_gate_and_numerics():
    from pose_tpu.ops import warp

    rng = np.random.RandomState(7)
    d = honest_batch(rng, 128, 512, 19, 257)
    homs = np.asarray(d['homs'])
    ok = warp.split_band_ok(homs, (257, 257), m=256, band=48)
    emit(exp='split_gate_honest', ok=bool(ok))

    # natural-ish canvas: smooth gradients + texture
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    base = np.stack([np.sin(yy / 23.0) + np.cos(xx / 17.0),
                     (yy + xx) / 1024.0,
                     np.sin((yy + 2 * xx) / 31.0)], -1)
    base = (base - base.min()) / (base.max() - base.min())
    tex = rng.rand(512, 512, 3).astype(np.float32) * 0.25
    img = np.clip(base + tex, 0, 1).astype(np.float32)
    imgs = jnp.asarray(np.tile(img[None], (8, 1, 1, 1)))
    h8 = jnp.asarray(homs[:8])
    e8 = jnp.asarray(np.asarray(d['extents'])[:8])

    ref = np.asarray(warp.warp_batch_mxu(imgs, h8, (257, 257), e8))
    sp = np.asarray(warp.warp_batch_split(imgs, h8, (257, 257), e8,
                                          m=256, band=48))
    dd = np.abs(sp - ref)
    emit(exp='split_numerics_512',
         mean=round(float(dd.mean()), 6), max=round(float(dd.max()), 5),
         inner_max=round(float(dd[:, 2:-2, 2:-2, :].max()), 5))


def run_aug_split():
    from pose_tpu.data import augment

    rng = np.random.RandomState(1)
    d = honest_batch(rng, 128, 512, 19, 257)

    def once(i):
        return augment.process_color_batch(
            d['canvases'], d['homs'], d['extents'],
            jax.random.fold_in(jax.random.PRNGKey(0), i), 257,
            True, False, warp_impl='split')

    dt = timeit(once)
    emit(exp='aug_split_512_bs128', ms=round(dt * 1000, 2))


def run_honest_split(canvas=512):
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
            True, False, warp_impl='split')
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
    emit(exp=f'honest{canvas}_split_bs128', ms=round(dt * 1000, 2),
         img_s=round(args.batch_size / dt, 1))


def main():
    emit(devices=[str(dev) for dev in jax.devices()])
    for fn in (run_gate_and_numerics, run_aug_split, run_honest_split):
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            emit(exp=fn.__name__, error=repr(e)[:500])
        emit(done=fn.__name__, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
