"""Benchmark: images/sec/chip for the flagship config-1 training step —
the full cmu_train.sh flag set (`-joint_space -do_track -extra_channel`,
reference cmu_train.sh:5-24, losses train.py:55-142): on-device augmentation
(homography warp + photometric chain + bbox-mask extra channel) + ResNet-50
dual-head volumetric pose forward+backward+Adam at 257x257, stride 16,
19 joints, 16 depth bins. Representative inputs: 512^2 uint8 canvases and
~384->257 crop homographies with random placement/zoom/rotation/perspective,
as the runtime loader produces them. Batch 128 (throughput-optimal on v5e;
the reference trained at 64).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor is
a documented estimate of the reference's images/sec on its 1-GPU training
point (fp16 ResNet-50 fwd+bwd at 257^2 on a V100-class card with the
per-sample cv2 DataLoader in front): ~240 img/s. The north star is >=5x.
"""

import functools
import json
import time
import types

import numpy as np

import jax
import jax.numpy as jnp

from pose_tpu.utils.compile_cache import enable_compile_cache

# persistent XLA compilation cache (POSE_TPU_COMPILE_CACHE=off to disable):
# the bench program is identical run to run, so a later capture (e.g. the
# driver's round-end one) skips the minutes-long remote compile and spends
# its wall-clock inside the measured windows instead
enable_compile_cache()

REFERENCE_GPU_IPS = 240.0


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
        homs[i] = [[s * c, -s * sn, tx],
                   [s * sn, s * c, ty],
                   [rng.uniform(-1, 1) * 2e-5, rng.uniform(-1, 1) * 2e-5,
                    1.0]]
    return homs


def build(args, canvas=512):
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx,
        (jnp.ones((1, args.side_in, args.side_in, 4)),))
    train_step = steps.make_joint_train_step(model, args, 2, tx,
                                             do_track=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, d, key, i, lr):
        # fold_in inside the program: through a remote-dispatch transport a
        # separate host-side fold_in is one extra round trip per step
        key = jax.random.fold_in(key, i)
        # 'split' is the loader's production default on TPU; the bench homs
        # pass split_band_ok (same distribution the gate was designed for)
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
    b = args.batch_size
    d = dict(
        canvases=jnp.asarray(
            rng.randint(0, 255, (b, canvas, canvas, 3), dtype=np.uint8)),
        homs=jnp.asarray(realistic_homs(rng, b, canvas, args.side_in)),
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

    def run_once(state, i):
        return full_step(state, d, key, np.uint32(i), 1e-4)

    return state, run_once


def main():
    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=True, joint_space=True, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)

    state, run_once = build(args)

    # warmup/compile; a value fetch is the only reliable device sync through
    # the axon relay (block_until_ready can return before execution finishes)
    for i in range(3):
        state, out = run_once(state, i)
    float(out['cam_loss'])

    # five fetch-synced windows, report the max (CLAUDE.md timing rule:
    # early windows can be polluted by transport queue effects). Measured
    # in-process spread across 6 such windows on chip: 1210.7-1213.4 img/s
    # = 0.22% (docs/ROUND3_NOTES.md), so max-of-N is a stable capture; the
    # remaining run-to-run variance is process-level transport state, and
    # extra windows (~4 s each, compile cached) buy downside insurance
    # against a transiently congested relay during any single window.
    ips = 0.0
    for w, n_steps in enumerate((40, 40, 40, 40, 40)):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, out = run_once(state, 100 + 1000 * w + i)
        float(out['cam_loss'])
        dt = time.perf_counter() - t0
        ips = max(ips, args.batch_size * n_steps / dt)
    print(json.dumps({
        'metric': ('images/sec/chip (aug+fwd-bwd), ResNet-50 pose 257^2 '
                   'bs128, full cmu_train.sh config '
                   '(joint_space+do_track+extra_channel, 512^2 canvases)'),
        'value': round(ips, 2),
        'unit': 'images/sec',
        'vs_baseline': round(ips / REFERENCE_GPU_IPS, 3),
    }))


if __name__ == '__main__':
    main()
