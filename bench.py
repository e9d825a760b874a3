"""Benchmark: images/sec/chip for the headline config — on-device
augmentation (homography warp + photometric chain) + ResNet-50 volumetric
pose forward+backward+Adam at 257x257, stride 16, 19 joints, 16 depth bins
(cmu_train.sh architecture). Batch 128 (throughput-optimal on v5e; the
reference trained at 64 — our bs64 figure is 1011 img/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor is
a documented estimate of the reference's images/sec on its 1-GPU training
point (fp16 ResNet-50 fwd+bwd at 257^2 on a V100-class card with the
per-sample cv2 DataLoader in front): ~240 img/s. The north star is >=5x.
"""

import json
import time
import types

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_GPU_IPS = 240.0


def build(args):
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx,
        (jnp.ones((1, args.side_in, args.side_in, 3)),))
    train_step = steps.make_cam_train_step(model, args, 2, tx)

    canvas = 384

    @jax.jit
    def full_step(state, canvases, homographies, extents, key, true_cam,
                  true_val, lr):
        image = augment.process_color_batch.__wrapped__(
            canvases, homographies, extents, key, args.side_in, True, False)
        return train_step(state, dict(image=image, true_cam=true_cam,
                                      true_val=true_val), lr)

    rng = np.random.RandomState(0)
    b = args.batch_size
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

    def run_once(state, i):
        return full_step(state, canvases, homs, extents,
                         jax.random.fold_in(key, i), true_cam, true_val,
                         1e-4)

    return state, run_once


def main():
    args = types.SimpleNamespace(
        model='resnet50', criterion='SmoothL1', half_acc=True,
        extra_channel=False, joint_space=False, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=257, stride=16, num_joints=19, depth=16, batch_size=128,
        depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)

    state, run_once = build(args)

    # warmup/compile; a value fetch is the only reliable device sync through
    # the axon relay (block_until_ready can return before execution finishes)
    for i in range(3):
        state, out = run_once(state, i)
    float(out['cam_loss'])

    n_steps = 60
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, out = run_once(state, 100 + i)
    float(out['cam_loss'])
    dt = time.perf_counter() - t0

    ips = args.batch_size * n_steps / dt
    print(json.dumps({
        'metric': 'images/sec/chip (aug+fwd-bwd), ResNet-50 pose 257^2 bs128',
        'value': round(ips, 2),
        'unit': 'images/sec',
        'vs_baseline': round(ips / REFERENCE_GPU_IPS, 3),
    }))


if __name__ == '__main__':
    main()
