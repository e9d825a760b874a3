"""Round-2: end-to-end HOST-FED throughput (VERDICT round-2 item 4).

Drives the real PoseLoader — native C++ JPEG pool decode, vectorized
funcam camera math, producer-thread overlap, device shard — into the honest
config-1 train step for >=30 steps, and breaks down where the host time
goes. The reference's bottleneck was exactly this host pipeline (per-sample
cv2 in DataLoader workers, datasets.py:124-146).

Note this box has ONE vCPU: the decode pool cannot parallelize here, so the
host ceiling is the single-core libjpeg rate. The breakdown separates
per-image decode cost (scales with cores in production) from the per-batch
camera math and the device step.
"""

import json
import sys
import time
import types

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit


def make_args(metadata_path, **over):
    base = dict(model='resnet50', criterion='SmoothL1', half_acc=True,
                depth=16, num_joints=19, depth_range=1000.0, side_in=257,
                stride=16, grad_norm=5.0, weight_decay=4e-5, loss_div=10.0,
                learn_rate=1e-4, n_epochs=1, do_track=True, joint_space=True,
                extra_channel=True, shuffle=True, geometry=True, colour=True,
                eraser=False, occluder=False, occ_path=None, occ_count=0,
                batch_size=128, data_name='cmu', metadata_path=metadata_path,
                random_zoom=0.9, n_cudas=1, workers=1,
                skip_relu=False, early_dist=False, depth_only=False)
    base.update(over)
    return types.SimpleNamespace(**base)


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.data.synthetic import make_cmu_fixture
    from pose_tpu.data.loader import PoseLoader
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.parallel import shard_batch
    from datasets import build_info

    root = '/tmp/hostfeed_cmu'
    import os
    if not os.path.exists(os.path.join(root, 'samples.pkl')):
        t0 = time.perf_counter()
        make_cmu_fixture(root, num_train=256, num_valid=8,
                         imshape=(512, 512))
        emit(fixture_built_s=round(time.perf_counter() - t0, 1))

    meta = os.path.join(root, 'metadata.json')
    args = make_args(meta)
    loader = PoseLoader(args, 'train', build_info('cmu'))
    emit(native_pool=loader._native is not None, n=len(loader.samples),
         steps_per_epoch=len(loader))

    # ---- host-side breakdown (no device) -------------------------------
    idxs = np.arange(args.batch_size)
    t0 = time.perf_counter()
    batch, paths = loader.parse_batch(idxs)
    parse_ms = (time.perf_counter() - t0) * 1000
    for _ in range(2):   # warm page cache
        loader._decode_images(paths, loader.canvas, loader._native)
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        loader._decode_images(paths, loader.canvas, loader._native)
    dec_ms = (time.perf_counter() - t0) * 1000 / n_rep
    emit(exp='host_breakdown_bs128', parse_batch_ms=round(parse_ms, 1),
         decode_ms=round(dec_ms, 1),
         decode_ms_per_img=round(dec_ms / args.batch_size, 2))

    # device transfer cost of one batch of canvases
    full = loader._decode_batch(idxs)
    t0 = time.perf_counter()
    dev = shard_batch(loader.mesh, {'canvas': full['canvas']})
    float(jnp.ravel(dev['canvas'])[0].astype(jnp.float32))
    emit(exp='transfer_canvas_bs128',
         ms=round((time.perf_counter() - t0) * 1000, 1),
         mbytes=round(full['canvas'].nbytes / 1e6, 1))

    # ---- e2e: loader -> honest train step ------------------------------
    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx, (jnp.ones((1, args.side_in, args.side_in, 4)),))
    step = steps.make_joint_train_step(model, args, 2, tx, do_track=True)
    dev_keys = ('image', 'true_cam', 'true_val', 'true_mat', 'intrinsics')

    def run_steps(n_target):
        nonlocal state
        done = 0
        t_start = None
        while done < n_target + 2:
            for batch in loader:
                db = {k: batch[k] for k in dev_keys if k in batch}
                state, out = step(state, db, 1e-4)
                done += 1
                if done == 2:           # past compile
                    float(out['cam_loss'])
                    t_start = time.perf_counter()
                    done_at_start = done
                if done >= n_target + 2:
                    break
        float(out['cam_loss'])
        dt = time.perf_counter() - t_start
        n = done - done_at_start
        return dt / n

    per_step = run_steps(30)
    emit(exp='e2e_hostfed_bs128', ms=round(per_step * 1000, 1),
         img_s=round(args.batch_size / per_step, 1))


if __name__ == '__main__':
    main()
