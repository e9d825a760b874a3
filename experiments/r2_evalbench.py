"""Round-2: val_only epoch throughput — gather (strict cv2 parity, default)
vs MXU eval warp (POSE_TPU_EVAL_WARP=mxu, VERDICT round-2 item 8).

Reuses the /tmp/hostfeed_cmu fixture (512^2 JPEG canvases). Measures the
device-side eval path (warp + forward + decode) per batch for both
resamplers at the honest shape, plus one real host-fed val epoch for
wall-clock context.
"""

import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, honest_batch
from r2_hostfeed import make_args


def run_device_only():
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.data import augment

    args = make_args('unused', batch_size=64, extra_channel=False,
                     joint_space=True)
    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    state = steps.init_state(
        model, args, tx, (jnp.ones((1, args.side_in, args.side_in, 3)),))
    eval_step = steps.make_rgb_eval_step(model, args, 2)

    rng = np.random.RandomState(3)
    d = honest_batch(rng, args.batch_size, 512, args.num_joints,
                     args.side_in)

    for impl in ('gather', 'mxu'):
        def once(i, impl=impl):
            image = augment.process_color_batch(
                d['canvases'], d['homs'], d['extents'],
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                args.side_in, False, False, warp_impl=impl)
            out = eval_step(state, dict(image=image,
                                        true_cam=d['true_cam'],
                                        true_mat=d['true_mat'],
                                        true_val=d['true_val']))
            return out['relat_cam']

        dt = timeit(once, n=10)
        emit(exp=f'eval_device_{impl}_512_bs64', ms=round(dt * 1000, 2),
             img_s=round(args.batch_size / dt, 1))


def main():
    emit(devices=[str(d) for d in jax.devices()])
    t0 = time.perf_counter()
    try:
        run_device_only()
    except Exception as e:
        emit(exp='run_device_only', error=repr(e)[:500])
    emit(done='run_device_only', wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
