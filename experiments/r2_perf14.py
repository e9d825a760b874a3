"""Round-2 perf #14: name the trunk's hot fusions. Compiles the honest
trunk-only step, pulls the optimized HLO text, and prints the instruction
mix inside the fusions the r2_perf9 trace ranked hottest."""

import re
import sys
import types

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit

HOT = ['fusion.50', 'fusion.906', 'fusion.903', 'fusion.13', 'fusion.5',
       'fusion.7', 'fusion.144', 'fusion.145', 'fusion.146', 'fusion.60',
       'fusion.606', 'fusion.1408', 'fusion.75', 'convert_reduce_fusion.33']


def main():
    emit(devices=[str(d) for d in jax.devices()])
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

    lowered = jax.jit(train_step.__wrapped__ if hasattr(train_step,
                                                        '__wrapped__')
                      else train_step).lower(state, batch, 1e-4)
    compiled = lowered.compile()
    try:
        txt = compiled.as_text()
    except Exception as e:
        emit(error='as_text failed: ' + repr(e)[:300])
        return
    emit(hlo_chars=len(txt))
    with open('/tmp/trunk_hlo.txt', 'w') as f:
        f.write(txt)
    emit(saved='/tmp/trunk_hlo.txt')


if __name__ == '__main__':
    main()
