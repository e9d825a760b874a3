"""Offline probe: cam-family end-metric convergence twin at FLOAT64.

Sizes the f64 replacement for TestTwinConvergenceMPJPE (the f32 version
fails post-BN-fix: multi-minima chaos, gap 1.27 mm). At f64 trajectories
should stay locked; measure runtime + descent + gap for basic and
bottleneck blocks.
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')

import numpy as np
import torch
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from test_torch_twin_steps import (
    build_small, make_args, load_twin, TorchTrunk, nchw,
    t_spec_cam, t_masked_loss, torch_adam_step, SIDE, J, D, STRIDE)
from pose_tpu.train import steps
from pose_tpu.train import losses as L

NB = 4
LR = 2e-5
CHECKPOINTS = [50, 150]

for block in ['basic', 'bottleneck']:
    rng = np.random.RandomState(23)
    batch = dict(
        image=rng.rand(NB, SIDE, SIDE, 3),
        true_cam=rng.uniform(-300, 300, (NB, J, 3)) + [0, 0, 2200],
        true_val=np.ones((NB, J), bool))
    args = make_args(batch_size=NB)
    crit = L.get_criterion(args.criterion)

    model = build_small('rgb', 3, block=block)
    to64 = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), jax.device_get(t))
    variables = to64(model.init(jax.random.PRNGKey(0),
                                jnp.ones((1, SIDE, SIDE, 3)), train=False))
    twin = load_twin(
        TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE, num_joints=J,
                   depth=D, block=block), variables).double()

    timg = jnp.asarray(batch['image'])
    tcam = jnp.asarray(batch['true_cam'])
    tval = jnp.asarray(batch['true_val'])

    def mpjpe(a, b):
        return float(np.mean(np.linalg.norm(
            np.asarray(a, np.float64) - np.asarray(b, np.float64),
            axis=-1)))

    def jax_mpjpe(params, stats):
        cam_feat = model.apply(
            {'params': params, 'batch_stats': stats}, timg, train=False)
        _, spec = steps.decode_spec_cam(cam_feat, D, J, args.depth_range,
                                        2, tcam)
        return mpjpe(jax.device_get(spec), batch['true_cam'])

    def torch_mpjpe():
        twin.eval()
        with torch.no_grad():
            cam_feat = twin(torch.from_numpy(nchw(batch['image'])))
            _, spec = t_spec_cam(
                cam_feat, torch.from_numpy(batch['true_cam']),
                args.depth_range, 2)
        twin.train()
        return mpjpe(spec.numpy(), batch['true_cam'])

    init = jax_mpjpe(variables['params'], variables['batch_stats'])
    print(f'[{block}] init MPJPE {init:.2f}', flush=True)

    # full-f64 replica of make_cam_train_step's math (the step factory
    # computes in _compute_dtype(args) = f32, so apply the model directly)
    tx = steps.make_optimizer(args)
    state = steps.TrainState(params=variables['params'],
                             batch_stats=variables['batch_stats'],
                             opt_state=tx.init(variables['params']),
                             step=jnp.zeros((), jnp.int32))

    @jax.jit
    def jstep(state):
        def loss_fn(params):
            cam_feat, upd = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                timg, train=True, mutable=['batch_stats'])
            _, spec = steps.decode_spec_cam(cam_feat, D, J,
                                            args.depth_range, 2, tcam)
            loss = L.masked_mean_loss(crit, spec, tcam, tval)
            return loss, upd['batch_stats']
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state2 = steps._update(tx, state, grads, LR).replace(
            batch_stats=new_stats)
        return state2, loss

    twin.train()
    image = torch.from_numpy(nchw(batch['image']))
    true_cam = torch.from_numpy(batch['true_cam'])
    valid = torch.from_numpy(batch['true_val'])
    opt = None

    done = 0
    t0 = time.time()
    for ck in CHECKPOINTS:
        for i in range(ck - done):
            state, jl = jstep(state)
            cam_feat = twin(image)
            _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
            loss = t_masked_loss(spec, true_cam, valid)
            _, opt = torch_adam_step(twin, loss, args, LR, opt=opt)
            if done + i < 3:
                print(f'  step {done+i}: jax_loss={float(jl):.9f} '
                      f'torch_loss={float(loss):.9f} '
                      f'rel_gap={abs(float(jl)-float(loss))/float(loss):.2e}',
                      flush=True)
        done = ck
        mj = jax_mpjpe(jax.device_get(state.params),
                       jax.device_get(state.batch_stats))
        mt = torch_mpjpe()
        print(f'[{block}] steps={ck:5d} t={time.time()-t0:7.1f}s '
              f'jax={mj:8.4f} torch={mt:8.4f} gap={abs(mj-mt)*1000:9.2f} um',
              flush=True)
