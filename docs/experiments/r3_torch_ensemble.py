"""Probe: the reference's OWN attractor envelope on the cam overfit.

Train the torch twin 4 times from the same init, perturbing one weight by
1 ulp in three of the runs (distinct layers). If the end MPJPEs spread by
~mm, the f32 multi-minima envelope is a property of the objective, not a
framework difference — and the right convergence-twin assertion is "JAX
lands inside torch's own envelope".
"""
import sys, time
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')

import numpy as np
import torch
import jax
import jax.numpy as jnp

from test_torch_twin_steps import (
    build_small, make_args, load_twin, TorchTrunk, nchw,
    t_spec_cam, t_masked_loss, torch_adam_step, SIDE, J, D, STRIDE)

NB = 8
LR = 2e-5
N_STEPS = 1000

rng = np.random.RandomState(23)
batch = dict(
    image=rng.rand(NB, SIDE, SIDE, 3).astype(np.float32),
    true_cam=(rng.uniform(-300, 300, (NB, J, 3))
              + [0, 0, 2200]).astype(np.float32),
    true_val=np.ones((NB, J), bool))
args = make_args(batch_size=NB)

model = build_small('rgb', 3)
variables = jax.device_get(model.init(
    jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)), train=False))


def mpjpe(a, b):
    return float(np.mean(np.linalg.norm(
        np.asarray(a, np.float64) - np.asarray(b, np.float64), axis=-1)))


def train_once(tag, perturb_key=None):
    twin = load_twin(
        TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE, num_joints=J,
                   depth=D, block='basic'), variables)
    if perturb_key is not None:
        with torch.no_grad():
            sd = dict(twin.named_parameters())
            w = sd[perturb_key]
            flat = w.view(-1)
            flat[0] = np.nextafter(float(flat[0]), np.inf)
    twin.train()
    image = torch.from_numpy(nchw(batch['image']))
    true_cam = torch.from_numpy(batch['true_cam'])
    valid = torch.from_numpy(batch['true_val'])
    opt = None
    t0 = time.time()
    for _ in range(N_STEPS):
        cam_feat = twin(image)
        _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
        loss = t_masked_loss(spec, true_cam, valid)
        _, opt = torch_adam_step(twin, loss, args, LR, opt=opt)
    twin.eval()
    with torch.no_grad():
        cam_feat = twin(image)
        _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
    m = mpjpe(spec.numpy(), batch['true_cam'])
    print(f'{tag}: end MPJPE {m:.4f} mm  ({time.time()-t0:.0f}s)',
          flush=True)
    return m


names = [n for n, _ in TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                  num_joints=J, depth=D,
                                  block='basic').named_parameters()]
ms = [train_once('base')]
for key in ['conv1.weight', 'layer2.0.conv1.weight', 'cam_regressor.weight']:
    assert key in names, (key, names[:10])
    ms.append(train_once(f'perturbed[{key}]', key))
print(f'ensemble: {[f"{m:.3f}" for m in ms]} '
      f'spread={max(ms)-min(ms):.3f} mm')
