"""Full-train-step numerical equivalence against torch twins (VERDICT round-2
item 5): for each BASELINE config family, load identical weights into the Flax
model and a torch replica of the reference's training math, feed the same
batch, and require agreement of

  * the loss value,
  * every parameter gradient,
  * the SECOND-step loss after a real optimizer step on each side (optax
    chain vs a persistent torch Adam+clip, the reference's order:
    clip -> wd-into-grad -> Adam) — elementwise post-step params are
    deliberately not compared: Adam's first-step update is
    sign-normalized, so elements with ~0 true gradient flip on roundoff
    (the optimizer chain has dedicated elementwise torch-parity tests in
    test_train.py), and
  * the BN batch statistics after a train-mode step.

This is the strongest MPJPE-parity evidence obtainable without the real
corpus (train.py:55-192, depth_train.py:161-283). Tolerances absorb the known
XLA:CPU-vs-torch conv drift (~1e-3 relative, CLAUDE.md) and torch's unbiased
running_var correction (documented in steps.py).

Measured max deviations are recorded in docs/PARITY.md.
"""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_tpu.models import PoseResNet
from pose_tpu.models.convert import variables_to_torch_state
from pose_tpu.train import steps

torch = pytest.importorskip('torch')
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_models import TorchTrunk, nchw

B, SIDE, J, D = 2, 65, 5, 4
STRIDE = 16


def build_small(variant, in_channels, joint_space=False, block='basic'):
    """One-block-per-stage PoseResNet matching the torch twins."""
    return PoseResNet(block=block, layers=(1, 1, 1, 1), variant=variant,
                      in_channels=in_channels, stride=STRIDE, num_joints=J,
                      depth=D, joint_space=joint_space)


def make_args(**over):
    base = dict(model='resnet18', criterion='SmoothL1', half_acc=False,
                extra_channel=False, joint_space=False, skip_relu=False,
                early_dist=False, depth_only=False, side_in=SIDE,
                stride=STRIDE, num_joints=J, depth=D, batch_size=B,
                depth_range=1000.0, grad_norm=5.0, weight_decay=4e-5,
                loss_div=10.0, do_freeze=False, sigmoid=False, bin_dist=False)
    base.update(over)
    return types.SimpleNamespace(**base)


# ------------------------------------------------------- torch decode/losses
# replicas of the reference's decode + loss math (utils.py:154-194,
# mat_utils.py:31-55, train.py:87-112, depth_train.py:115-129, :207)


def t_heatmap3d(feat, depth, joints):
    b, _, h, w = feat.shape
    vol = feat.view(b, depth, joints, h, w).permute(0, 2, 3, 4, 1)
    flat = vol.reshape(b, joints, -1)
    flat = F.softmax(flat, dim=2)
    return flat.view(b, joints, h, w, depth)


def t_decode3d(hm, depth_range):
    heat_y = hm.sum(dim=(3, 4))
    heat_x = hm.sum(dim=(2, 4))
    heat_z = hm.sum(dim=(2, 3))
    # grids follow the heatmap dtype so the f64 twin stays fully double
    gy = torch.linspace(0.0, 2.0, heat_y.shape[-1], dtype=hm.dtype)
    gx = torch.linspace(0.0, 2.0, heat_x.shape[-1], dtype=hm.dtype)
    gz = torch.linspace(0.0, 2.0, heat_z.shape[-1], dtype=hm.dtype)
    return torch.stack(((gx * heat_x).sum(-1), (gy * heat_y).sum(-1),
                        (gz * heat_z).sum(-1)), dim=2) * depth_range


def t_heatmap2d(feat, joints):
    b, _, h, w = feat.shape
    flat = F.softmax(feat.reshape(b, joints, -1), dim=2)
    return flat.view(b, joints, h, w)


def t_decode2d(hm, side_in):
    heat_x = hm.sum(dim=2)
    heat_y = hm.sum(dim=3)
    gx = torch.linspace(0.0, 1.0, heat_x.shape[-1])
    gy = torch.linspace(0.0, 1.0, heat_y.shape[-1])
    return torch.stack(((gx * heat_x).sum(-1), (gy * heat_y).sum(-1)),
                       dim=2) * side_in


def t_masked_loss(spec, true, valid):
    sel = valid.reshape(-1)
    return F.smooth_l1_loss(spec.reshape(-1, spec.shape[-1])[sel],
                            true.reshape(-1, spec.shape[-1])[sel])


def t_spec_cam(cam_feat, true_cam, depth_range, key_index):
    relat = t_decode3d(t_heatmap3d(cam_feat, D, J), depth_range)
    relat = relat - relat[:, key_index:key_index + 1]
    return relat, relat + true_cam[:, key_index:key_index + 1]


def t_recon(spec_mat, relat, intrinsics):
    unproject = torch.inverse(intrinsics).transpose(1, 2)
    ones = torch.ones(B, J, 1)
    normalized = (torch.cat([spec_mat, ones], dim=-1) @ unproject)[:, :, :2]
    eye = torch.eye(2).repeat(J, 1).unsqueeze(0).expand(B, -1, -1)
    A = torch.cat([eye, -normalized.reshape(B, -1, 1)], dim=-1)
    b = (normalized * relat[:, :, 2:] - relat[:, :, :2]).reshape(B, -1, 1)
    gram = A.transpose(1, 2) @ A
    root = torch.linalg.solve(gram, A.transpose(1, 2) @ b)
    return relat + root.transpose(1, 2)


# -------------------------------------------------------------- torch twins


class TorchFusion(tnn.Module):
    """fusionnet.py twin matching PoseResNet(variant='fusion', block='basic',
    layers=(1,1,1,1)) naming through the converter."""

    def __init__(self):
        super().__init__()
        from pose_tpu.models import stage_schedule
        s2, s3, s4, d2, d3, d4 = stage_schedule(STRIDE)
        from tests.test_models import TorchBasicBlock

        def block(inp, planes, stride, dilation):
            down = None
            if stride != 1 or inp != planes:
                down = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(planes))
            return TorchBasicBlock(inp, planes, stride, dilation, down)

        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(block(64, 64, 1, 1))
        self.layer2 = tnn.Sequential(block(64, 128, s2, d2))
        self.layer5 = tnn.Sequential(block(64, 64, 1, 1))
        self.layer6 = tnn.Sequential(block(64, 128, s2, d2))
        self.fusion = tnn.Module()
        self.fusion.conv = tnn.Conv2d(256, 128, 1, bias=False)
        self.fusion.bn = tnn.BatchNorm2d(128)
        self.layer3 = tnn.Sequential(block(128, 256, s3, d3))
        self.layer4 = tnn.Sequential(block(256, 512, s4, d4))
        self.regressor = tnn.Conv2d(512, D * J, 3, padding=1)

    def forward(self, x, y):
        h = self.layer2(self.layer1(self.maxpool(F.relu(self.bn1(self.conv1(x))))))
        g = self.layer6(self.layer5(self.maxpool(F.relu(self.bn2(self.conv2(y))))))
        f = F.relu(self.fusion.bn(self.fusion.conv(torch.cat([h, g], dim=1))))
        n = self.layer4(self.layer3(f))
        return self.regressor(n), n


def t_partial_conv(x, mask, weight, stride, padding, dilation=1):
    """Reference PartialConv semantics (partial_conv.py:6-58), bias-free."""
    kh, kw = weight.shape[2:]
    ones = torch.ones(1, 1, kh, kw, dtype=x.dtype)  # dtype-follow for f64
    with torch.no_grad():
        mask_raw = F.conv2d(mask, ones, stride=stride, padding=padding,
                            dilation=dilation)
        mult = (kh * kw) / (mask_raw + 1e-6)
        mask_out = mask_raw.clamp(0.0, 1.0)
        mult = mult * mask_out
    raw = F.conv2d(x * mask, weight, stride=stride, padding=padding,
                   dilation=dilation)
    return raw * mult, mask_out


class TorchPartialBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride,
                                dilation=dilation, padding=dilation,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride
        self.dilation = dilation

    def forward(self, x, veil):
        res = x
        out, veil = t_partial_conv(x, veil, self.conv1.weight, self.stride,
                                   self.dilation, self.dilation)
        out = F.relu(self.bn1(out))
        out, veil = t_partial_conv(out, veil, self.conv2.weight, 1, 1)
        out = self.bn2(out)
        if self.downsample is not None:
            res = self.downsample(x)
        return F.relu(out + res), veil


class TorchPartialTrunk(tnn.Module):
    """partial_depthnet.py twin of PoseResNet(variant='partial_depth')."""

    def __init__(self):
        super().__init__()
        from pose_tpu.models import stage_schedule
        from tests.test_models import TorchBasicBlock
        s2, s3, s4, d2, d3, d4 = stage_schedule(STRIDE)
        self.conv1 = tnn.Conv2d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(TorchPartialBlock(64, 64))
        down2 = tnn.Sequential(
            tnn.Conv2d(64, 128, 1, stride=s2, bias=False),
            tnn.BatchNorm2d(128))
        self.layer2 = tnn.Sequential(TorchPartialBlock(64, 128, s2, d2,
                                                       down2))

        def block(inp, planes, stride, dilation):
            down = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes))
            return TorchBasicBlock(inp, planes, stride, dilation, down)

        self.layer3 = tnn.Sequential(block(128, 256, s3, d3))
        self.layer4 = tnn.Sequential(block(256, 512, s4, d4))
        self.regressor = tnn.Conv2d(512, D * J, 3, padding=1)

    def forward(self, x):
        veil = (x != 0).to(x.dtype).amax(dim=1, keepdim=True)
        h, veil = t_partial_conv(x, veil, self.conv1.weight, 2, 3)
        h = self.maxpool(F.relu(self.bn1(h)))
        veil = self.maxpool(veil)
        h, veil = self.layer1[0](h, veil)
        h, veil = self.layer2[0](h, veil)
        n = self.layer4(self.layer3(h))
        return self.regressor(n), n


# ----------------------------------------------------------------- plumbing


def load_twin(twin, variables):
    state = {k: torch.from_numpy(np.array(v)) for k, v in
             variables_to_torch_state(variables).items()}
    missing, unexpected = twin.load_state_dict(state, strict=False)
    # every twin parameter must be filled; flax has no num_batches_tracked
    assert not [m for m in missing if 'num_batches_tracked' not in m], missing
    assert not unexpected, unexpected
    return twin


def torch_adam_step(twin, loss, args, lr, opt=None):
    """One torch backward+clip+Adam step; pass the returned `opt` back in
    for subsequent steps so the Adam moments/step count PERSIST (a fresh
    optimizer per step would silently reset them and desynchronize any
    multi-step comparison against the persistent optax state)."""
    if opt is None:
        opt = torch.optim.Adam(twin.parameters(), lr=lr,
                               weight_decay=args.weight_decay)
    loss.backward()
    grads = {n: p.grad.detach().clone() for n, p in twin.named_parameters()}
    torch.nn.utils.clip_grad_norm_(twin.parameters(), args.grad_norm)
    opt.step()
    opt.zero_grad()
    return grads, opt


def compare_trees(jax_tree, torch_dict, tol, what, floor_rel=1e-3):
    """Per-tensor max deviation relative to max(|tensor|, floor_rel * global
    max). The floor matters for gradients that are mathematically zero — e.g.
    the 2D-head bias, whose per-joint softmax is shift-invariant — where both
    sides hold pure roundoff noise and a per-tensor relative metric would
    compare noise to noise."""
    worst = ('', 0.0)
    state = variables_to_torch_state(jax_tree)
    refs = {k: torch_dict[k].detach().numpy() for k in state}
    global_max = max(float(np.max(np.abs(r))) for r in refs.values())
    for key, val in state.items():
        ref = refs[key]
        denom = max(float(np.max(np.abs(ref))), floor_rel * global_max)
        dev = float(np.max(np.abs(np.asarray(val, np.float64)
                                  - ref.astype(np.float64)))) / denom
        if dev > worst[1]:
            worst = (key, dev)
        assert dev < tol, f'{what} {key}: rel dev {dev:.2e} (tol {tol})'
    return worst


def rand_batch(rng, joint=False):
    batch = dict(
        image=rng.rand(B, SIDE, SIDE, 3).astype(np.float32),
        true_cam=(rng.uniform(-300, 300, (B, J, 3)) + [0, 0, 2200]
                  ).astype(np.float32),
        true_val=rng.rand(B, J) > 0.2)
    batch['true_val'][:, 2] = True   # key joint (key_index=2 everywhere):
    # the reference always has the root labeled — its GT value is added
    # back to predictions in decode_spec_cam
    if joint:
        batch['true_mat'] = rng.uniform(5, 60, (B, J, 2)).astype(np.float32)
        batch['intrinsics'] = np.tile(np.array(
            [[700., 0., 32.], [0., 700., 32.], [0., 0., 1.]], np.float32),
            (B, 1, 1))
    return batch


def run_two_jax_steps(args, step_factory, batch, variables, lr=1e-3,
                      loss_key='cam_loss'):
    tx = steps.make_optimizer(args)
    state = steps.TrainState(params=variables['params'],
                             batch_stats=variables['batch_stats'],
                             opt_state=tx.init(variables['params']),
                             step=jnp.zeros((), jnp.int32))
    step = step_factory(tx)
    losses = []
    for _ in range(2):
        state, out = step(state, batch, lr)
        losses.append(float(out[loss_key]))
    return state, losses, out


# -------------------------------------------------------------------- tests


class TestCamStep:
    """Config 1 (cam_train): loss, grads, 2-step Adam params, BN stats."""

    block = 'basic'

    def setup_method(self, _):
        self.args = make_args()
        self.model = build_small('rgb', 3, block=self.block)
        self.vars = jax.device_get(self.model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        self.twin = load_twin(
            TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE, num_joints=J,
                       depth=D, block=self.block), self.vars)
        self.batch = rand_batch(np.random.RandomState(1))

    def torch_loss(self):
        self.twin.train()
        cam_feat = self.twin(torch.from_numpy(nchw(self.batch['image'])))
        _, spec = t_spec_cam(cam_feat, torch.from_numpy(self.batch['true_cam']),
                             self.args.depth_range, 2)
        return t_masked_loss(spec, torch.from_numpy(self.batch['true_cam']),
                             torch.from_numpy(self.batch['true_val']))

    def test_loss_grads_params_stats(self):
        lr = 1e-3
        t_loss = self.torch_loss()
        t_grads, t_opt = torch_adam_step(self.twin, t_loss, self.args, lr)

        state, losses, _ = run_two_jax_steps(
            self.args,
            lambda tx: steps.make_cam_train_step(self.model, self.args, 2, tx),
            {k: jnp.asarray(v) for k, v in self.batch.items()},
            self.vars, lr)

        assert abs(losses[0] - float(t_loss)) / float(t_loss) < 1e-3

        # explicit gradient comparison through the same loss math
        def loss_fn(params):
            out, _ = steps._apply(self.model, params, self.vars['batch_stats'],
                                  (jnp.asarray(self.batch['image']),), True,
                                  jnp.float32)
            _, spec = steps.decode_spec_cam(
                out, D, J, self.args.depth_range, 2,
                jnp.asarray(self.batch['true_cam']))
            from pose_tpu.train import losses as L
            return L.masked_mean_loss(L.smooth_l1, spec,
                                      jnp.asarray(self.batch['true_cam']),
                                      jnp.asarray(self.batch['true_val']))

        grads = jax.device_get(jax.grad(loss_fn)(self.vars['params']))
        worst_g = compare_trees({'params': grads}, t_grads, 2e-2, 'grad')

        # second torch step: both sides took a real Adam step off the first
        # batch, so second-step loss agreement covers the full update wiring.
        # (Elementwise post-step params are NOT compared: Adam's first-step
        # update is sign(m)/sqrt(v)-normalized, so elements whose true
        # gradient is ~0 flip sign on roundoff noise — the optimizer chain
        # itself has dedicated torch-parity tests in test_train.py.)
        t_loss2 = self.torch_loss()
        torch_adam_step(self.twin, t_loss2, self.args, lr, opt=t_opt)
        assert abs(losses[1] - float(t_loss2)) / float(t_loss2) < 1e-3

        worst_s = compare_trees(
            {'batch_stats': jax.device_get(state.batch_stats)},
            dict(self.twin.named_buffers()), 2e-2, 'stat')
        print('cam max rel dev: grad %s=%.2e stat %s=%.2e'
              % (worst_g + worst_s))


class TestBottleneckCamStep(TestCamStep):
    """Config 1 on the Bottleneck trunk — the flagship resnet50's block
    (reference resnet.py:66-120, :239-262): same full-step equivalence as
    TestCamStep (loss, grads, real Adam step + second-step loss, BN stats)
    through the 1x1/3x3/1x1 expansion-4 path the 5x bench actually runs."""

    block = 'bottleneck'


class TestJointTrackStep:
    """Config 1 flagship (joint_train + do_track): dual heads + recon loss."""

    def test_loss_and_grads(self):
        args = make_args(joint_space=True)
        model = build_small('rgb', 3, joint_space=True)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                    num_joints=J, depth=D, joint_space=True),
                         variables)
        batch = rand_batch(np.random.RandomState(2), joint=True)

        twin.train()
        cam_feat, mat_feat = twin(torch.from_numpy(nchw(batch['image'])))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        spec_mat = t_decode2d(t_heatmap2d(mat_feat, J), SIDE)
        mat_loss = t_masked_loss(spec_mat, torch.from_numpy(batch['true_mat']),
                                 valid)
        relat, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
        cam_loss = t_masked_loss(spec, true_cam, valid)
        recon = t_recon(spec_mat, relat,
                        torch.from_numpy(batch['intrinsics']))
        recon_loss = t_masked_loss(recon, true_cam, valid)
        t_total = (cam_loss + mat_loss) * 0.5 + recon_loss
        t_total.backward()
        t_grads = {n: p.grad.detach().clone()
                   for n, p in twin.named_parameters()}

        from pose_tpu.ops import heatmap, recon as recon_ops
        from pose_tpu.train import losses as L

        def loss_fn(params):
            (cam_f, mat_f), _ = steps._apply(
                model, params, variables['batch_stats'],
                (jnp.asarray(batch['image']),), True, jnp.float32)
            sm = heatmap.decode2d(heatmap.to_heatmap2d(mat_f, J), SIDE)
            ml = L.masked_mean_loss(L.smooth_l1, sm,
                                    jnp.asarray(batch['true_mat']),
                                    jnp.asarray(batch['true_val']))
            relat, spec = steps.decode_spec_cam(
                cam_f, D, J, args.depth_range, 2,
                jnp.asarray(batch['true_cam']))
            cl = L.masked_mean_loss(L.smooth_l1, spec,
                                    jnp.asarray(batch['true_cam']),
                                    jnp.asarray(batch['true_val']))
            rc = recon_ops.recon_root(sm, relat,
                                      jnp.asarray(batch['intrinsics']))
            rl = L.masked_mean_loss(L.smooth_l1, rc,
                                    jnp.asarray(batch['true_cam']),
                                    jnp.asarray(batch['true_val']))
            return (cl + ml) * 0.5 + rl

        loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
        assert abs(float(loss) - float(t_total)) / float(t_total) < 1e-3
        worst = compare_trees({'params': jax.device_get(grads)}, t_grads,
                              2e-2, 'grad')
        print('joint+track max grad rel dev: %s=%.2e' % worst)


class TestVanillaDepthStep:
    """Config 2 (vanilla depth): loss_div scaling + (cam, tap) output."""

    def test_loss_and_grads(self):
        args = make_args(depth_only=True)
        model = build_small('depth', 1)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 1)),
            train=False))
        twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), in_ch=1,
                                    stride=STRIDE, num_joints=J, depth=D,
                                    variant='depth'), variables)
        rng = np.random.RandomState(3)
        image = (rng.rand(B, SIDE, SIDE, 1) * (rng.rand(B, SIDE, SIDE, 1)
                                               > 0.3)).astype(np.float32)
        batch = rand_batch(rng)
        batch['image'] = image

        twin.train()
        cam_feat, _ = twin(torch.from_numpy(nchw(image)))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
        t_loss = t_masked_loss(spec / args.loss_div, true_cam / args.loss_div,
                               valid)
        t_loss.backward()
        t_grads = {n: p.grad.detach().clone()
                   for n, p in twin.named_parameters()}

        from pose_tpu.train import losses as L

        def loss_fn(params):
            (cam_f, _), _ = steps._apply(
                model, params, variables['batch_stats'],
                (jnp.asarray(image),), True, jnp.float32)
            _, spec = steps.decode_spec_cam(
                cam_f, D, J, args.depth_range, 2,
                jnp.asarray(batch['true_cam']))
            return L.masked_mean_loss(
                L.smooth_l1, spec / args.loss_div,
                jnp.asarray(batch['true_cam']) / args.loss_div,
                jnp.asarray(batch['true_val']))

        loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
        assert abs(float(loss) - float(t_loss)) / float(t_loss) < 1e-3
        worst = compare_trees({'params': jax.device_get(grads)}, t_grads,
                              2e-2, 'grad')
        print('vanilla-depth max grad rel dev: %s=%.2e' % worst)


class TestFusionStep:
    """Config 3 (fusionnet): two stems + fusion block."""

    def test_loss_and_grads(self):
        args = make_args(do_fusion=True)
        model = build_small('fusion', 3)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            jnp.ones((1, SIDE, SIDE, 1)), train=False))
        twin = load_twin(TorchFusion(), variables)
        rng = np.random.RandomState(4)
        batch = rand_batch(rng)
        depth_in = (rng.rand(B, SIDE, SIDE, 1) * (rng.rand(B, SIDE, SIDE, 1)
                                                  > 0.3)).astype(np.float32)

        twin.train()
        cam_feat, _ = twin(torch.from_numpy(nchw(batch['image'])),
                           torch.from_numpy(nchw(depth_in)))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
        t_loss = t_masked_loss(spec / args.loss_div, true_cam / args.loss_div,
                               valid)
        t_loss.backward()
        t_grads = {n: p.grad.detach().clone()
                   for n, p in twin.named_parameters()}

        from pose_tpu.train import losses as L

        def loss_fn(params):
            (cam_f, _), _ = steps._apply(
                model, params, variables['batch_stats'],
                (jnp.asarray(batch['image']), jnp.asarray(depth_in)), True,
                jnp.float32)
            _, spec = steps.decode_spec_cam(
                cam_f, D, J, args.depth_range, 2,
                jnp.asarray(batch['true_cam']))
            return L.masked_mean_loss(
                L.smooth_l1, spec / args.loss_div,
                jnp.asarray(batch['true_cam']) / args.loss_div,
                jnp.asarray(batch['true_val']))

        loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
        assert abs(float(loss) - float(t_loss)) / float(t_loss) < 1e-3
        worst = compare_trees({'params': jax.device_get(grads)}, t_grads,
                              2e-2, 'grad')
        print('fusion max grad rel dev: %s=%.2e' % worst)


class TestPartialDepthStep:
    """Config 4 (partial_depthnet): mask-propagating stem + stages 1-2."""

    def test_loss_and_grads(self):
        args = make_args(depth_only=True, partial_conv=True)
        model = build_small('partial_depth', 1)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 1)),
            train=False))
        twin = load_twin(TorchPartialTrunk(), variables)
        rng = np.random.RandomState(5)
        image = (rng.rand(B, SIDE, SIDE, 1) * (rng.rand(B, SIDE, SIDE, 1)
                                               > 0.4)).astype(np.float32)
        batch = rand_batch(rng)

        twin.train()
        cam_feat, _ = twin(torch.from_numpy(nchw(image)))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
        t_loss = t_masked_loss(spec / args.loss_div, true_cam / args.loss_div,
                               valid)
        t_loss.backward()
        t_grads = {n: p.grad.detach().clone()
                   for n, p in twin.named_parameters()}

        from pose_tpu.train import losses as L

        def loss_fn(params):
            (cam_f, _), _ = steps._apply(
                model, params, variables['batch_stats'],
                (jnp.asarray(image),), True, jnp.float32)
            _, spec = steps.decode_spec_cam(
                cam_f, D, J, args.depth_range, 2,
                jnp.asarray(batch['true_cam']))
            return L.masked_mean_loss(
                L.smooth_l1, spec / args.loss_div,
                jnp.asarray(batch['true_cam']) / args.loss_div,
                jnp.asarray(batch['true_val']))

        loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
        assert abs(float(loss) - float(t_loss)) / float(t_loss) < 1e-3
        # wider tolerance: the partial renorm multiplies activations by
        # winsize/(coverage+1e-6), which amplifies the XLA:CPU-vs-torch conv
        # drift through stages 1-2 (observed ~5e-2 max on deep BN biases)
        worst = compare_trees({'params': jax.device_get(grads)}, t_grads,
                              8e-2, 'grad')
        print('partial-depth max grad rel dev: %s=%.2e' % worst)


class TestLockstepTrajectory:
    """Long-horizon equivalence (VERDICT r2 item 4): >=25 identical-batch
    Adam steps torch vs JAX in lockstep, per-step loss gap bounded. This is
    the best obtainable MPJPE-1mm evidence without the corpus — it covers
    the full fwd/bwd/clip/Adam/BN-update wiring compounding over an
    optimization trajectory (reference loop semantics train.py:114-118).

    Measured drift (XLA:CPU vs torch f32, recorded in docs/PARITY.md): the
    per-step relative loss gap stays at roundoff+conv-drift scale and does
    not blow up (basic max 2.7e-3; Bottleneck 4.3e-2 at the steepest
    descent point, where f32 conv drift amplifies — TestLockstepF64 pins
    the same trajectory at double precision to 2.2e-06)."""

    N_STEPS = 25

    @pytest.mark.parametrize('block', ['basic', 'bottleneck'])
    def test_25_step_loss_drift(self, block):
        # the reference's own CMU learning rate (cmu_train.sh:21): at toy-lr
        # 1e-3 the random-init trajectory is chaotic and backend drift
        # amplifies through it, which tests the drift of a divergent run,
        # not of training
        lr = 2e-5
        args = make_args()
        model = build_small('rgb', 3, block=block)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        twin = load_twin(
            TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE, num_joints=J,
                       depth=D, block=block), variables)
        batch = rand_batch(np.random.RandomState(11))
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

        tx = steps.make_optimizer(args)
        state = steps.TrainState(params=variables['params'],
                                 batch_stats=variables['batch_stats'],
                                 opt_state=tx.init(variables['params']),
                                 step=jnp.zeros((), jnp.int32))
        step = steps.make_cam_train_step(model, args, 2, tx)
        jax_losses = []
        for _ in range(self.N_STEPS):
            state, out = step(state, jbatch, lr)
            jax_losses.append(float(out['cam_loss']))

        twin.train()
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        image = torch.from_numpy(nchw(batch['image']))
        opt, torch_losses = None, []
        for _ in range(self.N_STEPS):
            cam_feat = twin(image)
            _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
            loss = t_masked_loss(spec, true_cam, valid)
            torch_losses.append(float(loss))
            _, opt = torch_adam_step(twin, loss, args, lr, opt=opt)

        # Drift metric: per-step |loss gap| normalized by the INITIAL loss
        # (the trajectory scale). On this 25-step run the loss collapses
        # ~10x, so a local-relative metric measures chaos near the floor,
        # not wiring drift; the trajectory-scale metric stays meaningful
        # through the descent. The tail is compared as the MEAN of the
        # last 5 losses per side, also at trajectory scale: by ~step 20
        # both trajectories oscillate on the overfit plateau with
        # backend-drift phase, so a single-final-step LOCAL-relative
        # comparison measures oscillation phase, not wiring (measured
        # post-BN-fix: single-step local final rel 1.3e-1 on the
        # Bottleneck while the f64 lockstep, TestLockstepF64, pins the
        # wiring at 3.2e-15). Measured (docs/PARITY.md): max basic
        # 2.7e-3 / bottleneck 4.3e-2 at the steepest descent point;
        # tail-mean ~1e-2 of initial on both.
        scale = torch_losses[0]
        gaps = [abs(a - b) / scale for a, b in zip(jax_losses, torch_losses)]
        tail_j = float(np.mean(jax_losses[-5:]))
        tail_t = float(np.mean(torch_losses[-5:]))
        tail_gap = abs(tail_j - tail_t) / scale
        print(f'\nlockstep {block}: loss gap / initial loss '
              f'first={gaps[0]:.2e} max={max(gaps):.2e} '
              f'last={gaps[-1]:.2e}; tail-mean gap={tail_gap:.2e}')
        print('  torch loss trajectory:',
              ' '.join(f'{v:.4f}' for v in torch_losses[::4]))
        print('  jax   loss trajectory:',
              ' '.join(f'{v:.4f}' for v in jax_losses[::4]))
        # the trajectory is a real descent on both sides
        assert torch_losses[-1] < 0.5 * torch_losses[0]
        assert jax_losses[-1] < 0.5 * jax_losses[0]
        assert max(gaps) < 6e-2, gaps
        assert tail_gap < 3e-2, (tail_j, tail_t)


@pytest.mark.slow
class TestTwinConvergenceMPJPE:
    """The MPJPE north star for the cam family: train the SAME data to
    near-overfit in both frameworks — identical init, batch, lr,
    Adam/clip/wd — then compare the trained models' eval-mode MPJPE
    (cam_mean, utils.py:237-276) against the reference's OWN
    arithmetic-variation envelope.

    Why an envelope and not pointwise equality: the reference's cam_train
    objective is raw-scale SmoothL1 (train.py:174 — errors stay in the L1
    region, so gradient magnitudes don't shrink near the floor and Adam
    settles into an oscillation band, not a point). Under PERSISTENT
    per-step arithmetic differences the settled end metric moves by ~1 mm
    — measured with torch-only controls (identical code, init and data):

        torch base                      4.4627 mm
        torch, one input pixel +1 ulp   5.9357 mm   (persistent forcing)
        torch, mkldnn conv backend off  5.6154 mm   (persistent forcing)
        JAX                             5.7344 mm   <- inside the envelope

    One-time perturbations (1-ulp init nudges in conv1/layer2/regressor)
    all wash out to the base endpoint (4.4627 mm, stable attractor), and
    at FLOAT64 the jax-vs-torch trajectories still decohere mid-descent
    (probe: 1.1 mm gap at step 150) because backend drift is injected
    every step — so XLA-vs-torch is exactly the persistent-forcing case,
    and landing inside torch's own persistent-forcing envelope is the
    correct equivalence statement. Exact end-point equality IS shown where
    the dynamics are contracting and comparison is well-posed: the
    distillation family at f64 (TestTwinConvergenceDistillMPJPE, 0.00 um)
    and the 25-step f64 lockstep (TestLockstepF64, first step 3.2e-15).

    The test retrains the base twin and ONE persistent-forcing control
    (+1 ulp on one input pixel) and asserts the JAX end metric sits within
    the [base, control] span padded by 50% of its width + 0.25 mm, and
    within 2 mm of the base absolutely."""

    # long enough to CONVERGE the overfit (mid-descent is where f32
    # trajectory drift peaks; measured: 60 steps = 90 mm, 300 = ~5 mm,
    # 1000 = settled ~4.5-6 mm band). ~10 min on the 1-vCPU box;
    # POSE_TPU_TWIN_STEPS shortens local iteration (the envelope
    # assertion only holds at the converged default).
    N_STEPS = int(os.environ.get('POSE_TPU_TWIN_STEPS', 1000))
    LR = 2e-5   # the reference's CMU rate (cmu_train.sh:21)
    NB = 8      # one full-batch overfit set

    @staticmethod
    def _mpjpe(spec, true_cam):
        return float(np.mean(np.linalg.norm(
            np.asarray(spec, np.float64) - np.asarray(true_cam, np.float64),
            axis=-1)))

    def _train_torch(self, variables, batch, args, image_np):
        twin = load_twin(
            TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE, num_joints=J,
                       depth=D, block='basic'), variables)
        twin.train()
        image = torch.from_numpy(nchw(image_np))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        opt = None
        for _ in range(self.N_STEPS):
            cam_feat = twin(image)
            _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
            loss = t_masked_loss(spec, true_cam, valid)
            _, opt = torch_adam_step(twin, loss, args, self.LR, opt=opt)
        twin.eval()
        with torch.no_grad():
            cam_feat = twin(torch.from_numpy(nchw(batch['image'])))
            _, spec = t_spec_cam(
                cam_feat, torch.from_numpy(batch['true_cam']),
                args.depth_range, 2)
        return self._mpjpe(spec.numpy(), batch['true_cam'])

    def test_trained_mpjpe_in_reference_envelope(self):
        rng = np.random.RandomState(23)
        batch = dict(
            image=rng.rand(self.NB, SIDE, SIDE, 3).astype(np.float32),
            true_cam=(rng.uniform(-300, 300, (self.NB, J, 3))
                      + [0, 0, 2200]).astype(np.float32),
            true_val=np.ones((self.NB, J), bool))
        args = make_args(batch_size=self.NB)

        model = build_small('rgb', 3)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))

        def jax_mpjpe(params, stats):
            out, _ = steps._apply(model, params, stats,
                                  (jnp.asarray(batch['image']),), False,
                                  jnp.float32)
            _, spec = steps.decode_spec_cam(
                out, D, J, args.depth_range, 2,
                jnp.asarray(batch['true_cam']))
            return self._mpjpe(jax.device_get(spec), batch['true_cam'])

        init_mpjpe = jax_mpjpe(variables['params'], variables['batch_stats'])

        tx = steps.make_optimizer(args)
        state = steps.TrainState(params=variables['params'],
                                 batch_stats=variables['batch_stats'],
                                 opt_state=tx.init(variables['params']),
                                 step=jnp.zeros((), jnp.int32))
        step = steps.make_cam_train_step(model, args, 2, tx)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        for _ in range(self.N_STEPS):
            state, out = step(state, jbatch, self.LR)
        mpjpe_jax = jax_mpjpe(jax.device_get(state.params),
                              jax.device_get(state.batch_stats))

        mpjpe_torch = self._train_torch(variables, batch, args,
                                        batch['image'])
        forced = batch['image'].copy()
        forced[0, 0, 0, 0] = np.nextafter(forced[0, 0, 0, 0], np.inf)
        mpjpe_ctrl = self._train_torch(variables, batch, args, forced)

        gap = abs(mpjpe_jax - mpjpe_torch)
        print(f'\nMPJPE after {self.N_STEPS} steps: init={init_mpjpe:.2f} '
              f'jax={mpjpe_jax:.3f} torch={mpjpe_torch:.3f} '
              f'torch+ulp={mpjpe_ctrl:.3f} gap={gap * 1000:.1f} um '
              f'envelope={abs(mpjpe_ctrl - mpjpe_torch) * 1000:.1f} um')
        # all three runs actually trained (substantial metric descent) ...
        for m in (mpjpe_jax, mpjpe_torch, mpjpe_ctrl):
            assert m < 0.5 * init_mpjpe, (m, init_mpjpe)
        # ... the reference's own persistent-forcing envelope is ~mm wide
        # (otherwise pointwise equality would be the right assertion) ...
        lo, hi = sorted((mpjpe_torch, mpjpe_ctrl))
        width = hi - lo
        # ... and the JAX end metric lies inside that envelope (padded)
        pad = 0.5 * width + 0.25
        assert lo - pad <= mpjpe_jax <= hi + pad, \
            (mpjpe_jax, mpjpe_torch, mpjpe_ctrl)
        assert gap < 2.0, (mpjpe_jax, mpjpe_torch)


class TestLockstepDistill:
    """Long-horizon equivalence of the privileged-information core: 25
    identical-batch distillation steps (frozen teacher in train-mode BN
    drifting its running stats, L2-norm feature distillation * alpha + cam
    loss, depth_train.py:161-283) torch vs JAX in lockstep. Covers the
    teacher-BN-drift feedback loop over a trajectory: each step's teacher
    features depend on the stats drifted by every previous step."""

    N_STEPS = 25

    def test_25_step_total_loss_drift(self):
        lr, alpha = 2e-5, 0.5
        args = make_args()
        model = build_small('depth', 3)
        teacher = build_small('depth', 3)
        s_vars = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        t_vars = jax.device_get(teacher.init(
            jax.random.PRNGKey(7), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        s_twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                      num_joints=J, depth=D,
                                      variant='depth'), s_vars)
        t_twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                      num_joints=J, depth=D,
                                      variant='depth'), t_vars)
        rng = np.random.RandomState(21)
        batch = rand_batch(rng)
        atten = rng.rand(B, 5, 5, 1).astype(np.float32)

        tx = steps.make_optimizer(args)
        state = steps.TrainState(params=s_vars['params'],
                                 batch_stats=s_vars['batch_stats'],
                                 opt_state=tx.init(s_vars['params']),
                                 step=jnp.zeros((), jnp.int32))
        step = steps.make_distill_train_step(model, teacher, args, 2, tx,
                                             teacher_is_fusion=False,
                                             with_semi=False)
        teacher_vars = dict(params=t_vars['params'],
                            batch_stats=t_vars['batch_stats'])
        device_batch = dict(color=jnp.asarray(batch['image']),
                            true_cam=jnp.asarray(batch['true_cam']),
                            true_val=jnp.asarray(batch['true_val']),
                            atten_map=jnp.asarray(atten))
        jax_totals = []
        for _ in range(self.N_STEPS):
            state, teacher_vars, out = step(state, teacher_vars,
                                            device_batch, jnp.float32(lr),
                                            jnp.float32(alpha))
            jax_totals.append(float(out['dist_loss']) * alpha
                              + float(out['cam_loss']))

        s_twin.train()
        t_twin.train()                            # train-mode teacher BN
        image = torch.from_numpy(nchw(batch['image']))
        t_atten = torch.from_numpy(atten.transpose(0, 3, 1, 2))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        opt, torch_totals = None, []
        for _ in range(self.N_STEPS):
            with torch.no_grad():
                _, teach_last = t_twin(image)     # drifts teacher stats
            cam_feat, last = s_twin(image)
            diff = (teach_last - last) * t_atten
            d_loss = torch.norm(diff.reshape(B, -1), dim=-1).mean()
            _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
            c_loss = t_masked_loss(spec / args.loss_div,
                                   true_cam / args.loss_div, valid)
            total = d_loss * alpha + c_loss
            torch_totals.append(float(total.detach()))
            _, opt = torch_adam_step(s_twin, total, args, lr, opt=opt)

        scale = torch_totals[0]
        gaps = [abs(a - b) / scale
                for a, b in zip(jax_totals, torch_totals)]
        final_rel = (abs(jax_totals[-1] - torch_totals[-1])
                     / abs(torch_totals[-1]))
        print(f'\nlockstep distill: total gap / initial '
              f'first={gaps[0]:.2e} max={max(gaps):.2e} '
              f'last={gaps[-1]:.2e}; final rel={final_rel:.2e}')
        print('  torch totals:',
              ' '.join(f'{v:.4f}' for v in torch_totals[::4]))
        print('  jax   totals:',
              ' '.join(f'{v:.4f}' for v in jax_totals[::4]))
        # distillation descends on both sides and drift stays bounded
        assert torch_totals[-1] < torch_totals[0]
        assert jax_totals[-1] < jax_totals[0]
        assert max(gaps) < 5e-2, gaps
        assert final_rel < 5e-2, final_rel


@pytest.mark.slow
class TestTwinConvergenceDistillMPJPE:
    """End-metric twin for the privileged-information core, run at FLOAT64:
    train the SAME student under the reference's distillation objective
    (frozen train-mode-BN teacher, attention-weighted L2 feature loss *
    alpha + cam loss, depth_train.py:161-283) to convergence in both
    frameworks, then compare the trained students' eval-mode MPJPE.

    Why f64: at f32 this synthetic distill overfit has MULTIPLE minima
    ~3 mm apart — measured across three designs (constant-lr, annealed,
    teacher-warm-started), the two frameworks' trajectories separate
    chaotically on the oscillating plateau and anneal into different
    attractors (end gaps 2.7-3.5 mm) even though the 25-step f32 lockstep
    drift is 2.3e-5 (TestLockstepDistill) — i.e. the objective and dynamics
    are equal; the f32 trajectories just can't be compared pointwise after
    hundreds of chaotic steps. At f64 the trajectories stay LOCKED to the
    end (first-step gap ~1e-15, cf. TestLockstepF64), so both frameworks
    descend into the same minimum together and the converged end metric is
    directly comparable — the 1 mm north-star statement for the
    distillation family. The f32-vs-f64 backend gap is pinned separately
    (TestPartialDepthF64, TestLockstepF64)."""

    # descent completes by ~step 100 (measured curve); the 2e-6 tail
    # settles the local point. Because the f64 trajectories are locked,
    # the GAP assertion holds at any step — only the descent assertions
    # need depth — so the suite default keeps the double-precision run
    # ~30 min on the 1-vCPU box (NB=4); a 300-step run is recorded in
    # docs/PARITY.md. POSE_TPU_TWIN_STEPS adjusts.
    N_STEPS = int(os.environ.get('POSE_TPU_TWIN_STEPS', 150))
    LR = 2e-5   # cmu_train.sh:21
    ALPHA = 0.5
    NB = 4

    def _lr(self, i):
        return self.LR if i <= (2 * self.N_STEPS) // 3 else self.LR * 0.1

    @staticmethod
    def _mpjpe(spec, true_cam):
        return float(np.mean(np.linalg.norm(
            np.asarray(spec, np.float64) - np.asarray(true_cam, np.float64),
            axis=-1)))

    def test_distilled_mpjpe_within_1mm(self):
        jax.config.update('jax_enable_x64', True)
        try:
            self._run()
        finally:
            jax.config.update('jax_enable_x64', False)

    def _run(self):
        from pose_tpu.train import losses as L

        rng = np.random.RandomState(31)
        batch = dict(
            image=rng.rand(self.NB, SIDE, SIDE, 3),
            true_cam=rng.uniform(-300, 300, (self.NB, J, 3)) + [0, 0, 2200],
            true_val=np.ones((self.NB, J), bool))
        atten = rng.rand(self.NB, 5, 5, 1)
        args = make_args(batch_size=self.NB)
        crit = L.get_criterion(args.criterion)

        model = build_small('depth', 3)
        teacher = build_small('depth', 3)
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), jax.device_get(t))
        s_vars = to64(model.init(jax.random.PRNGKey(0),
                                 jnp.ones((1, SIDE, SIDE, 3)), train=False))
        t_vars = to64(teacher.init(jax.random.PRNGKey(7),
                                   jnp.ones((1, SIDE, SIDE, 3)), train=False))
        s_twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                      num_joints=J, depth=D,
                                      variant='depth'), s_vars).double()
        t_twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                      num_joints=J, depth=D,
                                      variant='depth'), t_vars).double()

        timg = jnp.asarray(batch['image'])
        tcam = jnp.asarray(batch['true_cam'])
        tval = jnp.asarray(batch['true_val'])
        atten_j = jnp.asarray(atten)

        def jax_mpjpe(params, stats):
            cam_feat, _ = model.apply(
                {'params': params, 'batch_stats': stats}, timg, train=False)
            _, spec = steps.decode_spec_cam(
                cam_feat, D, J, args.depth_range, 2, tcam)
            return self._mpjpe(jax.device_get(spec), batch['true_cam'])

        def torch_mpjpe():
            s_twin.eval()
            with torch.no_grad():
                cam_feat, _ = s_twin(
                    torch.from_numpy(nchw(batch['image'])))
                _, spec = t_spec_cam(
                    cam_feat, torch.from_numpy(batch['true_cam']),
                    args.depth_range, 2)
            s_twin.train()
            return self._mpjpe(spec.numpy(), batch['true_cam'])

        init_mpjpe = jax_mpjpe(s_vars['params'], s_vars['batch_stats'])

        # full-f64 replica of make_distill_train_step's math (the step
        # factory computes in _compute_dtype(args) = f32, so the f64 run
        # applies the model directly, as TestPartialDepthF64 does)
        tx = steps.make_optimizer(args)
        state = steps.TrainState(params=s_vars['params'],
                                 batch_stats=s_vars['batch_stats'],
                                 opt_state=tx.init(s_vars['params']),
                                 step=jnp.zeros((), jnp.int32))
        teacher_vars = dict(params=t_vars['params'],
                            batch_stats=t_vars['batch_stats'])

        @jax.jit
        def jstep(state, teacher_vars, lr):
            (_, teach_last), t_upd = teacher.apply(
                {'params': teacher_vars['params'],
                 'batch_stats': teacher_vars['batch_stats']},
                timg, train=True, mutable=['batch_stats'])
            teach_last = jax.lax.stop_gradient(teach_last)
            teacher_vars = dict(
                params=teacher_vars['params'],
                batch_stats=jax.lax.stop_gradient(t_upd['batch_stats']))

            def loss_fn(params):
                (cam_feat, last_feat), upd = model.apply(
                    {'params': params, 'batch_stats': state.batch_stats},
                    timg, train=True, mutable=['batch_stats'])
                d_loss = steps.distill_loss(args, teach_last, last_feat,
                                            atten_j)
                _, spec = steps.decode_spec_cam(
                    cam_feat, D, J, args.depth_range, 2, tcam)
                c_loss = L.masked_mean_loss(
                    crit, spec / args.loss_div, tcam / args.loss_div, tval)
                return d_loss * self.ALPHA + c_loss, upd['batch_stats']

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = steps._update(tx, state, grads, lr).replace(
                batch_stats=new_stats)
            return state, teacher_vars, loss

        jax_losses = []
        for i in range(1, self.N_STEPS + 1):
            state, teacher_vars, loss = jstep(state, teacher_vars,
                                              jnp.float64(self._lr(i)))
            jax_losses.append(float(loss))

        s_twin.train()
        t_twin.train()                            # train-mode teacher BN
        image = torch.from_numpy(nchw(batch['image']))
        t_atten = torch.from_numpy(atten.transpose(0, 3, 1, 2))
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        opt, torch_losses = None, []
        for i in range(1, self.N_STEPS + 1):
            with torch.no_grad():
                _, teach_last = t_twin(image)     # drifts teacher stats
            cam_feat, last = s_twin(image)
            diff = (teach_last - last) * t_atten
            d_loss = torch.norm(diff.reshape(self.NB, -1), dim=-1).mean()
            _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
            c_loss = t_masked_loss(spec / args.loss_div,
                                   true_cam / args.loss_div, valid)
            lr = self._lr(i)
            if opt is not None:                   # anneal the live optimizer
                for g in opt.param_groups:
                    g['lr'] = lr
            total = d_loss * self.ALPHA + c_loss
            torch_losses.append(float(total.detach()))
            _, opt = torch_adam_step(s_twin, total, args, lr, opt=opt)

        mpjpe_jax = jax_mpjpe(jax.device_get(state.params),
                              jax.device_get(state.batch_stats))
        mpjpe_torch = torch_mpjpe()
        gap = abs(mpjpe_jax - mpjpe_torch)
        traj_gap = max(abs(a - b) for a, b in zip(jax_losses, torch_losses))
        print(f'\nf64 distilled MPJPE after {self.N_STEPS} steps: '
              f'init={init_mpjpe:.2f} jax={mpjpe_jax:.4f} '
              f'torch={mpjpe_torch:.4f} gap={gap * 1000:.2f} um; '
              f'max |loss gap| over the whole trajectory '
              f'{traj_gap / torch_losses[0]:.2e} of initial')
        # both distillation runs actually trained the metric down ...
        assert mpjpe_jax < 0.5 * init_mpjpe, (mpjpe_jax, init_mpjpe)
        assert mpjpe_torch < 0.5 * init_mpjpe, (mpjpe_torch, init_mpjpe)
        # ... the trajectories stayed locked to the end ...
        assert traj_gap / torch_losses[0] < 1e-3, traj_gap
        # ... and the end metric satisfies the north star with margin
        assert gap < 1.0, (mpjpe_jax, mpjpe_torch)


@pytest.mark.slow
class TestPartialDepthF64:
    """Pin the partial-conv twin's f32 deviation (6.9e-2 worst grad, see
    docs/PARITY.md) as BACKEND drift, not a formula difference: the same
    twin comparison at float64 (torch double vs JAX x64) must agree to
    ~1e-9 (VERDICT r2 weak #3)."""

    def test_grads_f64(self):
        jax.config.update('jax_enable_x64', True)
        try:
            self._run()
        finally:
            jax.config.update('jax_enable_x64', False)

    def _run(self):
        args = make_args(depth_only=True, partial_conv=True)
        model = build_small('partial_depth', 1)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 1)),
            train=False))
        variables = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), variables)
        twin = load_twin(TorchPartialTrunk(), variables).double()
        rng = np.random.RandomState(5)
        image = (rng.rand(B, SIDE, SIDE, 1) * (rng.rand(B, SIDE, SIDE, 1)
                                               > 0.4)).astype(np.float64)
        batch = rand_batch(rng)
        true_cam = batch['true_cam'].astype(np.float64)

        twin.train()
        cam_feat, _ = twin(torch.from_numpy(nchw(image)))
        t_cam = torch.from_numpy(true_cam)
        valid = torch.from_numpy(batch['true_val'])
        _, spec = t_spec_cam(cam_feat.double(), t_cam, args.depth_range, 2)
        t_loss = t_masked_loss(spec / args.loss_div, t_cam / args.loss_div,
                               valid)
        t_loss.backward()
        t_grads = {n: p.grad.detach().clone()
                   for n, p in twin.named_parameters()}

        from pose_tpu.train import losses as L

        def loss_fn(params):
            (cam_f, _), _ = model.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                jnp.asarray(image, jnp.float64), train=True,
                mutable=['batch_stats'])
            _, spec = steps.decode_spec_cam(
                cam_f, D, J, args.depth_range, 2, jnp.asarray(true_cam))
            return L.masked_mean_loss(
                L.smooth_l1, spec / args.loss_div,
                jnp.asarray(true_cam) / args.loss_div,
                jnp.asarray(batch['true_val']))

        loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
        # measured: ~3e-9 rel — f64 accumulation-order drift through the
        # renorm's winsize/coverage amplification; 5 orders under the f32
        # deviation this test exists to explain
        assert abs(float(loss) - float(t_loss)) / float(t_loss) < 1e-7
        worst = compare_trees({'params': jax.device_get(grads)}, t_grads,
                              1e-6, 'grad', floor_rel=1e-9)
        print('partial-depth f64 max grad rel dev: %s=%.2e' % worst)


class TestDistillStep:
    """Distillation (depth_train.py:161-283): frozen teacher in train-mode BN,
    L2-norm feature distillation with alpha, plus the cam loss."""

    def test_loss_grads_and_teacher_drift(self):
        args = make_args()
        alpha = 0.5
        model = build_small('depth', 3)        # 3ch student
        teacher = build_small('depth', 3)
        s_vars = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        t_vars = jax.device_get(teacher.init(
            jax.random.PRNGKey(7), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        s_twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                      num_joints=J, depth=D,
                                      variant='depth'), s_vars)
        t_twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                      num_joints=J, depth=D,
                                      variant='depth'), t_vars)
        rng = np.random.RandomState(6)
        batch = rand_batch(rng)
        atten = rng.rand(B, 5, 5, 1).astype(np.float32)

        s_twin.train()
        t_twin.train()                            # reference: train-mode BN
        with torch.no_grad():
            _, teach_last = t_twin(torch.from_numpy(nchw(batch['image'])))
        cam_feat, last = s_twin(torch.from_numpy(nchw(batch['image'])))
        diff = (teach_last - last) * torch.from_numpy(
            atten.transpose(0, 3, 1, 2))
        d_loss = torch.norm(diff.reshape(B, -1), dim=-1).mean()
        true_cam = torch.from_numpy(batch['true_cam'])
        valid = torch.from_numpy(batch['true_val'])
        _, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
        c_loss = t_masked_loss(spec / args.loss_div, true_cam / args.loss_div,
                               valid)
        t_total = d_loss * alpha + c_loss
        t_total.backward()
        t_grads = {n: p.grad.detach().clone()
                   for n, p in s_twin.named_parameters()}

        tx = steps.make_optimizer(args)
        state = steps.TrainState(params=s_vars['params'],
                                 batch_stats=s_vars['batch_stats'],
                                 opt_state=tx.init(s_vars['params']),
                                 step=jnp.zeros((), jnp.int32))
        step = steps.make_distill_train_step(model, teacher, args, 2, tx,
                                             teacher_is_fusion=False,
                                             with_semi=False)
        device_batch = dict(color=jnp.asarray(batch['image']),
                            true_cam=jnp.asarray(batch['true_cam']),
                            true_val=jnp.asarray(batch['true_val']),
                            atten_map=jnp.asarray(atten))
        new_state, new_t_vars, out = step(
            state, dict(params=t_vars['params'],
                        batch_stats=t_vars['batch_stats']),
            device_batch, jnp.float32(1e-3), jnp.float32(alpha))

        assert abs(float(out['dist_loss']) - float(d_loss)) \
            / float(d_loss) < 2e-3
        assert abs(float(out['cam_loss']) - float(c_loss)) \
            / float(c_loss) < 2e-3

        # teacher running stats drift exactly like torch's train-mode BN
        worst_t = compare_trees(
            {'batch_stats': jax.device_get(new_t_vars['batch_stats'])},
            dict(t_twin.named_buffers()), 3e-2, 'teacher stat')

        # explicit student grads through the same loss math
        from pose_tpu.train import losses as L

        def loss_fn(params):
            (t_cam, t_last), _ = steps._apply(
                teacher, t_vars['params'], t_vars['batch_stats'],
                (jnp.asarray(batch['image']),), True, jnp.float32)
            (cam_f, s_last), _ = steps._apply(
                model, params, s_vars['batch_stats'],
                (jnp.asarray(batch['image']),), True, jnp.float32)
            d = steps.distill_loss(args, jax.lax.stop_gradient(t_last),
                                   s_last, jnp.asarray(atten))
            _, spec = steps.decode_spec_cam(
                cam_f, D, J, args.depth_range, 2,
                jnp.asarray(batch['true_cam']))
            c = L.masked_mean_loss(
                L.smooth_l1, spec / args.loss_div,
                jnp.asarray(batch['true_cam']) / args.loss_div,
                jnp.asarray(batch['true_val']))
            return d * alpha + c

        grads = jax.device_get(jax.grad(loss_fn)(s_vars['params']))
        worst = compare_trees({'params': grads}, t_grads, 2e-2, 'grad')
        print('distill max rel dev: grad %s=%.2e teacher-stat %s=%.2e'
              % (worst + worst_t))


class TestLockstepJointTrack:
    """Long-horizon equivalence at the FLAGSHIP loss composition: 25
    identical-batch Adam steps of joint_train + do_track (dual heads, 2D +
    3D losses and the differentiable root-reconstruction loss,
    loss = 0.5*(cam+mat) + recon — reference train.py:55-142, :105-112)
    torch vs JAX in lockstep. TestLockstepTrajectory covers cam-only; this
    compounds the recon solve's gradients through the trajectory."""

    N_STEPS = 25

    def test_25_step_total_loss_drift(self):
        lr = 2e-5
        args = make_args(joint_space=True)
        model = build_small('rgb', 3, joint_space=True)
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        twin = load_twin(TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE,
                                    num_joints=J, depth=D, joint_space=True),
                         variables)
        batch = rand_batch(np.random.RandomState(21), joint=True)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

        tx = steps.make_optimizer(args)
        state = steps.TrainState(params=variables['params'],
                                 batch_stats=variables['batch_stats'],
                                 opt_state=tx.init(variables['params']),
                                 step=jnp.zeros((), jnp.int32))
        step = steps.make_joint_train_step(model, args, 2, tx, do_track=True)
        jax_losses = []
        for _ in range(self.N_STEPS):
            state, out = step(state, jbatch, lr)
            total = ((float(out['cam_loss']) + float(out['mat_loss'])) * 0.5
                     + float(out['recon_loss']))
            jax_losses.append(total)

        twin.train()
        image = torch.from_numpy(nchw(batch['image']))
        true_cam = torch.from_numpy(batch['true_cam'])
        true_mat = torch.from_numpy(batch['true_mat'])
        valid = torch.from_numpy(batch['true_val'])
        intrinsics = torch.from_numpy(batch['intrinsics'])
        opt, torch_losses = None, []
        for _ in range(self.N_STEPS):
            cam_feat, mat_feat = twin(image)
            spec_mat = t_decode2d(t_heatmap2d(mat_feat, J), SIDE)
            mat_loss = t_masked_loss(spec_mat, true_mat, valid)
            relat, spec = t_spec_cam(cam_feat, true_cam, args.depth_range, 2)
            cam_loss = t_masked_loss(spec, true_cam, valid)
            recon = t_recon(spec_mat, relat, intrinsics)
            recon_loss = t_masked_loss(recon, true_cam, valid)
            t_total = (cam_loss + mat_loss) * 0.5 + recon_loss
            torch_losses.append(float(t_total.detach()))
            _, opt = torch_adam_step(twin, t_total, args, lr, opt=opt)

        scale = torch_losses[0]
        gaps = [abs(a - b) / scale for a, b in zip(jax_losses, torch_losses)]
        final_rel = (abs(jax_losses[-1] - torch_losses[-1])
                     / abs(torch_losses[-1]))
        print(f'\nlockstep joint+track: loss gap / initial loss '
              f'first={gaps[0]:.2e} max={max(gaps):.2e} '
              f'last={gaps[-1]:.2e}; final rel={final_rel:.2e}')
        print('  torch loss trajectory:',
              ' '.join(f'{v:.4f}' for v in torch_losses[::4]))
        print('  jax   loss trajectory:',
              ' '.join(f'{v:.4f}' for v in jax_losses[::4]))
        assert torch_losses[-1] < 0.5 * torch_losses[0]
        assert jax_losses[-1] < 0.5 * jax_losses[0]
        assert max(gaps) < 5e-2, gaps
        assert final_rel < 5e-2, final_rel


@pytest.mark.slow
class TestLockstepF64:
    """Pin the f32 lockstep drift (basic max 1.6e-3 / bottleneck ~4e-2 at
    the steepest descent point, docs/PARITY.md) as BACKEND float32
    precision, not a wiring difference: the same 25-step cam trajectory at
    float64 (torch double vs JAX x64) built from the very same pieces the
    engine step composes — decode_spec_cam, masked smooth-L1,
    clip/weight-decay/Adam chain (make_optimizer), BN-stat threading —
    must track orders of magnitude tighter. Reference loop semantics:
    train.py:114-118, :145-192."""

    N_STEPS = 25

    def test_bottleneck_25_steps_f64(self):
        jax.config.update('jax_enable_x64', True)
        try:
            self._run()
        finally:
            jax.config.update('jax_enable_x64', False)

    def _run(self):
        import optax

        from pose_tpu.train import losses as L

        lr, key_index = 2e-5, 2
        args = make_args()
        model = build_small('rgb', 3, block='bottleneck')
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.ones((1, SIDE, SIDE, 3)),
            train=False))
        variables = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), variables)
        twin = load_twin(
            TorchTrunk(layers=(1, 1, 1, 1), stride=STRIDE, num_joints=J,
                       depth=D, block='bottleneck'), variables).double()

        batch = rand_batch(np.random.RandomState(11))
        image = jnp.asarray(batch['image'], jnp.float64)
        true_cam = jnp.asarray(batch['true_cam'], jnp.float64)
        valid = jnp.asarray(batch['true_val'])

        def loss_fn(params, batch_stats):
            cam_feat, updates = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                image, train=True, mutable=['batch_stats'])
            _, spec = steps.decode_spec_cam(cam_feat, D, J, args.depth_range,
                                            key_index, true_cam)
            loss = L.masked_mean_loss(L.smooth_l1, spec, true_cam, valid)
            return loss, updates['batch_stats']

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        tx = steps.make_optimizer(args)
        params, batch_stats = variables['params'], variables['batch_stats']
        opt_state = tx.init(params)
        jax_losses = []
        for _ in range(self.N_STEPS):
            (loss, batch_stats), grads = grad_fn(params, batch_stats)
            jax_losses.append(float(loss))
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)

        twin.train()
        t_cam = torch.from_numpy(batch['true_cam'].astype(np.float64))
        t_valid = torch.from_numpy(batch['true_val'])
        t_image = torch.from_numpy(nchw(batch['image']).astype(np.float64))
        opt, torch_losses = None, []
        for _ in range(self.N_STEPS):
            cam_feat = twin(t_image)
            _, spec = t_spec_cam(cam_feat, t_cam, args.depth_range,
                                 key_index)
            loss = t_masked_loss(spec, t_cam, t_valid)
            torch_losses.append(float(loss))
            _, opt = torch_adam_step(twin, loss, args, lr, opt=opt)

        scale = torch_losses[0]
        gaps = [abs(a - b) / scale for a, b in zip(jax_losses, torch_losses)]
        final_rel = (abs(jax_losses[-1] - torch_losses[-1])
                     / abs(torch_losses[-1]))
        print(f'\nlockstep f64 bottleneck: loss gap / initial loss '
              f'first={gaps[0]:.2e} max={max(gaps):.2e} '
              f'last={gaps[-1]:.2e}; final rel={final_rel:.2e}')
        assert torch_losses[-1] < 0.5 * torch_losses[0]
        # the f32 run's bound is 5e-2; at f64 the same wiring must track
        # ~4 orders of magnitude tighter, or the f32 gap was never backend
        # precision. Measured: first-step gap 3e-15 (exact formula), max
        # 2.2e-06 over the descent; final_rel is the local metric against
        # the ~10x-collapsed loss, so its bound is looser (same reasoning
        # as the f32 test's trajectory-scale metric).
        assert max(gaps) < 1e-5, gaps
        assert final_rel < 1e-4, final_rel
