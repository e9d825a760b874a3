"""Model family tests: shapes for every variant/flag combo, and forward parity
against a torch twin through the checkpoint converter."""

import chex
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_tpu.models import PoseResNet, stage_schedule
from pose_tpu.models.convert import (surgery_depth_host, surgery_depth_only,
                                     surgery_extra_channel,
                                     surgery_fusion_manual_update,
                                     variables_from_torch,
                                     variables_to_torch_state)

torch = pytest.importorskip('torch')
import torch.nn as tnn
import torch.nn.functional as F


# ------------------------------------------------------------------ torch twin
# A minimal torch replica of the reference's BasicBlock ResNet (resnet.py /
# depthnet.py structure and naming) used purely as a parity oracle.

class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None, skip_relu=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride,
                                dilation=dilation, padding=dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample
        self.skip_relu = skip_relu

    def forward(self, x):
        res = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            res = self.downsample(x)
        out = out + res
        return out if self.skip_relu else F.relu(out)


class TorchBottleneck(tnn.Module):
    """Reference Bottleneck (resnet.py:66-120): 1x1 / 3x3(stride, dilation) /
    1x1-expand-4, BN after each, relu after the residual add."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None, skip_relu=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                dilation=dilation, padding=dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.skip_relu = skip_relu

    def forward(self, x):
        res = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            res = self.downsample(x)
        out = out + res
        return out if self.skip_relu else F.relu(out)


class TorchTrunk(tnn.Module):
    """Matches PoseResNet(variant='rgb'|'depth', block='basic'|'bottleneck')
    layer naming."""

    def __init__(self, layers=(1, 1, 1, 1), in_ch=3, stride=16, num_joints=5,
                 depth=4, joint_space=False, skip_relu=False, variant='rgb',
                 block='basic'):
        super().__init__()
        s2, s3, s4, d2, d3, d4 = stage_schedule(stride)
        self.variant = variant
        self.block_cls = (TorchBasicBlock if block == 'basic'
                          else TorchBottleneck)
        expansion = getattr(self.block_cls, 'expansion', 1)
        self.skip_relu = skip_relu and variant != 'rgb'
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, layers[0], 1, 1)
        self.layer2 = self._make_layer(128, layers[1], s2, d2)
        self.layer3 = self._make_layer(256, layers[2], s3, d3, self.skip_relu)
        self.layer4 = self._make_layer(512, layers[3], s4, d4, self.skip_relu)
        head_in = 512 * expansion
        if variant == 'rgb':
            self.cam_regressor = tnn.Conv2d(head_in, depth * num_joints, 3,
                                            padding=1)
            self.mat_regressor = (tnn.Conv2d(head_in, num_joints, 3, padding=1)
                                  if joint_space else None)
        else:
            self.regressor = tnn.Conv2d(head_in, depth * num_joints, 3,
                                        padding=1)

    def _make_layer(self, planes, blocks, stride, dilation, skip_relu=False):
        expansion = getattr(self.block_cls, 'expansion', 1)
        downsample = None
        if stride != 1 or self.inplanes != planes * expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * expansion, 1,
                           stride=stride, bias=False),
                tnn.BatchNorm2d(planes * expansion))
        layers = [self.block_cls(self.inplanes, planes, stride, dilation,
                                 downsample,
                                 skip_relu=skip_relu if blocks == 1
                                 else False)]
        self.inplanes = planes * expansion
        for i in range(1, blocks):
            layers.append(self.block_cls(self.inplanes, planes,
                                         skip_relu=skip_relu
                                         if i == blocks - 1 else False))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        m = self.layer3(x)
        n = self.layer4(F.relu(m) if self.skip_relu else m)
        if self.variant == 'rgb':
            z = self.cam_regressor(n)
            if self.mat_regressor is not None:
                return z, self.mat_regressor(n)
            return z
        z = self.regressor(F.relu(n) if self.skip_relu else n)
        return z, n


def nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def nhwc(x):
    return x.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------- tests


class TestShapes:
    @pytest.mark.parametrize('variant', ['rgb', 'depth', 'fusion',
                                         'partial_depth', 'partial_fusion'])
    def test_variants_forward(self, variant):
        in_ch = 1 if variant == 'partial_depth' else 3
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant=variant,
                           in_channels=in_ch, stride=32, num_joints=5, depth=4)
        x = jnp.ones((2, 65, 65, in_ch))
        y = jnp.ones((2, 65, 65, 1))
        if variant in ('fusion', 'partial_fusion'):
            out = model.init_with_output(jax.random.PRNGKey(0), x, y,
                                         train=False)[0]
        else:
            out = model.init_with_output(jax.random.PRNGKey(0), x,
                                         train=False)[0]
        side_out = (65 - 1) // 32 + 1
        if variant == 'rgb':
            assert out.shape == (2, side_out, side_out, 20)
        else:
            z, feat = out
            assert z.shape == (2, side_out, side_out, 20)
            assert feat.shape == (2, side_out, side_out, 512)

    def test_stride16_output_side(self):
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                           stride=16, num_joints=5, depth=4)
        out = model.init_with_output(jax.random.PRNGKey(0),
                                     jnp.ones((1, 129, 129, 3)),
                                     train=False)[0]
        assert out.shape == (1, 9, 9, 20)

    def test_joint_space_heads(self):
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                           in_channels=4, stride=32, num_joints=5, depth=4,
                           joint_space=True)
        z, mat = model.init_with_output(jax.random.PRNGKey(0),
                                        jnp.ones((1, 65, 65, 4)),
                                        train=False)[0]
        assert z.shape[-1] == 20 and mat.shape[-1] == 5

    def test_fused_head_env_path_bit_exact(self, monkeypatch):
        """POSE_TPU_FUSED_HEAD=1 (a measured-negative perf experiment kept
        behind the env switch, docs/experiments/r5_fusedhead_ab.log) runs
        both regressor heads as one concatenated conv — same param tree,
        bit-identical forward to the default separate-conv path."""
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                           in_channels=3, stride=32, num_joints=5, depth=4,
                           joint_space=True)
        x = jnp.asarray(np.random.RandomState(7).rand(2, 65, 65, 3)
                        .astype(np.float32))

        monkeypatch.setenv('POSE_TPU_FUSED_HEAD', '0')
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        z_sep, mat_sep = model.apply(variables, x, train=False)

        monkeypatch.setenv('POSE_TPU_FUSED_HEAD', '1')
        variables_f = model.init(jax.random.PRNGKey(0), x, train=False)
        chex.assert_trees_all_equal(variables, variables_f)
        z_fused, mat_fused = model.apply(variables, x, train=False)

        np.testing.assert_array_equal(np.asarray(z_sep),
                                      np.asarray(z_fused))
        np.testing.assert_array_equal(np.asarray(mat_sep),
                                      np.asarray(mat_fused))

    def test_early_dist_taps_stage3(self):
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='depth',
                           stride=32, num_joints=5, depth=4, early_dist=True)
        (_, feat), _ = model.init_with_output(jax.random.PRNGKey(0),
                                              jnp.ones((1, 65, 65, 3)),
                                              train=False)
        assert feat.shape[-1] == 256  # stage-3 channels (basic block)

    def test_stage_schedule_reference_values(self):
        assert stage_schedule(16) == (2, 2, 1, 1, 1, 2)
        assert stage_schedule(32) == (2, 2, 2, 1, 1, 1)
        assert stage_schedule(8) == (2, 1, 1, 1, 2, 4)
        assert stage_schedule(4) == (1, 1, 1, 2, 4, 8)


class TestTorchParity:
    @pytest.mark.parametrize('stride', [16, 32])
    def test_rgb_forward_matches_torch(self, stride):
        torch.manual_seed(0)
        tm = TorchTrunk(layers=(1, 1, 1, 1), in_ch=3, stride=stride,
                        num_joints=5, depth=4, joint_space=True).eval()
        fm = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                        stride=stride, num_joints=5, depth=4, joint_space=True)
        template = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 65, 65, 3)),
                           train=False)
        variables = variables_from_torch(template, tm.state_dict(),
                                         verbose=False)

        x = np.random.RandomState(0).randn(2, 65, 65, 3).astype(np.float32)
        with torch.no_grad():
            tz, tmat = tm(torch.from_numpy(nchw(x)))
        fz, fmat = fm.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(fz), nhwc(tz), atol=2e-3)
        np.testing.assert_allclose(np.asarray(fmat), nhwc(tmat), atol=2e-3)

    @pytest.mark.parametrize('stride', [16, 32])
    def test_bottleneck_forward_matches_torch(self, stride):
        """The flagship resnet50 is Bottleneck (reference resnet.py:66-120,
        :239-262): 1x1/3x3/1x1 + expansion-4 downsample path, exercised at
        the dilated stride-16 schedule the cmu_train.sh config runs."""
        torch.manual_seed(2)
        tm = TorchTrunk(layers=(1, 1, 1, 1), in_ch=3, stride=stride,
                        num_joints=5, depth=4, joint_space=True,
                        block='bottleneck').eval()
        fm = PoseResNet(block='bottleneck', layers=(1, 1, 1, 1),
                        variant='rgb', stride=stride, num_joints=5, depth=4,
                        joint_space=True)
        template = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 65, 65, 3)),
                           train=False)
        variables = variables_from_torch(template, tm.state_dict(),
                                         verbose=False)

        x = np.random.RandomState(2).randn(2, 65, 65, 3).astype(np.float32)
        with torch.no_grad():
            tz, tmat = tm(torch.from_numpy(nchw(x)))
        fz, fmat = fm.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(fz), nhwc(tz), atol=2e-3)
        np.testing.assert_allclose(np.asarray(fmat), nhwc(tmat), atol=2e-3)

    def test_resnet50_depth_forward_matches_torch(self):
        """Full resnet50 stage depths (3,4,6,3) through the converter:
        multi-block stages exercise the inplanes=4*planes bookkeeping that
        (1,1,1,1) trunks cannot."""
        torch.manual_seed(3)
        tm = TorchTrunk(layers=(3, 4, 6, 3), in_ch=3, stride=16,
                        num_joints=5, depth=4, block='bottleneck').eval()
        fm = PoseResNet(block='bottleneck', layers=(3, 4, 6, 3),
                        variant='rgb', stride=16, num_joints=5, depth=4)
        template = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 33, 33, 3)),
                           train=False)
        variables = variables_from_torch(template, tm.state_dict(),
                                         verbose=False)
        x = np.random.RandomState(3).randn(1, 33, 33, 3).astype(np.float32)
        with torch.no_grad():
            tz = tm(torch.from_numpy(nchw(x)))
        fz = fm.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(fz), nhwc(tz), atol=3e-3)

    def test_depth_skip_relu_forward_matches_torch(self):
        torch.manual_seed(1)
        tm = TorchTrunk(layers=(2, 1, 2, 1), in_ch=1, stride=32, num_joints=5,
                        depth=4, skip_relu=True, variant='depth').eval()
        fm = PoseResNet(block='basic', layers=(2, 1, 2, 1), variant='depth',
                        in_channels=1, stride=32, num_joints=5, depth=4,
                        skip_relu=True)
        template = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 65, 65, 1)),
                           train=False)
        variables = variables_from_torch(template, tm.state_dict(),
                                         verbose=False)
        x = np.random.RandomState(1).randn(2, 65, 65, 1).astype(np.float32)
        with torch.no_grad():
            tz, tfeat = tm(torch.from_numpy(nchw(x)))
        fz, ffeat = fm.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(fz), nhwc(tz), atol=2e-3)
        np.testing.assert_allclose(np.asarray(ffeat), nhwc(tfeat), atol=2e-3)

    def test_train_mode_updates_batch_stats(self):
        fm = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                        stride=32, num_joints=5, depth=4)
        variables = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 65, 65, 3)),
                            train=True)
        x = jnp.asarray(np.random.RandomState(2).randn(4, 65, 65, 3),
                        jnp.float32)
        _, updates = fm.apply(variables, x, train=True, mutable=['batch_stats'])
        new_mean = updates['batch_stats']['bn1']['mean']
        assert float(jnp.abs(new_mean).max()) > 0


class TestConverter:
    def test_roundtrip(self):
        fm = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                        stride=32, num_joints=5, depth=4, joint_space=True)
        variables = fm.init(jax.random.PRNGKey(3), jnp.ones((1, 65, 65, 3)),
                            train=False)
        state = variables_to_torch_state(variables)
        assert 'conv1.weight' in state and 'layer1.0.bn1.running_mean' in state
        back = variables_from_torch(variables, state, verbose=False)
        for (pa, va), (pb, vb) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(variables),
                       key=lambda kv: str(kv[0])),
                sorted(jax.tree_util.tree_leaves_with_path(back),
                       key=lambda kv: str(kv[0]))):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       err_msg=str(pa))

    def test_partial_variant_roundtrip_key_names(self):
        fm = PoseResNet(block='basic', layers=(1, 1, 1, 1),
                        variant='partial_depth', in_channels=1, stride=32,
                        num_joints=5, depth=4)
        variables = fm.init(jax.random.PRNGKey(4), jnp.ones((1, 65, 65, 1)),
                            train=False)
        state = variables_to_torch_state(variables)
        # partial conv kernels surface under the same torch names
        assert 'conv1.weight' in state
        assert 'layer1.0.conv1.weight' in state
        assert state['conv1.weight'].shape == (64, 1, 7, 7)

    def test_surgery_extra_channel(self):
        rng = np.random.RandomState(0)
        toy = {'conv1.weight': rng.randn(64, 3, 7, 7).astype(np.float32)}
        model_conv1 = rng.randn(64, 4, 7, 7).astype(np.float32)
        out = surgery_extra_channel(toy, model_conv1)['conv1.weight']
        np.testing.assert_allclose(out[:, :3], toy['conv1.weight'])
        np.testing.assert_allclose(out[:, 3], model_conv1[:, 3])

    def test_surgery_depth_only_and_host(self):
        rng = np.random.RandomState(1)
        w = rng.randn(64, 3, 7, 7).astype(np.float32)
        out = surgery_depth_only({'conv1.weight': w})['conv1.weight']
        np.testing.assert_allclose(out, w[:, :1])
        w1 = rng.randn(64, 1, 7, 7).astype(np.float32)
        out = surgery_depth_host({'conv1.weight': w1})['conv1.weight']
        assert out.shape == (64, 3, 7, 7)
        np.testing.assert_allclose(out[:, 0], w1[:, 0] / 3)

    def test_surgery_fusion_manual_update(self):
        rng = np.random.RandomState(2)
        toy = {
            'conv1.weight': rng.randn(64, 3, 7, 7).astype(np.float32),
            'bn1.weight': rng.randn(64).astype(np.float32),
            'layer1.0.conv1.weight': rng.randn(64, 64, 3, 3).astype(np.float32),
            'layer2.0.conv1.weight': rng.randn(128, 64, 3, 3).astype(np.float32),
        }
        out = surgery_fusion_manual_update(toy)
        np.testing.assert_allclose(out['bn2.weight'], toy['bn1.weight'])
        np.testing.assert_allclose(out['layer5.0.conv1.weight'],
                                   toy['layer1.0.conv1.weight'])
        np.testing.assert_allclose(out['layer6.0.conv1.weight'],
                                   toy['layer2.0.conv1.weight'])
        np.testing.assert_allclose(out['conv2.weight'],
                                   toy['conv1.weight'][:, :1])

    def test_surgery_fusion_manual_update_depth_host_source(self):
        """With -depth_host the depth-branch keys come from host_path (a
        trained depth model) while the trunk body stays model_path
        (fusionnet.py:270-276): the manual-update source is separate."""
        rng = np.random.RandomState(3)
        body = {
            'conv1.weight': rng.randn(64, 3, 7, 7).astype(np.float32),
            'bn1.weight': rng.randn(64).astype(np.float32),
            'layer1.0.conv1.weight': rng.randn(64, 64, 3, 3).astype(
                np.float32),
        }
        host = {
            'conv1.weight': rng.randn(64, 3, 7, 7).astype(np.float32),
            'bn1.weight': rng.randn(64).astype(np.float32),
            'layer1.0.conv1.weight': rng.randn(64, 64, 3, 3).astype(
                np.float32),
        }
        out = surgery_fusion_manual_update(body, host)
        # depth branch from the host model...
        np.testing.assert_allclose(out['bn2.weight'], host['bn1.weight'])
        np.testing.assert_allclose(out['layer5.0.conv1.weight'],
                                   host['layer1.0.conv1.weight'])
        np.testing.assert_allclose(out['conv2.weight'],
                                   host['conv1.weight'][:, :1])
        # ...trunk body untouched
        np.testing.assert_allclose(out['bn1.weight'], body['bn1.weight'])
        np.testing.assert_allclose(out['conv1.weight'],
                                   body['conv1.weight'])


def test_fused_bn_trunk_equivalence():
    """POSE_TPU_BN=pallas (ops/fused_bn.py) must match the default
    nn.BatchNorm trunk through a full train-mode forward, including the
    running-stat updates, for the fused-path block flavors (relu folding,
    residual folding, downsample, skip_relu, fusion block)."""
    from pose_tpu.models.resnet import PoseResNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 65, 65, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 65, 65, 1).astype(np.float32))

    for variant, blk, kw, inputs in [
            ('rgb', 'bottleneck', dict(joint_space=True), (x,)),
            ('depth', 'basic', dict(skip_relu=True), (x,)),
            ('fusion', 'basic', {}, (x, y))]:
        outs, stats = {}, {}
        for impl in ('xla', 'pallas'):
            m = PoseResNet(block=blk, layers=(1, 1, 1, 1), variant=variant,
                           in_channels=3, stride=32, num_joints=5, depth=4,
                           bn_impl=impl, **kw)
            v = m.init(jax.random.PRNGKey(7), *inputs, train=False)
            out, upd = m.apply(v, *inputs, train=True,
                               mutable=['batch_stats'])
            outs[impl] = jax.tree_util.tree_leaves(out)
            stats[impl] = jax.tree_util.tree_leaves(upd)
        for a, b in zip(outs['xla'], outs['pallas']):
            d = np.abs(np.float32(a) - np.float32(b)).max()
            assert d < 5e-4, (variant, 'out', d)
        for a, b in zip(stats['xla'], stats['pallas']):
            d = np.abs(np.float32(a) - np.float32(b)).max()
            assert d < 5e-5, (variant, 'stats', d)
