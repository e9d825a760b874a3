"""Flax ResNet trunks for volumetric-heatmap 3D pose regression.

One configurable implementation covers the reference's five model files:

- variant='rgb':    resnet.py — 3/4-channel stem (-extra_channel), dual heads
                    (cam_regressor + optional mat_regressor if -joint_space).
- variant='depth':  depthnet.py — 1-channel (depth_only) or 3-channel stem,
                    skip_relu/early_dist feature taps for distillation,
                    returns (cam_feat, tap_feat).
- variant='fusion': fusionnet.py — two stems + stages 1-2 per modality, 1x1
                    Fusion block, shared stages 3-4; forward(color, depth).
- variant='partial_depth':  partial_depthnet.py — stem + stages 1-2 are
                    mask-propagating partial convs threading veil=(x != 0).
- variant='partial_fusion': partial_fusionnet.py — fusion net whose depth
                    branch is partial-conv. (The reference's RGB PartialConv
                    stem is called without a mask and would crash at runtime,
                    partial_fusionnet.py:202 vs :251 — here the RGB branch is
                    an ordinary conv stem, the documented intent.)

Shared trunk math replicated exactly (resnet.py:132-138 and equivalents):
per-stage stride/dilation derived from log2(args.stride) clamps so the output
stride is exactly `stride`, with dilation compensating removed strides. Only
the *first* block of each stage receives the stage stride/dilation; later
blocks use stride 1 / dilation 1 (resnet.py:188-193). In the depth/fusion
family the *last* block of stages 3-4 gets skip_relu (depthnet.py:177-184).

Layout is NHWC (TPU-native); feature maps feed pose_tpu.ops.heatmap which
accounts for the channel factorization (depth, joints).
"""

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.batchnorm import ReferenceBatchNorm
from ..ops.fused_bn import FusedBatchNorm
from ..ops.partial_conv import partial_conv

# torch's He-init used by the trunks: normal(0, sqrt(2 / fan_out))
# (resnet.py:151-154, depthnet.py:148-150)
trunk_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def regressor_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default init (kaiming_uniform a=sqrt(5)): the regressor
    heads are created *after* the He-init loop in the reference
    (resnet.py:160-172) and so keep torch defaults."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = np.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def regressor_bias_init_for(fan_in):
    bound = np.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def stage_schedule(stride):
    """(stride2, stride3, stride4, dilate2, dilate3, dilate4) from
    resnet.py:132-138."""
    s2 = int(np.minimum(np.maximum(np.log2(stride), 2), 3) - 1)
    s3 = int(np.minimum(np.maximum(np.log2(stride), 3), 4) - 2)
    s4 = int(np.minimum(np.maximum(np.log2(stride), 4), 5) - 3)
    d2 = 3 - s2
    d3 = (3 - s2) * (3 - s3)
    d4 = (3 - s2) * (3 - s3) * (3 - s4)
    return s2, s3, s4, d2, d3, d4


def max_pool_3x3s2(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) (resnet.py:144)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def conv_bn(x, features, kernel, stride, dilation, conv_name, bn_name, train,
            fused=False, relu=False, residual=None):
    """A conv+BN pair created directly in the caller's compact scope so param
    paths stay flat (e.g. layer1/0/conv1) for torch-checkpoint conversion.

    With fused=True (POSE_TPU_BN=pallas) the BN runs as the Pallas fused
    kernel with relu/residual folded into the same pass; param/stat naming is
    identical, so checkpoints are interchangeable between the two impls. The
    default XLA path ignores relu/residual (callers apply them)."""
    pad = (kernel // 2) * dilation if kernel > 1 else 0
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                kernel_dilation=(dilation, dilation), use_bias=False,
                kernel_init=trunk_init, name=conv_name)(x)
    if fused:
        return FusedBatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, relu=relu, name=bn_name)(
            x, residual)
    x = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, name=bn_name)(x)
    return x


def bn_impl_default():
    """'xla' (ops/batchnorm.ReferenceBatchNorm — torch-exact unbiased
    running-var bookkeeping) or 'pallas' (ops/fused_bn.py), from
    POSE_TPU_BN."""
    return os.environ.get('POSE_TPU_BN', 'xla')


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    skip_relu: bool = False
    partial: bool = False
    fused_bn: bool = False

    expansion = 1

    @nn.compact
    def __call__(self, x, veil=None, train: bool = True):
        if self.fused_bn and not self.partial:
            res = x
            if self.has_downsample:
                res = conv_bn(x, self.planes * self.expansion, 1, self.stride,
                              1, 'downsample_0', 'downsample_1', train,
                              fused=True)
            out = conv_bn(x, self.planes, 3, self.stride, self.dilation,
                          'conv1', 'bn1', train, fused=True, relu=True)
            return conv_bn(out, self.planes, 3, 1, 1, 'conv2', 'bn2', train,
                           fused=True, relu=not self.skip_relu, residual=res)

        res = x
        if self.partial:
            k1 = self.param('conv1_kernel', trunk_init,
                            (3, 3, x.shape[-1], self.planes))
            out, veil = partial_conv(x, veil, k1, self.stride,
                                     self.dilation, self.dilation)
            out = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name='bn1')(out)
            out = nn.relu(out)
            k2 = self.param('conv2_kernel', trunk_init,
                            (3, 3, self.planes, self.planes))
            out, veil = partial_conv(out, veil, k2, 1, 1)
            out = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name='bn2')(out)
        else:
            out = conv_bn(x, self.planes, 3, self.stride, self.dilation,
                          'conv1', 'bn1', train)
            out = nn.relu(out)
            out = conv_bn(out, self.planes, 3, 1, 1, 'conv2', 'bn2', train)

        if self.has_downsample:
            res = conv_bn(x, self.planes * self.expansion, 1, self.stride, 1,
                          'downsample_0', 'downsample_1', train)

        out = out + res
        if not self.skip_relu:
            out = nn.relu(out)
        if self.partial:
            return out, veil
        return out


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    skip_relu: bool = False
    partial: bool = False
    fused_bn: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x, veil=None, train: bool = True):
        if self.fused_bn and not self.partial:
            res = x
            if self.has_downsample:
                res = conv_bn(x, self.planes * self.expansion, 1, self.stride,
                              1, 'downsample_0', 'downsample_1', train,
                              fused=True)
            out = conv_bn(x, self.planes, 1, 1, 1, 'conv1', 'bn1', train,
                          fused=True, relu=True)
            out = conv_bn(out, self.planes, 3, self.stride, self.dilation,
                          'conv2', 'bn2', train, fused=True, relu=True)
            return conv_bn(out, self.planes * 4, 1, 1, 1, 'conv3', 'bn3',
                           train, fused=True, relu=not self.skip_relu,
                           residual=res)

        res = x
        if self.partial:
            k1 = self.param('conv1_kernel', trunk_init,
                            (1, 1, x.shape[-1], self.planes))
            out, veil = partial_conv(x, veil, k1, 1, 0)
            out = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name='bn1')(out)
            out = nn.relu(out)
            k2 = self.param('conv2_kernel', trunk_init,
                            (3, 3, self.planes, self.planes))
            out, veil = partial_conv(out, veil, k2, self.stride,
                                     self.dilation, self.dilation)
            out = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name='bn2')(out)
            out = nn.relu(out)
            k3 = self.param('conv3_kernel', trunk_init,
                            (1, 1, self.planes, self.planes * 4))
            out, veil = partial_conv(out, veil, k3, 1, 0)
            out = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name='bn3')(out)
        else:
            out = conv_bn(x, self.planes, 1, 1, 1, 'conv1', 'bn1', train)
            out = nn.relu(out)
            out = conv_bn(out, self.planes, 3, self.stride, self.dilation,
                          'conv2', 'bn2', train)
            out = nn.relu(out)
            out = conv_bn(out, self.planes * 4, 1, 1, 1, 'conv3', 'bn3',
                          train)

        if self.has_downsample:
            res = conv_bn(x, self.planes * self.expansion, 1, self.stride, 1,
                          'downsample_0', 'downsample_1', train)

        out = out + res
        if not self.skip_relu:
            out = nn.relu(out)
        if self.partial:
            return out, veil
        return out


class Stage(nn.Module):
    """One ResNet stage. `last_skip_relu` applies skip_relu to the final block
    only (depthnet.py:163-186); in the rgb variant it is always False and all
    blocks follow resnet.py:174-194 (identical structure)."""
    block_cls: Any
    planes: int
    num_blocks: int
    inplanes: int
    stride: int = 1
    dilation: int = 1
    last_skip_relu: bool = False
    partial: bool = False
    fused_bn: bool = False
    name_prefix: str = 'layer'

    @nn.compact
    def __call__(self, x, veil=None, train: bool = True):
        expansion = self.block_cls.expansion
        has_ds = self.stride != 1 or self.inplanes != self.planes * expansion
        for i in range(self.num_blocks):
            first = i == 0
            last = i == self.num_blocks - 1
            block = self.block_cls(
                planes=self.planes,
                stride=self.stride if first else 1,
                dilation=self.dilation if first else 1,
                has_downsample=has_ds and first,
                skip_relu=self.last_skip_relu and last,
                partial=self.partial,
                fused_bn=self.fused_bn,
                name=str(i))
            if self.partial:
                x, veil = block(x, veil, train=train)
            else:
                x = block(x, train=train)
        if self.partial:
            return x, veil
        return x


class _HeadParams(nn.Module):
    """Kernel/bias of one 3x3 regressor head, registered under exactly the
    param names, shapes and initializers of the `nn.Conv` it displaces —
    checkpoints, the torch converter and the init RNG stream (path-keyed)
    are all unchanged. Used by the fused dual-head path, which concatenates
    both heads into one conv at apply time."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', regressor_kernel_init,
                            (3, 3, self.in_features, self.features))
        bias = self.param('bias',
                          regressor_bias_init_for(self.in_features * 9),
                          (self.features,))
        return kernel, bias


class PoseResNet(nn.Module):
    """The unified trunk. See module docstring for variant semantics."""
    block: str = 'bottleneck'            # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    variant: str = 'rgb'                 # rgb|depth|fusion|partial_depth|partial_fusion
    in_channels: int = 3                 # 4 with -extra_channel, 1 with -depth_only
    stride: int = 16
    num_joints: int = 19
    depth: int = 16
    joint_space: bool = False            # rgb variant: add mat_regressor
    skip_relu: bool = False              # depth/fusion family
    early_dist: bool = False             # tap stage-3 features instead of stage-4
    bn_impl: str = ''                    # ''=POSE_TPU_BN env, 'xla'|'pallas'

    @nn.compact
    def __call__(self, x, y=None, train: bool = True):
        block_cls = BasicBlock if self.block == 'basic' else Bottleneck
        expansion = block_cls.expansion
        s2, s3, s4, d2, d3, d4 = stage_schedule(self.stride)
        fusion = self.variant in ('fusion', 'partial_fusion')
        partial_stem = self.variant == 'partial_depth'
        partial_depth_branch = self.variant == 'partial_fusion'
        # partial-conv branches keep ReferenceBatchNorm (their BNs interleave
        # with mask renormalization); everything else can run the fused
        # kernels
        fused = (self.bn_impl or bn_impl_default()) == 'pallas'

        def stem(inp, conv_name, bn_name):
            h = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        kernel_init=trunk_init, name=conv_name)(inp)
            if fused:
                h = FusedBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5, relu=True,
                                   name=bn_name)(h)
                return max_pool_3x3s2(h)
            h = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=bn_name)(h)
            return max_pool_3x3s2(nn.relu(h))

        if partial_stem:
            # partial_depthnet.py:213-221: veil=(x != 0); partial 7x7 stem;
            # veil maxpooled alongside activations
            veil = (x != 0).astype(x.dtype)
            veil = jnp.max(veil, axis=-1, keepdims=True)
            k = self.param('conv1_kernel', trunk_init,
                           (7, 7, self.in_channels, 64))
            h, veil = partial_conv(x, veil, k, 2, 3)
            h = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name='bn1')(h)
            h = max_pool_3x3s2(nn.relu(h))
            veil = max_pool_3x3s2(veil)
        elif fusion:
            h = stem(x, 'conv1', 'bn1')
            if partial_depth_branch:
                veil = (y != 0).astype(y.dtype)
                k = self.param('conv2_kernel', trunk_init, (7, 7, 1, 64))
                g, veil = partial_conv(y, veil, k, 2, 3)
                g = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name='bn2')(g)
                g = max_pool_3x3s2(nn.relu(g))
                veil = max_pool_3x3s2(veil)
            else:
                g = stem(y, 'conv2', 'bn2')
        else:
            h = stem(x, 'conv1', 'bn1')

        def make_stage(planes, blocks, inplanes, stride, dilation, name,
                       skip_last=False, partial=False):
            return Stage(block_cls=block_cls, planes=planes, num_blocks=blocks,
                         inplanes=inplanes, stride=stride, dilation=dilation,
                         last_skip_relu=skip_last, partial=partial,
                         fused_bn=fused and not partial, name=name)

        # partial variants have no skip_relu support (partial_depthnet.py,
        # partial_fusionnet.py define none)
        skip = self.skip_relu and self.variant in ('depth', 'fusion')

        if partial_stem:
            h, veil = make_stage(64, self.layers[0], 64, 1, 1, 'layer1',
                                 partial=True)(h, veil, train=train)
            h, veil = make_stage(128, self.layers[1], 64 * expansion, s2, d2,
                                 'layer2', partial=True)(h, veil, train=train)
        else:
            h = make_stage(64, self.layers[0], 64, 1, 1, 'layer1')(
                h, train=train)
            h = make_stage(128, self.layers[1], 64 * expansion, s2, d2,
                           'layer2')(h, train=train)

        if fusion:
            if partial_depth_branch:
                g, veil = make_stage(64, self.layers[0], 64, 1, 1, 'layer5',
                                     partial=True)(g, veil, train=train)
                g, veil = make_stage(128, self.layers[1], 64 * expansion, s2,
                                     d2, 'layer6', partial=True)(
                    g, veil, train=train)
            else:
                g = make_stage(64, self.layers[0], 64, 1, 1, 'layer5')(
                    g, train=train)
                g = make_stage(128, self.layers[1], 64 * expansion, s2, d2,
                               'layer6')(g, train=train)
            # Fusion block (fusionnet.py:130-140): 1x1 conv on concat, BN, relu
            cat = jnp.concatenate([h, g], axis=-1)
            f = nn.Conv(128 * expansion, (1, 1), use_bias=False,
                        kernel_init=trunk_init, name='fusion_conv')(cat)
            if fused:
                h = FusedBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5, relu=True,
                                   name='fusion_bn')(f)
            else:
                f = ReferenceBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name='fusion_bn')(f)
                h = nn.relu(f)

        m = make_stage(256, self.layers[2], 128 * expansion, s3, d3, 'layer3',
                       skip_last=skip)(h, train=train)
        n = make_stage(512, self.layers[3], 256 * expansion, s4, d4, 'layer4',
                       skip_last=skip)(nn.relu(m) if skip else m, train=train)

        head_in = 512 * expansion
        cam_out = self.depth * self.num_joints

        if (self.variant == 'rgb' and self.joint_space and not skip
                and os.environ.get('POSE_TPU_FUSED_HEAD', '0') == '1'):
            # MEASURED NEGATIVE, default OFF (POSE_TPU_FUSED_HEAD=1 to
            # enable): both regressor heads read the SAME stage-4 feature
            # (without -skip_relu the cam head's input is `n` too,
            # train.py:82 / resnet.py:176-178), so they can run as ONE conv
            # over concatenated output channels — bit-exact forward, params
            # registered per head under the nn.Conv names/shapes so
            # checkpoints and the torch converter are untouched. The
            # hypothesis was that the 19 mat channels would ride the MXU
            # lane padding of the 304 cam channels; the interleaved
            # in-process A/B measured the OPPOSITE: fused 1195.5 vs
            # separate 1209.2 img/s median (-1.13%, flagship bs128 step,
            # docs/experiments/r5_fusedhead_ab.log) — XLA schedules the
            # small separate head better than the padded 323-ch fusion.
            ck, cb = _HeadParams(cam_out, head_in,
                                 name='cam_regressor')()
            mk, mb = _HeadParams(self.num_joints, head_in,
                                 name='mat_regressor')()
            zm = jax.lax.conv_general_dilated(
                n, jnp.concatenate([ck, mk], axis=-1),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            zm = zm + jnp.concatenate([cb, mb], axis=-1)
            return zm[..., :cam_out], zm[..., cam_out:]

        z = nn.Conv(cam_out, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=regressor_kernel_init,
                    bias_init=regressor_bias_init_for(head_in * 9),
                    name='cam_regressor' if self.variant == 'rgb'
                    else 'regressor')(nn.relu(n) if skip else n)

        if self.variant == 'rgb':
            if self.joint_space:
                mat = nn.Conv(self.num_joints, (3, 3), padding=((1, 1), (1, 1)),
                              kernel_init=regressor_kernel_init,
                              bias_init=regressor_bias_init_for(head_in * 9),
                              name='mat_regressor')(n)
                return z, mat
            return z

        if self.variant == 'partial_depth':
            # partial_depthnet.py:227-229 always taps stage-4 (no skip_relu)
            return z, n
        return z, (m if self.early_dist else n)


def build_model(args, variant=None):
    """Construct a PoseResNet from the reference flag namespace (opts.py).

    The model dispatch mirrors depth_main.py:37-42:
    ('partial_' if partial_conv else '') + ('fusion' if do_fusion else 'depth').
    """
    if variant is None:
        variant = 'depth' if getattr(args, 'depth_only', False) else 'rgb'
    block = 'basic' if args.model == 'resnet18' else 'bottleneck'
    layers = (2, 2, 2, 2) if args.model == 'resnet18' else (3, 4, 6, 3)

    if variant == 'rgb':
        in_channels = 4 if getattr(args, 'extra_channel', False) else 3
    elif variant in ('depth', 'partial_depth'):
        in_channels = 1 if getattr(args, 'depth_only', False) else 3
    else:
        in_channels = 3  # fusion RGB stem; depth stem is fixed 1-channel

    partial = variant.startswith('partial_')
    return PoseResNet(
        block=block, layers=layers, variant=variant, in_channels=in_channels,
        stride=args.stride, num_joints=args.num_joints, depth=args.depth,
        joint_space=getattr(args, 'joint_space', False),
        skip_relu=(not partial) and getattr(args, 'skip_relu', False),
        early_dist=(not partial) and getattr(args, 'early_dist', False))
