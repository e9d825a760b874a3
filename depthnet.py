"""Single-modality model module shim (reference: depthnet.py). Returns a
configured Flax PoseResNet (variant='depth' — skip_relu/early_dist taps,
1-channel stem under -depth_only) plus variables; pretrain honors the
depth-only slice and depth-host replicate surgeries (depthnet.py:203-229)."""

import jax
import jax.numpy as jnp

from pose_tpu.models import build_model
from pose_tpu.models.convert import load_pretrained

__all__ = ['resnet18', 'resnet50', 'build_resnet']


def build_resnet(args, pretrain, model_name):
    args.model = model_name
    model = build_model(args, 'depth')
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, args.side_in, args.side_in, model.in_channels)),
        train=False)
    if pretrain:
        variables = load_pretrained(jax.device_get(variables), args, 'depth')
    return model, variables


def resnet18(args, pretrain):
    return build_resnet(args, pretrain, 'resnet18')


def resnet50(args, pretrain):
    return build_resnet(args, pretrain, 'resnet50')
