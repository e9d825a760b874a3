"""RGB+depth fusion model module shim (reference: fusionnet.py). Returns a
configured Flax PoseResNet (variant='fusion': two stems + stages 1-2 with a
1x1 Fusion block) plus variables; pretrain applies the manual_update depth
branch seeding (fusionnet.py:243-297)."""

import jax
import jax.numpy as jnp

from pose_tpu.models import build_model
from pose_tpu.models.convert import load_pretrained

__all__ = ['resnet18', 'resnet50', 'build_resnet']


def build_resnet(args, pretrain, model_name):
    args.model = model_name
    model = build_model(args, 'fusion')
    s = args.side_in
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, s, s, 3)),
                           jnp.ones((1, s, s, 1)), train=False)
    if pretrain:
        variables = load_pretrained(jax.device_get(variables), args, 'fusion')
    return model, variables


def resnet18(args, pretrain):
    return build_resnet(args, pretrain, 'resnet18')


def resnet50(args, pretrain):
    return build_resnet(args, pretrain, 'resnet50')
