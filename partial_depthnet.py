"""Partial-conv depth model module shim (reference: partial_depthnet.py).
variant='partial_depth': the stem and stages 1-2 are mask-propagating partial
convs threading veil=(x != 0) (partial_depthnet.py:213-229)."""

import jax
import jax.numpy as jnp

from pose_tpu.models import build_model
from pose_tpu.models.convert import load_pretrained

__all__ = ['resnet18', 'resnet50', 'build_resnet']


def build_resnet(args, pretrain, model_name):
    assert args.depth_only  # partial_depthnet.py:164
    args.model = model_name
    model = build_model(args, 'partial_depth')
    s = args.side_in
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, s, s, 1)),
                           train=False)
    if pretrain:
        variables = load_pretrained(jax.device_get(variables), args,
                                    'partial_depth')
    return model, variables


def resnet18(args, pretrain):
    return build_resnet(args, pretrain, 'resnet18')


def resnet50(args, pretrain):
    return build_resnet(args, pretrain, 'resnet50')
