"""Partial-conv fusion model module shim (reference: partial_fusionnet.py).
variant='partial_fusion': the depth branch (conv2/layer5/layer6) is
partial-conv with veil=(y != 0); the reference's RGB PartialConv stem is
called without a mask and would crash (partial_fusionnet.py:202 vs :251), so
the RGB branch here is an ordinary conv stem — the documented intent."""

import jax
import jax.numpy as jnp

from pose_tpu.models import build_model
from pose_tpu.models.convert import load_pretrained

__all__ = ['resnet18', 'resnet50', 'build_resnet']


def build_resnet(args, pretrain, model_name):
    args.model = model_name
    model = build_model(args, 'partial_fusion')
    s = args.side_in
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, s, s, 3)),
                           jnp.ones((1, s, s, 1)), train=False)
    if pretrain:
        variables = load_pretrained(jax.device_get(variables), args,
                                    'partial_fusion')
    return model, variables


def resnet18(args, pretrain):
    return build_resnet(args, pretrain, 'resnet18')


def resnet50(args, pretrain):
    return build_resnet(args, pretrain, 'resnet50')
