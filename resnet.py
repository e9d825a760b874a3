"""RGB-model module shim (reference: resnet.py). Constructors return a
configured Flax PoseResNet plus its initialized/warm-started variables — the
functional analogue of the reference's torch modules (resnet.py:213-262)."""

import jax
import jax.numpy as jnp

from pose_tpu.models import PoseResNet, build_model
from pose_tpu.models.convert import load_pretrained
from pose_tpu.models.resnet import BasicBlock, Bottleneck

__all__ = ['Bottleneck', 'BasicBlock', 'PoseResNet', 'resnet18', 'resnet50']


def _build(args, variant, model_name):
    args.model = model_name
    model = build_model(args, variant)
    in_ch = model.in_channels
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, args.side_in, args.side_in, in_ch)), train=False)
    if getattr(args, 'pretrain', False):
        variables = load_pretrained(jax.device_get(variables), args, variant)
    return model, variables


def resnet18(args):
    """(reference resnet.py:213-236, incl. the -pretrain surgery path)"""
    return _build(args, 'rgb', 'resnet18')


def resnet50(args):
    """(reference resnet.py:239-262)"""
    return _build(args, 'rgb', 'resnet50')
