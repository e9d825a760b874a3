"""Checkpoint tests: Logger .pth semantics and the orbax full-state sidecar."""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_tpu.models import PoseResNet
from pose_tpu.train import Logger, steps
from pose_tpu.train.orbax_io import restore_train_state, save_train_state


def small_args(tmp, **over):
    base = dict(criterion='SmoothL1', half_acc=False, depth=4, num_joints=5,
                depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
                weight_decay=4e-5, loss_div=10.0, save_path=str(tmp),
                model='resnet18', suffix='ck', save_record=True,
                test_only=False, val_only=False, resume=False)
    base.update(over)
    return types.SimpleNamespace(**base)


def make_state(args):
    model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='rgb',
                       stride=32, num_joints=5, depth=4)
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx, (jnp.ones((1, 65, 65, 3)),))
    step = steps.make_cam_train_step(model, args, 2, tx)
    batch = dict(image=jnp.ones((2, 65, 65, 3)),
                 true_cam=jnp.zeros((2, 5, 3)),
                 true_val=jnp.ones((2, 5), bool))
    state, _ = step(state, batch, 1e-4)
    return model, tx, state


@pytest.mark.slow
def test_orbax_full_state_roundtrip(tmp_path):
    args = small_args(tmp_path)
    model, tx, state = make_state(args)
    step_no = save_train_state(str(tmp_path / 'orbax'), state)
    assert step_no == 1

    template = steps.init_state(model, args, tx, (jnp.ones((1, 65, 65, 3)),))
    restored = restore_train_state(str(tmp_path / 'orbax'), template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_logger_best_pointer_and_record(tmp_path):
    args = small_args(tmp_path)
    _, _, state = make_state(args)
    variables = {'params': jax.device_get(state.params),
                 'batch_stats': jax.device_get(state.batch_stats)}

    logger = Logger(args, None)
    logger.record(1, dict(cam_train_loss=1.0),
                  dict(score_auc=0.5, score_pck=0.4), variables)
    logger.record(2, dict(cam_train_loss=0.9),
                  dict(score_auc=0.3, score_pck=0.3), variables)

    from pose_tpu.models.convert import load_torch_file
    save_dir = os.path.join(str(tmp_path), 'resnet18-ck')
    assert load_torch_file(os.path.join(save_dir, 'best.pth'))['best'] == 1
    rec = load_torch_file(os.path.join(save_dir, 'train_record.pth'))
    assert rec['score_auc'] == [0.5, 0.3]
    ck = load_torch_file(os.path.join(save_dir, 'model_2.pth'))
    assert ck['state']['epoch'] == 2
    assert 'conv1.weight' in ck['model']


def test_orbax_resave_earlier_step_not_silently_dropped(tmp_path):
    """orbax's should_save silently refuses steps <= the latest existing
    one; save_train_state must actually persist (force) rather than return
    success without writing (restart-from-scratch into an existing dir)."""
    args = small_args(tmp_path)
    model, tx, state = make_state(args)
    d = str(tmp_path / 'orbax')
    save_train_state(d, state, step=5)
    save_train_state(d, state, step=3)   # would be a silent no-op unforced

    template = steps.init_state(model, args, tx, (jnp.ones((1, 65, 65, 3)),))
    restored = restore_train_state(d, template, step=3)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
