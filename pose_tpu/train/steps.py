"""Jitted train/eval step factories.

One compiled XLA program per (flag-combination) step replaces the reference's
per-batch Python orchestration (train.py:55-192, depth_train.py:161-474):
forward, soft-argmax decode, losses, backward, gradient clip and the Adam
update all fuse into a single device program. Mixed precision is bf16 compute
with fp32 parameters — this removes the reference's hand-rolled fp16
master-copy/loss-scaling/inf-skip machinery (depth_train.py:233-269) because
bf16 needs no scaling (SURVEY.md §5).

Optimizer parity: torch Adam with weight_decay adds wd*param to the gradient
*before* the moment updates (not AdamW), and clip_grad_norm_ runs before the
step — the optax chain below matches that order.
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops import heatmap, recon
from . import losses


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(args):
    return optax.chain(
        optax.clip_by_global_norm(args.grad_norm),
        optax.add_decayed_weights(args.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def init_state(model, args, tx, sample_inputs, rng=None):
    rng = jax.random.PRNGKey(0) if rng is None else rng
    variables = model.init(rng, *sample_inputs, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _compute_dtype(args):
    return jnp.bfloat16 if args.half_acc else jnp.float32


# Spatial partitioning (-mesh_spatial): a (data, space) sharding the steps
# constrain their image inputs to INSIDE the jitted program — GSPMD then
# slices H over 'space' (padding uneven extents, e.g. 257 over 4) and
# inserts the convolution halo exchanges over ICI. Device placement stays
# plain DP: jax.device_put cannot represent unevenly sharded dims,
# with_sharding_constraint can.
#
# Binding: every step factory takes an explicit `spatial=` argument —
# trainers pass their own trainer._spatial (per-instance, so a second
# trainer can never re-bind another's lazily-built steps, even when both
# share one args namespace). Callers that omit it get the module install
# as it stands when the FACTORY is called (USE_INSTALL sentinel) — a
# trace-time global read would be wrong: steps trace lazily at the first
# batch.
_SPATIAL_SHARDING = None
USE_INSTALL = object()


def set_spatial_sharding(sharding):
    """Install (or clear, with None) the module-default image-input
    sharding constraint, picked up by step factories called without an
    explicit spatial= (and by direct _apply callers at trace time)."""
    global _SPATIAL_SHARDING
    _SPATIAL_SHARDING = sharding


def _resolve_spatial(spatial):
    return _SPATIAL_SHARDING if spatial is USE_INSTALL else spatial


def _constrain_inputs(inputs, sharding):
    if sharding is None:
        return inputs
    return tuple(
        jax.lax.with_sharding_constraint(x, sharding)
        if jnp.ndim(x) == 4 else x for x in inputs)


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _apply(model, params, batch_stats, inputs, train, dtype,
           spatial=USE_INSTALL):
    """Forward with bf16 compute: params and inputs cast to `dtype`, float
    outputs cast back to fp32 (the reference's .float() at
    depth_train.py:653-655). `spatial` is the image-input sharding
    constraint — factories pass their factory-call-time value; the default
    reads the module install at trace time (direct callers)."""
    variables = {'params': _cast(params, dtype), 'batch_stats': batch_stats}
    spatial = _resolve_spatial(spatial)
    inputs = _constrain_inputs(tuple(_cast(x, dtype) for x in inputs),
                               spatial)
    if train:
        out, updates = model.apply(variables, *inputs, train=True,
                                   mutable=['batch_stats'])
        new_stats = updates['batch_stats']
    else:
        out = model.apply(variables, *inputs, train=False)
        new_stats = batch_stats
    out = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), out)
    return out, new_stats


def decode_spec_cam(cam_feat, depth, num_joints, depth_range, key_index,
                    true_cam):
    """Shared decode: volumetric soft-argmax -> root-relative -> add GT root
    (train.py:83-97 and equivalents)."""
    hm = heatmap.to_heatmap3d(cam_feat, depth, num_joints)
    relat = heatmap.decode3d(hm, depth_range)
    relat = relat - relat[:, key_index:key_index + 1]
    spec = relat + true_cam[:, key_index:key_index + 1]
    return relat, spec


def _update(tx, state, grads, lr):
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=new_opt,
                         step=state.step + 1)


# --------------------------------------------------------------- RGB engine


def make_cam_train_step(model, args, key_index, tx, spatial=USE_INSTALL):
    """cam_train (train.py:145-192): 3D loss only, no loss_div."""
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr):
        def loss_fn(params):
            cam_feat, new_stats = _apply(model, params, state.batch_stats,
                                         (batch['image'],), True, dtype,
                                         spatial=spatial)
            _, spec = decode_spec_cam(cam_feat, args.depth, args.num_joints,
                                      args.depth_range, key_index,
                                      batch['true_cam'])
            loss = losses.masked_mean_loss(criterion, spec, batch['true_cam'],
                                           batch['true_val'])
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = _update(tx, state, grads, lr).replace(batch_stats=new_stats)
        return state, {'cam_loss': loss}

    return step


def make_joint_train_step(model, args, key_index, tx, do_track,
                          spatial=USE_INSTALL):
    """joint_train (train.py:55-142): 2D + 3D losses, and from epoch 2 with
    -do_track the differentiable reconstruction loss
    loss = 0.5*(cam+mat) + recon (train.py:105-112)."""
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr):
        def loss_fn(params):
            (cam_feat, mat_feat), new_stats = _apply(
                model, params, state.batch_stats, (batch['image'],), True,
                dtype, spatial=spatial)
            hm2 = heatmap.to_heatmap2d(mat_feat, args.num_joints)
            spec_mat = heatmap.decode2d(hm2, args.side_in)
            mat_loss = losses.masked_mean_loss(
                criterion, spec_mat, batch['true_mat'], batch['true_val'])

            relat, spec = decode_spec_cam(cam_feat, args.depth,
                                          args.num_joints, args.depth_range,
                                          key_index, batch['true_cam'])
            cam_loss = losses.masked_mean_loss(
                criterion, spec, batch['true_cam'], batch['true_val'])

            loss = cam_loss + mat_loss
            recon_loss = jnp.zeros(())
            if do_track:
                recon_cam = recon.recon_root(spec_mat, relat,
                                             batch['intrinsics'])
                recon_loss = losses.masked_mean_loss(
                    criterion, recon_cam, batch['true_cam'],
                    batch['true_val'])
                loss = loss * 0.5 + recon_loss
            return loss, (new_stats, cam_loss, mat_loss, recon_loss)

        (_, (new_stats, cam_loss, mat_loss, recon_loss)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        state = _update(tx, state, grads, lr).replace(batch_stats=new_stats)
        return state, {'cam_loss': cam_loss, 'mat_loss': mat_loss,
                       'recon_loss': recon_loss}

    return step


def make_rgb_eval_step(model, args, key_index, spatial=USE_INSTALL):
    """Forward + decode for cam_test/joint_test (train.py:205-368); metrics
    and back-rotation run on host over the returned arrays."""
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)
    joint_space = args.joint_space

    @jax.jit
    def step(state, batch):
        out, _ = _apply(model, state.params, state.batch_stats,
                        (batch['image'],), False, dtype, spatial=spatial)
        result = {}
        if joint_space:
            cam_feat, mat_feat = out
            hm2 = heatmap.to_heatmap2d(mat_feat, args.num_joints)
            spec_mat = heatmap.decode2d(hm2, args.side_in)
            result['spec_mat'] = spec_mat
            result['mat_loss'] = losses.masked_mean_loss(
                criterion, spec_mat, batch['true_mat'], batch['true_val'])
        else:
            cam_feat = out
        relat, spec = decode_spec_cam(cam_feat, args.depth, args.num_joints,
                                      args.depth_range, key_index,
                                      batch['true_cam'])
        result['relat_cam'] = relat
        result['spec_cam'] = spec
        result['cam_loss'] = losses.masked_mean_loss(
            criterion, spec, batch['true_cam'], batch['true_val'])
        return result

    return step


# ------------------------------------------------------------- depth engine


def _depth_cam_loss(criterion, spec, true_cam, valid, loss_div):
    """The depth engine divides both sides by loss_div before the criterion
    (depth_train.py:207)."""
    return losses.masked_mean_loss(criterion, spec / loss_div,
                                   true_cam / loss_div, valid)


def make_vanilla_train_step(model, args, key_index, tx,
                            spatial=USE_INSTALL):
    """vanilla_train (depth_train.py:376-462): single modality, the model
    returns (cam_feat, last_feat)."""
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr):
        def loss_fn(params):
            (cam_feat, _), new_stats = _apply(
                model, params, state.batch_stats, (batch['in_image'],), True,
                dtype, spatial=spatial)
            _, spec = decode_spec_cam(cam_feat, args.depth, args.num_joints,
                                      args.depth_range, key_index,
                                      batch['true_cam'])
            loss = _depth_cam_loss(criterion, spec, batch['true_cam'],
                                   batch['true_val'], args.loss_div)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = _update(tx, state, grads, lr).replace(batch_stats=new_stats)
        return state, {'cam_loss': loss}

    return step


def make_fusion_train_step(model, args, key_index, tx,
                           spatial=USE_INSTALL):
    """fusion_train (depth_train.py:286-373): model(color, depth)."""
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr):
        def loss_fn(params):
            (cam_feat, _), new_stats = _apply(
                model, params, state.batch_stats,
                (batch['color'], batch['depth']), True, dtype,
                spatial=spatial)
            _, spec = decode_spec_cam(cam_feat, args.depth, args.num_joints,
                                      args.depth_range, key_index,
                                      batch['true_cam'])
            loss = _depth_cam_loss(criterion, spec, batch['true_cam'],
                                   batch['true_val'], args.loss_div)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = _update(tx, state, grads, lr).replace(batch_stats=new_stats)
        return state, {'cam_loss': loss}

    return step


def distill_loss(args, teach_last, last_feat, atten_map):
    """The distillation objective (depth_train.py:115-129).

    atten_map: (B, H, W, 1) in NHWC (the reference's (B, 1, H, W)).

    Note on -bin_dist: the reference calls
    F.binary_cross_entropy_with_logits with default reduction='mean', so
    `diff` is a *scalar* that then broadcasts over the attention map
    (depth_train.py:117-121); replicated literally for parity.
    """
    batch = last_feat.shape[0]
    if args.bin_dist:
        bce = jnp.mean(losses.bce_with_logits(last_feat,
                                              jax.nn.sigmoid(teach_last)))
        diff = bce * atten_map
        return jnp.mean(jnp.sum(diff.reshape(batch, -1), axis=-1))
    if args.sigmoid:
        diff = jax.nn.sigmoid(teach_last) - jax.nn.sigmoid(last_feat)
    else:
        diff = teach_last - last_feat
    diff = diff * atten_map
    # torch.norm's backward defines a ZERO subgradient at diff == 0
    # (relevant when the student is warm-started from the teacher
    # checkpoint, a supported create_pair pattern: features match exactly
    # on step 1); jnp.linalg.norm's sqrt would emit NaN there and poison
    # the whole update. Double-where keeps the value bit-identical and the
    # gradient torch-equal on both branches.
    sq = jnp.sum(jnp.square(diff.reshape(batch, -1)), axis=-1)
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.mean(jnp.where(sq > 0, norm, 0.0))


def make_distill_train_step(model, teacher, args, key_index, tx,
                            teacher_is_fusion, with_semi,
                            spatial=USE_INSTALL):
    """distill_train (depth_train.py:161-283): frozen-teacher forward,
    distillation on last feature maps with alpha weighting, optional
    semi-supervised extra batch folded into the same update.

    With -do_freeze, BN runs in eval mode for both networks
    (depth_train.py:156-158); otherwise the teacher's BN uses *batch*
    statistics — torch modules stay in train mode under no_grad — and its
    running stats drift (momentum 0.9) exactly as the reference's teacher
    does. The step therefore returns updated teacher_vars which the engine
    threads back in. The n/(n-1) unbiased-variance correction torch folds
    into running_var updates is replicated by ops/batchnorm.py
    (ReferenceBatchNorm), so eval-mode statistics match the reference too.
    """
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)
    bn_train = not args.do_freeze

    def teacher_forward(teacher_vars, batch):
        if teacher_is_fusion:
            inputs = (batch['color'], batch['depth'])
        else:
            inputs = ((batch['depth'],) if args.depth_only
                      else (batch['color'],))
        (teach_cam, teach_last), new_teach_stats = _apply(
            teacher, teacher_vars['params'], teacher_vars['batch_stats'],
            inputs, bn_train, dtype, spatial=spatial)
        teacher_vars = dict(params=teacher_vars['params'],
                            batch_stats=new_teach_stats)
        return (jax.lax.stop_gradient(teach_cam),
                jax.lax.stop_gradient(teach_last),
                jax.lax.stop_gradient(teacher_vars))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, teacher_vars, batch, lr, alpha, semi_batch=None):
        teach_cam, teach_last, teacher_vars = teacher_forward(teacher_vars,
                                                              batch)

        if with_semi:
            _, s_teach_last, teacher_vars = teacher_forward(teacher_vars,
                                                            semi_batch)

        def loss_fn(params):
            (cam_feat, last_feat), new_stats = _apply(
                model, params, state.batch_stats, (batch['color'],), bn_train,
                dtype, spatial=spatial)
            if not bn_train:
                new_stats = state.batch_stats
            d_loss = distill_loss(args, teach_last, last_feat,
                                  batch['atten_map'])
            _, spec = decode_spec_cam(cam_feat, args.depth, args.num_joints,
                                      args.depth_range, key_index,
                                      batch['true_cam'])
            c_loss = _depth_cam_loss(criterion, spec, batch['true_cam'],
                                     batch['true_val'], args.loss_div)
            loss = d_loss * alpha + c_loss
            s_loss = jnp.zeros(())
            if with_semi:
                (s_cam, s_last), new_stats2 = _apply(
                    model, params, new_stats, (semi_batch['color'],),
                    bn_train, dtype, spatial=spatial)
                if bn_train:
                    new_stats = new_stats2
                s_loss = distill_loss(args, s_teach_last, s_last,
                                      semi_batch['atten_map'])
                loss = loss + s_loss * alpha
            return loss, (new_stats, c_loss, d_loss, s_loss)

        (_, (new_stats, c_loss, d_loss, s_loss)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        state = _update(tx, state, grads, lr).replace(batch_stats=new_stats)
        return state, teacher_vars, {'cam_loss': c_loss, 'dist_loss': d_loss,
                                     'semi_loss': s_loss}

    return step


def make_depth_eval_step(model, args, key_index, fusion,
                         spatial=USE_INSTALL):
    """vanilla_test / fusion_test forward+decode (depth_train.py:477-607)."""
    criterion = losses.get_criterion(args.criterion)
    dtype = _compute_dtype(args)
    spatial = _resolve_spatial(spatial)

    @jax.jit
    def step(state, batch):
        inputs = ((batch['color'], batch['depth']) if fusion
                  else (batch['in_image'],))
        (cam_feat, last_feat), _ = _apply(model, state.params,
                                          state.batch_stats, inputs, False,
                                          dtype, spatial=spatial)
        relat, spec = decode_spec_cam(cam_feat, args.depth, args.num_joints,
                                      args.depth_range, key_index,
                                      batch['true_cam'])
        loss = _depth_cam_loss(criterion, spec, batch['true_cam'],
                               batch['true_val'], args.loss_div)
        return {'spec_cam': spec, 'relat_cam': relat, 'cam_loss': loss,
                'last_feat': last_feat}

    return step
