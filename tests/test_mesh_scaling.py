"""Multi-chip scaling-STRUCTURE assertions on the virtual 8-device CPU mesh.

The cluster/podslice tests prove mesh *correctness* (bit-equal epochs across
process counts); this file proves the compiled SPMD programs actually
*scale* — the missing half of the `nn.DataParallel` replacement story
(reference main.py:66, depth_main.py:105-106, where replicate/scatter/
gather hides whether the per-GPU work really shrinks):

  * per-device FLOPs of the 8-way program ~= single-device FLOPs / 8
    (via `jax.stages.Compiled.cost_analysis()` — post-GSPMD HLO is the
    per-device program);
  * gradient synchronization is all-reduce traffic of ~parameter-size
    bytes (XLA's combiner may emit one variadic or several all-reduces;
    the BYTES are the invariant), plus only small BN-statistics /
    loss-scalar reductions on top;
  * NO full-batch operand is all-gathered or replicated through the step
    (zero all-gather / reduce-scatter bytes in pure DP);
  * `-mesh_spatial` pays its halo exchanges as collective-permute (not
    batch-wide gathers).

Each family builder returns (step_lowered_args, param_bytes); the checks
lower+compile the SAME global batch once on one device and once over the
mesh and compare. No step is executed — this is structure, not numerics.
"""

import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

SIDE = 65
JOINTS = 17
# the suite runs at the documented 8-device mesh (conftest); the env
# override lets the __main__ probe regenerate the structure table at
# other device counts (e.g. 16 — docs/experiments/r5_scaling_structure.log)
N_DEV = int(os.environ.get('POSE_TPU_SCALING_NDEV', 8))

_DTYPE_BYTES = {
    'f64': 8, 'f32': 4, 'f16': 2, 'bf16': 2,
    's64': 8, 's32': 4, 's16': 2, 's8': 1,
    'u64': 8, 'u32': 4, 'u16': 2, 'u8': 1, 'pred': 1,
}


def _flag_args(**over):
    import types
    base = dict(
        model='resnet18', criterion='SmoothL1', half_acc=False,
        extra_channel=False, joint_space=False, skip_relu=False,
        early_dist=False, depth_only=False,
        side_in=SIDE, stride=32, num_joints=JOINTS, depth=4,
        batch_size=2 * N_DEV, depth_range=1000.0, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0)
    base.update(over)
    return types.SimpleNamespace(**base)


def _tiny_model(variant, in_channels):
    """Smallest trunk that still has every structural element (stem, four
    stages, head(s), BN stats): the scaling-structure assertions are about
    SPMD partitioning, not capacity, and (1,1,1,1) halves the 10 CPU
    compiles that dominate this file's wall time."""
    from pose_tpu.models import PoseResNet
    return PoseResNet(block='basic', layers=(1, 1, 1, 1), variant=variant,
                      in_channels=in_channels, stride=32,
                      num_joints=JOINTS, depth=4)


def _param_bytes(state):
    return int(sum(np.prod(x.shape) * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(state.params)))


def _shape_bytes(shape_text):
    """Sum byte sizes of every `dtype[d0,d1,...]` token in an HLO shape
    string (handles tuple shapes from variadic all-reduce)."""
    total = 0
    for dtype, dims in re.findall(r'(\w+)\[([\d,]*)\]', shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(compiled):
    """Parse the optimized (post-SPMD, per-device) HLO text: per collective
    kind, the instruction count and summed output bytes."""
    stats = {k: dict(count=0, bytes=0)
             for k in ('all-reduce', 'all-gather', 'reduce-scatter',
                       'collective-permute', 'all-to-all')}
    for line in compiled.as_text().splitlines():
        m = re.match(r'\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(.*)$', line)
        if not m:
            continue
        rhs = m.group(1)
        for kind in stats:
            # match the op name at the call position, including async
            # -start variants; exclude `-done` (same traffic, counted once)
            if re.search(rf'\b{kind}(-start)?\(', rhs):
                shape_text = rhs.split(f'{kind}', 1)[0]
                stats[kind]['count'] += 1
                stats[kind]['bytes'] += _shape_bytes(shape_text)
    return stats


def _flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca['flops'])


# ------------------------------------------------------------ family builders


def _build_cam(mesh):
    from pose_tpu.parallel import shard_batch, shard_replicated
    from pose_tpu.train import steps

    args = _flag_args()
    model = _tiny_model('rgb', 3)
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, SIDE, SIDE, 3)),))
    step = steps.make_cam_train_step(model, args, 2, tx, spatial=None)
    b = args.batch_size
    rng = np.random.RandomState(0)
    batch = dict(
        image=rng.rand(b, SIDE, SIDE, 3).astype(np.float32),
        true_cam=rng.uniform(-400, 400, (b, JOINTS, 3)).astype(np.float32),
        true_val=np.ones((b, JOINTS), bool))
    pbytes = _param_bytes(state)
    if mesh is not None:
        state = shard_replicated(mesh, state)
        batch = shard_batch(mesh, batch)
    return step, (state, batch, 1e-4), pbytes


def _build_fusion(mesh):
    from pose_tpu.parallel import shard_batch, shard_replicated
    from pose_tpu.train import steps

    args = _flag_args(do_fusion=True, to_depth=False, nexponent=False)
    model = _tiny_model('fusion', 3)
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, SIDE, SIDE, 3)),
                              jnp.ones((1, SIDE, SIDE, 1))))
    step = steps.make_fusion_train_step(model, args, 2, tx, spatial=None)
    b = args.batch_size
    rng = np.random.RandomState(1)
    batch = dict(
        color=rng.rand(b, SIDE, SIDE, 3).astype(np.float32),
        depth=rng.rand(b, SIDE, SIDE, 1).astype(np.float32),
        true_cam=rng.uniform(-400, 400, (b, JOINTS, 3)).astype(np.float32),
        true_val=np.ones((b, JOINTS), bool))
    pbytes = _param_bytes(state)
    if mesh is not None:
        state = shard_replicated(mesh, state)
        batch = shard_batch(mesh, batch)
    return step, (state, batch, 1e-4), pbytes


def _build_partial(mesh):
    from pose_tpu.parallel import shard_batch, shard_replicated
    from pose_tpu.train import steps

    args = _flag_args(depth_only=True, partial_conv=True, do_fusion=False,
                      to_depth=False, nexponent=False)
    model = _tiny_model('partial_depth', 1)
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, SIDE, SIDE, 1)),))
    step = steps.make_vanilla_train_step(model, args, 2, tx, spatial=None)
    b = args.batch_size
    rng = np.random.RandomState(2)
    depth_in = rng.rand(b, SIDE, SIDE, 1).astype(np.float32)
    depth_in[:, ::3] = 0.0
    batch = dict(
        in_image=depth_in,
        true_cam=rng.uniform(-400, 400, (b, JOINTS, 3)).astype(np.float32),
        true_val=np.ones((b, JOINTS), bool))
    pbytes = _param_bytes(state)
    if mesh is not None:
        state = shard_replicated(mesh, state)
        batch = shard_batch(mesh, batch)
    return step, (state, batch, 1e-4), pbytes


def _build_distill(mesh):
    from pose_tpu.parallel import shard_batch, shard_replicated
    from pose_tpu.train import steps

    args = _flag_args(do_teach=True, attention=True, do_freeze=False,
                      sigmoid=False, bin_dist=False, do_fusion=False,
                      nexponent=False, to_depth=False, semi_teach=False)
    model = _tiny_model('depth', 3)
    teacher = _tiny_model('depth', 3)
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, SIDE, SIDE, 3)),))
    t_raw = teacher.init(jax.random.PRNGKey(3),
                         jnp.ones((1, SIDE, SIDE, 3)), train=False)
    teacher_vars = dict(params=t_raw['params'],
                        batch_stats=t_raw['batch_stats'])
    step = steps.make_distill_train_step(model, teacher, args, 2, tx,
                                         teacher_is_fusion=False,
                                         with_semi=False, spatial=None)
    b = args.batch_size
    so = (SIDE - 1) // args.stride + 1
    rng = np.random.RandomState(3)
    batch = dict(
        color=rng.rand(b, SIDE, SIDE, 3).astype(np.float32),
        true_cam=rng.uniform(-400, 400, (b, JOINTS, 3)).astype(np.float32),
        true_val=np.ones((b, JOINTS), bool),
        atten_map=rng.rand(b, so, so, 1).astype(np.float32))
    pbytes = _param_bytes(state)
    if mesh is not None:
        state = shard_replicated(mesh, state)
        teacher_vars = shard_replicated(mesh, teacher_vars)
        batch = shard_batch(mesh, batch)
    return step, (state, teacher_vars, batch,
                  jnp.float32(1e-4), jnp.float32(0.5)), pbytes


def _build_spatial(mesh):
    """Spatial family: on the (data, space) = (4, 2) fold of the same 8
    devices, image H sharded 2-way inside the step. mesh=None compiles the
    unconstrained single-device twin."""
    from pose_tpu.parallel import (shard_batch, shard_replicated,
                                   spatial_sharding)
    from pose_tpu.train import steps

    args = _flag_args(batch_size=2 * N_DEV)
    model = _tiny_model('rgb', 3)
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, SIDE, SIDE, 3)),))
    spatial = spatial_sharding(mesh) if mesh is not None else None
    step = steps.make_cam_train_step(model, args, 2, tx, spatial=spatial)
    b = args.batch_size
    rng = np.random.RandomState(4)
    batch = dict(
        image=rng.rand(b, SIDE, SIDE, 3).astype(np.float32),
        true_cam=rng.uniform(-400, 400, (b, JOINTS, 3)).astype(np.float32),
        true_val=np.ones((b, JOINTS), bool))
    pbytes = _param_bytes(state)
    if mesh is not None:
        state = shard_replicated(mesh, state)
        batch = shard_batch(mesh, batch)
    return step, (state, batch, 1e-4), pbytes


FAMILIES = {
    'cam': (_build_cam, False),
    'fusion': (_build_fusion, False),
    'partial': (_build_partial, False),
    'distill': (_build_distill, False),
    'spatial': (_build_spatial, True),
}


def _compile_pair(name):
    """(single-device compiled, mesh compiled, param_bytes) for a family."""
    from pose_tpu.parallel import make_mesh

    build, is_spatial = FAMILIES[name]
    mesh = make_mesh(N_DEV, spatial=2) if is_spatial else make_mesh(N_DEV)
    step1, args1, pbytes = build(None)
    c1 = step1.lower(*args1).compile()
    stepn, argsn, _ = build(mesh)
    cn = stepn.lower(*argsn).compile()
    return c1, cn, pbytes


def _report(name, c1, cn, pbytes):
    f1, fn = _flops(c1), _flops(cn)
    stats = collective_stats(cn)
    return dict(family=name, flops_1dev=f1, flops_per_dev=fn,
                ratio=f1 / fn if fn else float('inf'),
                param_bytes=pbytes, collectives=stats)


@pytest.fixture(scope='module', params=list(FAMILIES))
def family_report(request):
    name = request.param
    c1, cn, pbytes = _compile_pair(name)
    return _report(name, c1, cn, pbytes)


def test_per_device_flops_shrink(family_report):
    """The per-device program really does 1/N of the work: SPMD partitioned
    the batch, it did not replicate it. Tolerance covers conv padding on the
    odd 65-px spatial dims; the spatial family additionally pays halo
    recompute on H shards that are only 33 px tall at these toy shapes
    (production 257-px crops amortize halos far better), so its bound is
    looser. Measured on this mesh: DP families 7.12-7.37, spatial
    5.47-5.55 across the resnet18 and tiny-trunk runs
    (docs/experiments/r5_scaling_structure.log)."""
    r = family_report
    lo = 4.5 if r['family'] == 'spatial' else 7.0
    assert lo <= r['ratio'] <= 9.0, r


def test_gradient_sync_is_param_sized_allreduce(family_report):
    """Gradient sync = all-reduce bytes ~ parameter bytes. Lower bound:
    every gradient is reduced. Upper bound: only small extras ride along
    (BN batch-statistics mean/var pairs and loss scalars — per-channel,
    orders below param bytes); a full-batch activation sneaking into an
    all-reduce would blow it. Measured: DP families land at 1.001-1.003x
    param bytes. The (data, space) 2-D mesh reduces gradients once per
    mesh axis (measured 2.002x), hence its higher cap."""
    r = family_report
    ar = r['collectives']['all-reduce']['bytes']
    cap = 2.5 if r['family'] == 'spatial' else 1.5
    assert ar >= r['param_bytes'], r
    assert ar <= cap * r['param_bytes'], r


def test_no_batch_gather(family_report):
    """Pure DP must move NO operand between devices outside the reductions:
    zero all-gather / all-to-all / reduce-scatter / collective-permute
    traffic — the structural guarantee that no batch-size x full-spatial
    operand is replicated through the step (the scatter/gather the
    reference's nn.DataParallel paid every step, main.py:66). The spatial
    fold is exempt from the gather bound: its H-halo traffic is the point
    (asserted in test_spatial_pays_halo_exchanges), and XLA:CPU's
    partitioner resolves some halo regions by all-gathering the sharded H
    axis rather than collective-permute — a backend scheduling choice, so
    gather BYTES are not a cross-backend invariant there."""
    r = family_report
    c = r['collectives']
    assert c['all-to-all']['bytes'] == 0, r
    assert c['reduce-scatter']['bytes'] == 0, r
    if r['family'] != 'spatial':
        assert c['all-gather']['bytes'] == 0, r
        assert c['collective-permute']['bytes'] == 0, r


def test_spatial_pays_halo_exchanges(family_report):
    """-mesh_spatial must actually exchange halos (the point of the fold):
    collective-permute appears in the compiled program (measured: 53-101
    permutes totalling ~1-2 MB — narrow edge bands, orders below the
    activation volume), possibly alongside backend-chosen all-gathers."""
    r = family_report
    if r['family'] != 'spatial':
        pytest.skip('spatial-only assertion')
    c = r['collectives']
    assert c['collective-permute']['count'] >= 1, r


def main():
    import json
    for name in FAMILIES:
        c1, cn, pbytes = _compile_pair(name)
        print(json.dumps(_report(name, c1, cn, pbytes)), flush=True)


if __name__ == '__main__':
    main()
