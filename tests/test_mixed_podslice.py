"""BASELINE config 5: multi-dataset (CMU + NTU + PKU) mixed training with
full on-device augmentation over an 8-device mesh (pod-slice simulation on
the virtual CPU mesh)."""

import json
import types

import numpy as np
import pytest

import jax


def make_args(metadata_path, data_name, **over):
    base = dict(criterion='SmoothL1', half_acc=False, depth=4, num_joints=17,
                depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
                weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4,
                n_epochs=1, do_track=False, joint_space=False,
                shuffle=True, geometry=True, colour=True, eraser=False,
                occluder=False, occ_path=None, occ_count=0, batch_size=8,
                data_name=data_name, metadata_path=metadata_path,
                random_zoom=0.9, n_cudas=8, workers=1, nexponent=False,
                to_depth=False, do_teach=False, attention=False,
                semi_teach=False, extra_channel=False, model='resnet18',
                depth_only=False, skip_relu=False, early_dist=False)
    base.update(over)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope='module')
def combined(tmp_path_factory):
    from pose_tpu.data.synthetic import make_ntu_fixture, make_pku_fixture
    root = tmp_path_factory.mktemp('mix')
    ntu_meta = make_ntu_fixture(str(root / 'ntu'), num_train=8, num_valid=4)
    pku_meta = make_pku_fixture(str(root / 'pku'), num_train=8, num_valid=4)
    merged = json.load(open(ntu_meta))
    pku = json.load(open(pku_meta))
    for key in ('root', 'loader', 'no_depth', 'thresholds'):
        merged[key].update(pku[key])
    path = str(root / 'metadata.json')
    json.dump(merged, open(path, 'w'))
    return path


def test_mixed_training_on_8_device_mesh(combined):
    assert len(jax.devices()) >= 8, 'conftest must provide 8 virtual devices'
    import jax.numpy as jnp

    from depth_main import get_info
    from pose_tpu.data.mixed import build_mixed_loader
    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh, shard_replicated
    from pose_tpu.train import steps

    info = get_info()
    args = make_args(combined, 'ntu')
    mesh = make_mesh(8)
    loader = build_mixed_loader(args, 'train', info, ['ntu', 'pku'],
                                metadata_path=combined, mesh=mesh)
    assert len(loader) == 2

    model = build_model(args, 'depth')      # RGB-input depthnet variant
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, 65, 65, 3)),))
    state = shard_replicated(mesh, state)
    step = steps.make_vanilla_train_step(model, args, info.key_index, tx)

    losses = []
    seen = set()
    for batch in loader:
        seen.add(batch['_dataset'])
        device_batch = dict(in_image=batch['color'],
                            true_cam=batch['true_cam'],
                            true_val=batch['true_val'])
        state, out = step(state, device_batch, 1e-4)
        losses.append(float(out['cam_loss']))
    assert len(losses) == 2 and all(np.isfinite(losses))
    assert seen == {0, 1}  # both datasets contributed batches
    # params remain replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_batch_padding_to_mesh(combined):
    """Odd batch sizes are padded to the mesh size with zero-weight rows;
    metrics and losses must only count real samples."""
    import jax.numpy as jnp

    from depth_main import get_info
    from pose_tpu.data.loader import DepthPoseLoader
    from pose_tpu.parallel import make_mesh

    info = get_info()
    args = make_args(combined, 'ntu', batch_size=3)
    mesh = make_mesh(8)
    loader = DepthPoseLoader(args, 'train', info, mesh=mesh)
    batch = next(iter(loader))
    assert batch['_true_size'] == 3
    assert batch['color'].shape[0] % 8 == 0
    padded = np.asarray(batch['true_val'])[batch['_true_size']:]
    assert not padded.any()          # padded rows carry no loss weight


def test_distill_step_on_8_device_mesh(combined):
    """Distillation over the mesh: batch sharded on 'data', student state and
    teacher variables replicated; the step returns drifted (replicated)
    teacher batch_stats (train-mode teacher BN, depth_train.py:156-158)."""
    import jax.numpy as jnp

    from depth_main import get_info
    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh, shard_batch, shard_replicated
    from pose_tpu.train import steps

    info = get_info()
    args = make_args(combined, 'ntu', do_teach=True, attention=True,
                     do_freeze=False, sigmoid=False, bin_dist=False,
                     alpha_init=0.5, alpha_dest=0.1, alpha_span=10)
    mesh = make_mesh(8)

    model = build_model(args, 'depth')
    teacher = build_model(args, 'depth')
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx, (jnp.ones((1, 65, 65, 3)),))
    state = shard_replicated(mesh, state)
    t_raw = teacher.init(jax.random.PRNGKey(3), jnp.ones((1, 65, 65, 3)),
                         train=False)
    teacher_vars = shard_replicated(
        mesh, dict(params=t_raw['params'], batch_stats=t_raw['batch_stats']))
    old_stats = jax.tree_util.tree_map(np.asarray,
                                       teacher_vars['batch_stats'])

    step = steps.make_distill_train_step(model, teacher, args,
                                         info.key_index, tx,
                                         teacher_is_fusion=False,
                                         with_semi=False)
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, dict(
        color=rng.rand(8, 65, 65, 3).astype(np.float32),
        true_cam=rng.uniform(-300, 300, (8, 17, 3)).astype(np.float32),
        true_val=np.ones((8, 17), bool),
        atten_map=rng.rand(8, 3, 3, 1).astype(np.float32)))
    state, teacher_vars, out = step(state, teacher_vars, batch,
                                    jnp.float32(1e-4), jnp.float32(0.5))
    assert np.isfinite(float(out['cam_loss']))
    assert np.isfinite(float(out['dist_loss']))
    drift = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        teacher_vars['batch_stats'], old_stats)
    assert max(jax.tree_util.tree_leaves(drift)) > 1e-5
    # teacher stats and student params stay replicated on all 8 devices
    for tree in (teacher_vars['batch_stats'], state.params):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        assert len(leaf.sharding.device_set) == 8


def test_fusion_step_on_8_device_mesh(combined):
    """Config-3 fusion (two-stem) train step over the mesh: both modality
    inputs sharded on 'data', params replicated (VERDICT r2 item 7)."""
    import jax.numpy as jnp

    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh, shard_batch, shard_replicated
    from pose_tpu.train import steps

    args = make_args(combined, 'ntu', do_fusion=True)
    mesh = make_mesh(8)
    model = build_model(args, 'fusion')
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx,
                             (jnp.ones((1, 65, 65, 3)),
                              jnp.ones((1, 65, 65, 1))))
    state = shard_replicated(mesh, state)
    step = steps.make_fusion_train_step(model, args, 2, tx)

    rng = np.random.RandomState(1)
    batch = shard_batch(mesh, dict(
        color=rng.rand(8, 65, 65, 3).astype(np.float32),
        depth=rng.rand(8, 65, 65, 1).astype(np.float32),
        true_cam=rng.uniform(-300, 300, (8, 17, 3)).astype(np.float32),
        true_val=np.ones((8, 17), bool)))
    for _ in range(2):
        state, out = step(state, batch, 1e-4)
    assert np.isfinite(float(out['cam_loss']))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_partial_conv_step_on_8_device_mesh(combined):
    """Config-4 partial_depthnet train step over the mesh: the veil mask is
    derived per-shard from the sharded depth input (VERDICT r2 item 7)."""
    import jax.numpy as jnp

    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh, shard_batch, shard_replicated
    from pose_tpu.train import steps

    args = make_args(combined, 'ntu', depth_only=True, partial_conv=True)
    mesh = make_mesh(8)
    model = build_model(args, 'partial_depth')
    tx = steps.make_optimizer(args)
    state = steps.init_state(model, args, tx, (jnp.ones((1, 65, 65, 1)),))
    state = shard_replicated(mesh, state)
    step = steps.make_vanilla_train_step(model, args, 2, tx)

    rng = np.random.RandomState(2)
    depth_in = (rng.rand(8, 65, 65, 1)
                * (rng.rand(8, 65, 65, 1) > 0.4)).astype(np.float32)
    batch = shard_batch(mesh, dict(
        in_image=depth_in,
        true_cam=rng.uniform(-300, 300, (8, 17, 3)).astype(np.float32),
        true_val=np.ones((8, 17), bool)))
    state, out = step(state, batch, 1e-4)
    assert np.isfinite(float(out['cam_loss']))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_spatial_partitioning_matches_dp(combined):
    """-mesh_spatial folds the mesh to (data, space); the steps constrain
    their image inputs to P('data', 'space') so GSPMD splits H over 'space'
    (odd 65-px height = uneven shards, padded by XLA) and inserts the conv
    halo exchanges. One train step on the 2x4 spatial mesh must match pure
    DP on the 1-D mesh: same loss, same updated params."""
    import jax.numpy as jnp

    from pose_tpu.models import build_model
    from pose_tpu.parallel import (make_mesh, shard_batch, shard_replicated,
                                   spatial_sharding)
    from pose_tpu.train import steps

    args = make_args(combined, 'ntu')
    model = build_model(args)
    tx = steps.make_optimizer(args)

    rng = np.random.RandomState(0)
    host = dict(
        image=rng.rand(16, 65, 65, 3).astype(np.float32),
        true_cam=rng.uniform(-300, 300, (16, 17, 3)).astype(np.float32),
        true_val=np.ones((16, 17), bool))

    outs = {}
    try:
        for name, spatial in (('dp', 1), ('sp', 4)):
            mesh = make_mesh(8, spatial=spatial)
            steps.set_spatial_sharding(
                spatial_sharding(mesh) if spatial > 1 else None)
            # new step per mesh: the constraint binds at trace time
            step = steps.make_cam_train_step(model, args, 0, tx)
            state = shard_replicated(mesh, steps.init_state(
                model, args, tx, (jnp.zeros((1, 65, 65, 3)),)))
            batch = shard_batch(mesh, host)
            assert tuple(batch['image'].sharding.spec) == ('data',)
            state, out = step(state, batch, 1e-4)
            outs[name] = (float(out['cam_loss']), np.asarray(
                jax.tree_util.tree_leaves(state.params)[0]))
    finally:
        steps.set_spatial_sharding(None)

    loss_dp, p_dp = outs['dp']
    loss_sp, p_sp = outs['sp']
    assert abs(loss_dp - loss_sp) < 1e-5 * max(1.0, abs(loss_dp))
    assert np.max(np.abs(p_dp - p_sp)) < 1e-5


@pytest.mark.slow
def test_mesh_spatial_trainer_end_to_end(tmp_path_factory):
    """-mesh_spatial 2 through the full Trainer/Loader stack: BaseTrainer
    folds the mesh to (data, space), installs the step constraint, and a
    cam_train epoch (device-warped loader batches, mesh padding, LossMeter)
    matches the pure-DP epoch."""
    import jax.numpy as jnp

    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    from pose_tpu.data.synthetic import make_cmu_fixture
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.train.engine import RgbTrainer
    from tests.mp_worker import make_args as cluster_args

    cmu = make_cmu_fixture(str(tmp_path_factory.mktemp('cmu_sp')),
                           num_train=8, num_valid=4)
    info = build_info('cmu')
    losses = {}
    try:
        for spatial in (1, 2):
            args = cluster_args(cmu)
            args.mesh_spatial = spatial
            model = build_model(args, 'rgb')
            trainer = RgbTrainer(args, model, info)
            if spatial > 1:
                assert trainer.mesh.devices.shape == (4, 2)
                assert trainer._spatial is not None
            else:
                assert trainer._spatial is None
            trainer.init_state(
                (jnp.ones((1, args.side_in, args.side_in, 3)),))
            rec = trainer.cam_train(1, PoseLoader(args, 'train', info),
                                    args.learn_rate)
            losses[spatial] = rec['cam_train_loss']
    finally:
        steps.set_spatial_sharding(None)
    assert np.isfinite(losses[2])
    # identical data/augmentation; only the conv partitioning differs
    assert abs(losses[1] - losses[2]) < 1e-3 * max(1.0, abs(losses[1]))


def test_spatial_binding_is_per_trainer(tmp_path_factory):
    """Regression (review finding): the spatial constraint is trainer
    state, passed explicitly to the step factories — so two trainers
    sharing ONE args namespace keep their own bindings, and lazily-built
    steps (created after both trainers exist, the way the engine builds
    them at the first batch) can't pick up the other's setting. Also: a
    conflicting explicit 1-D mesh + mesh_spatial>1 must fail loudly, in
    the trainer and in the loader."""
    import jax.numpy as jnp

    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    from pose_tpu.data.synthetic import make_cmu_fixture
    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh
    from pose_tpu.train import steps
    from pose_tpu.train.engine import RgbTrainer
    from tests.mp_worker import make_args as cluster_args

    cmu = make_cmu_fixture(str(tmp_path_factory.mktemp('cmu_bind')),
                           num_train=2, num_valid=2)
    info = build_info('cmu')
    args = cluster_args(cmu)           # ONE shared namespace
    model = build_model(args, 'rgb')
    tr_sp = RgbTrainer(args, model, info, mesh=make_mesh(8, spatial=2))
    tr_dp = RgbTrainer(args, model, info)   # constructed AFTER the spatial one
    assert tr_sp._spatial is not None and tr_dp._spatial is None

    # steps built lazily, after BOTH trainers exist
    step_sp = tr_sp._get_cam_step()
    step_dp = tr_dp._get_cam_step()
    state = steps.init_state(model, args, tr_sp.tx,
                             (jnp.ones((1, 65, 65, 3)),))
    batch = dict(image=jnp.zeros((8, 65, 65, 3)),
                 true_cam=jnp.zeros((8, 19, 3)),
                 true_val=jnp.ones((8, 19), bool))

    # with_sharding_constraint lowers to sdy.sharding_constraint (Shardy)
    # or a @Sharding custom call (GSPMD), depending on the partitioner
    def n_constraints(step):
        txt = step.lower(state, batch, jnp.float32(1e-4)).as_text()
        return txt.count('sharding_constraint') + txt.count('@Sharding')

    assert n_constraints(step_sp) > 0, 'spatial trainer lost its constraint'
    assert n_constraints(step_dp) == 0, \
        'DP trainer picked up a foreign constraint'

    args_sp = cluster_args(cmu)
    args_sp.mesh_spatial = 2
    with pytest.raises(AssertionError, match='mesh_spatial'):
        RgbTrainer(args_sp, model, info, mesh=make_mesh(8))
    with pytest.raises(AssertionError, match='mesh_spatial'):
        PoseLoader(args_sp, 'train', info, mesh=make_mesh(8))


def test_members_advance_epochs_and_streams_differ(combined):
    """MixedLoader must drive each member generator to StopIteration so the
    member's own end-of-epoch bookkeeping runs: epoch 2 must reshuffle and
    redraw augmentation, not replay epoch 1 bit-for-bit (regression: the
    count-based interleave abandoned suspended generators)."""
    from depth_main import get_info
    from pose_tpu.data.mixed import build_mixed_loader

    args = make_args(combined, 'ntu', n_cudas=1)
    loader = build_mixed_loader(args, 'train', get_info(), ['ntu', 'pku'],
                                metadata_path=combined)
    first = [np.asarray(b['color']) for b in loader]
    second = [np.asarray(b['color']) for b in loader]
    assert all(ld.epoch == 2 for ld in loader.loaders), \
        [ld.epoch for ld in loader.loaders]
    assert len(first) == len(second)
    assert any(a.shape != b.shape or not np.array_equal(a, b)
               for a, b in zip(first, second))


def test_heterogeneous_mix_normalizes_rgb_key():
    """Mixing an RGB-only member with depth members must yield a uniform
    batch schema: the RGB stream's 'image' key is renamed 'color'.
    (Exercised on stub members: real cross-dataset mixes additionally
    require a shared joint set — CMU's 19 vs NTU's 17 joints cannot share
    a stream, which build_mixed_loader leaves to the dataset builder.)"""
    from pose_tpu.data.mixed import MixedLoader

    class Stub:
        def __init__(self, key, n):
            self.key, self.n, self.epoch = key, n, 0

        def __len__(self):
            return self.n

        def __iter__(self):
            for i in range(self.n):
                yield {self.key: np.zeros((2, 4, 4, 3)), 'i': i}
            self.epoch += 1

    mixed = MixedLoader([Stub('image', 3), Stub('color', 3)],
                        normalize_rgb_key=True)
    batches = list(mixed)
    assert len(batches) == 6
    assert all('color' in b and 'image' not in b for b in batches)
    assert {b['_dataset'] for b in batches} == {0, 1}
    assert all(m.epoch == 1 for m in mixed.loaders)
