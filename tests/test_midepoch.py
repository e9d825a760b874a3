"""Mid-epoch preemption-safe checkpointing (`-save_state -save_every N`):
a run killed between snapshots resumes from the last one and finishes the
epoch BIT-EQUAL to an uninterrupted run — params, optimizer state and the
epoch's loss record. Possible because the loaders draw every RNG from
(seed, epoch, batch-index) and `start_batch` fast-forwards without
decoding or consuming draws (beyond-reference: the reference resumes per
epoch only, log.py:33-40)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class Preempted(Exception):
    pass


class PreemptingLoader:
    """Yields the first `stop_after` batches of the inner loader, then
    raises — simulating a pod preemption mid-epoch. Attribute reads
    forward to the inner loader (the saver reads .epoch through this)."""

    def __init__(self, inner, stop_after):
        self.__dict__['_inner'] = inner
        self.__dict__['_stop_after'] = stop_after

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def __len__(self):
        return len(self._inner)

    def __iter__(self):
        for j, batch in enumerate(self._inner):
            if j >= self._stop_after:
                raise Preempted()
            yield batch


def make_args(metadata_path, save_path, **over):
    base = dict(
        criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
        depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4, n_epochs=1,
        do_track=False, joint_space=False, shuffle=True, geometry=True,
        colour=True, eraser=False, occluder=False, occ_path=None,
        occ_count=0, batch_size=4, data_name='cmu',
        metadata_path=metadata_path, random_zoom=0.9, n_cudas=1, workers=1,
        nexponent=False, to_depth=False, do_teach=False, attention=False,
        semi_teach=False, extra_channel=False, model='resnet18',
        depth_only=False, skip_relu=False, early_dist=False,
        alpha_init=0.5, alpha_dest=0.1, alpha_span=10,
        sigmoid=False, bin_dist=False, do_freeze=False,
        print_freq=0, save_path=save_path, suffix='mid',
        save_state=True, save_every=2,
        thresh_solid=0.4, thresh_close=0.8, thresh_rough=1.2,
        save_last=False)
    base.update(over)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope='module')
def cmu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('cmu_mid')
    return make_cmu_fixture(str(root), num_train=24, num_valid=4)


@pytest.fixture(scope='module')
def ntu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_ntu_fixture
    root = tmp_path_factory.mktemp('ntu_mid')
    return make_ntu_fixture(str(root), num_train=16, num_valid=4)


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_loader_fast_forward_is_bit_exact(cmu):
    """start_batch skips decode entirely but preserves batch indices, so
    batches k.. of a fast-forwarded epoch equal the tail of a full one."""
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader

    def batches(start):
        args = make_args(cmu, '/tmp')
        loader = PoseLoader(args, 'train', build_info('cmu'))
        loader.start_batch = start
        return [{k: np.asarray(v) for k, v in b.items()
                 if k != '_true_size'} for b in loader]

    full = batches(0)
    tail = batches(3)
    assert len(full) == 6 and len(tail) == 3
    for a, b in zip(full[3:], tail):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.fixture(scope='module')
def combined(tmp_path_factory):
    """Merged NTU+PKU metadata (the config-5 mixed stream)."""
    import json
    from pose_tpu.data.synthetic import make_ntu_fixture, make_pku_fixture
    root = tmp_path_factory.mktemp('mid_mix')
    ntu_meta = make_ntu_fixture(str(root / 'ntu'), num_train=8, num_valid=4)
    pku_meta = make_pku_fixture(str(root / 'pku'), num_train=8, num_valid=4)
    merged = json.load(open(ntu_meta))
    pku = json.load(open(pku_meta))
    for key in ('root', 'loader', 'no_depth', 'thresholds'):
        merged[key].update(pku[key])
    path = str(root / 'metadata.json')
    json.dump(merged, open(path, 'w'))
    return path


def test_mixed_loader_fast_forward_is_bit_exact(combined):
    """MixedLoader fast-forward: the which-member-per-slot draw sequence
    depends only on (seed, epoch, member lengths), so the simulated skip
    positions the interleave rng AND each member's start_batch exactly —
    batches k.. of a fast-forwarded mixed epoch equal the tail of a full
    one, including the _dataset routing tags."""
    from depth_main import get_info
    from pose_tpu.data.mixed import build_mixed_loader

    def batches(start):
        args = make_args(combined, '/tmp', data_name='ntu', num_joints=17,
                         do_teach=False, attention=False,
                         do_fusion=False, partial_conv=False)
        loader = build_mixed_loader(args, 'train', get_info(),
                                    ['ntu', 'pku'],
                                    metadata_path=combined)
        loader.start_batch = start
        out = []
        for b in loader:
            out.append(({k: np.asarray(v) for k, v in b.items()
                         if hasattr(v, 'shape')}, b['_dataset']))
        return out

    full = batches(0)
    tail = batches(2)
    assert len(full) == 4 and len(tail) == 2
    for (a, da), (b, db) in zip(full[2:], tail):
        assert da == db
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.slow
def test_rgb_preempt_resume_bit_equal(cmu, tmp_path):
    """Kill a cam-train epoch after batch 3 (snapshot cadence 2 => the last
    snapshot holds state-after-step-3), resume in a fresh trainer, and
    require the finished epoch to match an uninterrupted one bit-for-bit:
    params, Adam moments, BN stats, step counter, and the train record."""
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    from pose_tpu.models import PoseResNet
    from pose_tpu.train.engine import RgbTrainer

    info = build_info('cmu')

    def fresh(save_path):
        args = make_args(cmu, save_path)
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1),
                           variant='rgb', in_channels=3, stride=32,
                           num_joints=19, depth=4)
        trainer = RgbTrainer(args, model, info)
        trainer.init_state((jnp.ones((1, 65, 65, 3)),))
        return args, trainer

    # uninterrupted reference run (its own sidecar dir)
    args_a, trainer_a = fresh(str(tmp_path / 'A'))
    rec_a = trainer_a.cam_train(1, PoseLoader(args_a, 'train', info),
                                args_a.learn_rate)

    # interrupted run: preempted after 4 of 6 batches
    args_b, trainer_b = fresh(str(tmp_path / 'BC'))
    with pytest.raises(Preempted):
        trainer_b.cam_train(
            1, PreemptingLoader(PoseLoader(args_b, 'train', info), 4),
            args_b.learn_rate)

    # resumed run: fresh process state, same sidecar dir
    args_c, trainer_c = fresh(str(tmp_path / 'BC'))
    trainer_c._mid_resume_pending = True
    rec_c = trainer_c.cam_train(1, PoseLoader(args_c, 'train', info),
                                args_c.learn_rate)

    _leaves_equal(trainer_a.state, trainer_c.state)
    assert rec_a == rec_c


@pytest.mark.slow
def test_cli_save_every_plumbing(cmu, tmp_path):
    """main.py flag plumbing: -save_state -save_every N writes mid-epoch
    snapshots during the epoch and CLEARS them once the epoch completes
    and is recorded (a stale snapshot must never hijack the next resume);
    the per-epoch sidecar and torch checkpoint still land."""
    import os
    import subprocess
    import sys

    save = str(tmp_path / 'save')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    flags = ['-suffix', 'mid', '-criterion', 'SmoothL1', '-batch_size', '4',
             '-side_in', '65', '-stride', '32', '-depth', '4',
             '-n_epochs', '1', '-n_cudas', '1', '-learn_rate', '1e-4',
             '-model', 'resnet18', '-data_name', 'cmu', '-num_joints', '19',
             '-metadata_path', cmu, '-save_path', save,
             '-shuffle', '-save_record', '-save_state', '-save_every', '2']
    r = subprocess.run([sys.executable, 'main.py'] + flags,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))),
                       capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    run_dir = os.path.join(save, 'resnet18-mid')
    assert os.path.isdir(os.path.join(run_dir, 'orbax'))
    assert os.path.exists(os.path.join(run_dir, 'model_1.pth'))
    # epoch completed and was recorded => mid-epoch snapshots cleared
    assert not os.path.isdir(os.path.join(run_dir, 'orbax', 'mid'))


@pytest.mark.slow
def test_distill_semi_preempt_resume_bit_equal(ntu, tmp_path):
    """The heaviest continuation record: distillation with a semi stream —
    the teacher's drifting BN stats and the semi loader's (cycle, offset)
    position must all freeze and thaw exactly."""
    from depth_main import get_info
    from pose_tpu.data.loader import DepthPoseLoader
    from pose_tpu.models import PoseResNet
    from pose_tpu.train.depth_engine import DepthTrainer

    info = get_info()

    def tiny_depth():
        # (1,1,1,1): the saver machinery is model-agnostic and the
        # resnet18 twin roughly doubles this test's CPU compiles
        return PoseResNet(block='basic', layers=(1, 1, 1, 1),
                          variant='depth', in_channels=3, stride=32,
                          num_joints=17, depth=4)

    def fresh(save_path):
        args = make_args(
            ntu, save_path, data_name='ntu', num_joints=17, do_teach=True,
            attention=True, semi_teach=True, warmup=1, warmup_factor=0.2,
            learn_decay=0.2, do_fusion=False, partial_conv=False)
        student = tiny_depth()
        teacher = tiny_depth()
        trainer = DepthTrainer(args, student, info)
        trainer.init_state((jnp.ones((1, 65, 65, 3)),))
        t_raw = teacher.init(jax.random.PRNGKey(11),
                             jnp.ones((1, 65, 65, 3)), train=False)
        trainer.set_teacher(teacher, dict(params=t_raw['params'],
                                          batch_stats=t_raw['batch_stats']))
        # a 3-batch semi stream under a 4-batch main epoch: the cycle wraps
        # mid-epoch, so the saved position exercises both fields
        semi_args = make_args(ntu, save_path, data_name='ntu',
                              num_joints=17, batch_size=6, do_teach=True,
                              attention=True, do_fusion=False,
                              partial_conv=False)
        trainer.set_semi_loader(
            DepthPoseLoader(semi_args, 'train', info, seed=5))
        return args, trainer

    from pose_tpu.train import schedules
    args_a, trainer_a = fresh(str(tmp_path / 'A'))
    lr = schedules.depth_learn_rate(args_a, 1)
    rec_a = trainer_a.distill_train(
        1, DepthPoseLoader(args_a, 'train', info), lr)
    semi_pos_a = trainer_a._get_semi_pos()

    args_b, trainer_b = fresh(str(tmp_path / 'BC'))
    with pytest.raises(Preempted):
        trainer_b.distill_train(
            1, PreemptingLoader(DepthPoseLoader(args_b, 'train', info), 3),
            lr)

    args_c, trainer_c = fresh(str(tmp_path / 'BC'))
    trainer_c._mid_resume_pending = True
    rec_c = trainer_c.distill_train(
        1, DepthPoseLoader(args_c, 'train', info), lr)

    _leaves_equal(trainer_a.state, trainer_c.state)
    _leaves_equal(trainer_a.teacher_vars, trainer_c.teacher_vars)
    assert semi_pos_a == trainer_c._get_semi_pos()
    assert rec_a == rec_c
