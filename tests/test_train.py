"""Training-engine unit tests: losses vs torch goldens, LR schedules and
alpha annealing vs the reference formulas, distillation loss, optimizer
parity, loader behavior on fixtures."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_tpu.train import losses, schedules, steps

torch = pytest.importorskip('torch')


def make_args(**over):
    base = dict(criterion='SmoothL1', half_acc=False, depth=4, num_joints=5,
                depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
                weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4,
                n_epochs=20, do_track=False, warmup=1, warmup_factor=0.2,
                learn_decay=0.2, alpha_init=0.5, alpha_dest=0.1,
                alpha_span=10, sigmoid=False, bin_dist=False, do_freeze=False,
                depth_only=False, joint_space=False, semi_teach=False)
    base.update(over)
    return types.SimpleNamespace(**base)


class TestLosses:
    @pytest.mark.parametrize('name,torch_cls', [
        ('SmoothL1', torch.nn.SmoothL1Loss),
        ('MSE', torch.nn.MSELoss),
        ('L1', torch.nn.L1Loss)])
    def test_vs_torch(self, name, torch_cls):
        rng = np.random.RandomState(0)
        pred = rng.randn(4, 5, 3).astype(np.float32) * 2
        target = rng.randn(4, 5, 3).astype(np.float32)
        valid = rng.rand(4, 5) > 0.3

        crit = losses.get_criterion(name)
        ours = float(losses.masked_mean_loss(
            crit, jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid)))

        tp = torch.from_numpy(pred).view(-1, 3)[torch.from_numpy(valid).view(-1)]
        tt = torch.from_numpy(target).view(-1, 3)[torch.from_numpy(valid).view(-1)]
        golden = float(torch_cls(reduction='mean')(tp, tt))
        assert abs(ours - golden) < 1e-5

    def test_bce_with_logits_vs_torch(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(8, 8).astype(np.float32) * 3
        target = rng.rand(8, 8).astype(np.float32)
        ours = np.asarray(losses.bce_with_logits(jnp.asarray(logits),
                                                 jnp.asarray(target)))
        golden = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(target),
            reduction='none').numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-5)


class TestSchedules:
    def test_rgb_learn_rate_reference_formula(self):
        args = make_args(n_epochs=20, learn_rate=1e-4)
        # train.py:380-392: 1 / 0.2 / 0.04 at 60% / 90%
        assert schedules.rgb_learn_rate(args, 1) == 1e-4
        assert schedules.rgb_learn_rate(args, 12) == 1e-4
        assert schedules.rgb_learn_rate(args, 13) == pytest.approx(2e-5)
        assert schedules.rgb_learn_rate(args, 18) == pytest.approx(2e-5)
        assert schedules.rgb_learn_rate(args, 19) == pytest.approx(4e-6)
        args.do_track = True
        assert schedules.rgb_learn_rate(args, 1) == 1e-4      # epoch 1 unhalved
        assert schedules.rgb_learn_rate(args, 2) == pytest.approx(5e-5)

    def test_depth_learn_rate_reference_formula(self):
        args = make_args(learn_rate=1e-4, warmup=1, warmup_factor=0.2,
                         learn_decay=0.2)
        # depth_train.py:621-638
        assert schedules.depth_learn_rate(args, 1) == pytest.approx(2e-5)
        assert schedules.depth_learn_rate(args, 2) == 1e-4
        assert schedules.depth_learn_rate(args, 15) == 1e-4
        assert schedules.depth_learn_rate(args, 16) == pytest.approx(2e-5)
        assert schedules.depth_learn_rate(args, 21) == pytest.approx(4e-6)
        assert schedules.depth_learn_rate(args, 26) == pytest.approx(8e-7)

    def test_alpha_annealing(self):
        args = make_args(alpha_init=0.5, alpha_dest=0.1, alpha_span=10)
        # depth_train.py:641-647
        assert schedules.dist_weight(args, 1) == pytest.approx(0.5)
        assert schedules.dist_weight(args, 10) == pytest.approx(0.1)
        assert schedules.dist_weight(args, 11) == pytest.approx(0.1)
        mid = schedules.dist_weight(args, 5)
        assert 0.1 < mid < 0.5


class TestDistillLoss:
    def _torch_distill(self, args, teach, feat, atten):
        import torch.nn.functional as F
        t = torch.from_numpy(teach.transpose(0, 3, 1, 2))
        s = torch.from_numpy(feat.transpose(0, 3, 1, 2))
        a = torch.from_numpy(atten.transpose(0, 3, 1, 2))
        batch = t.shape[0]
        if args.bin_dist:
            diff = F.binary_cross_entropy_with_logits(s, torch.sigmoid(t))
            diff = torch.mul(diff, a)
            return float(torch.sum(diff.reshape(batch, -1), dim=-1).mean())
        diff = ((torch.sigmoid(t) - torch.sigmoid(s)) if args.sigmoid
                else (t - s))
        diff = torch.mul(diff, a)
        return float(torch.linalg.norm(diff.reshape(batch, -1), dim=-1).mean())

    @pytest.mark.parametrize('sigmoid,bin_dist', [
        (False, False), (True, False), (False, True)])
    def test_vs_torch(self, sigmoid, bin_dist):
        args = make_args(sigmoid=sigmoid, bin_dist=bin_dist)
        rng = np.random.RandomState(0)
        teach = rng.randn(2, 5, 5, 16).astype(np.float32)
        feat = rng.randn(2, 5, 5, 16).astype(np.float32)
        atten = rng.rand(2, 5, 5, 1).astype(np.float32)

        ours = float(steps.distill_loss(args, jnp.asarray(teach),
                                        jnp.asarray(feat),
                                        jnp.asarray(atten)))
        golden = self._torch_distill(args, teach, feat, atten)
        assert ours == pytest.approx(golden, rel=1e-4)

    def test_zero_diff_subgradient_matches_torch(self):
        """student features == teacher features — the step-1 state whenever
        the student is warm-started FROM the teacher checkpoint (a supported
        create_pair pattern, depth_main.py). torch.norm's backward defines a
        ZERO subgradient at 0; a plain jnp.linalg.norm would emit NaN there
        and poison the whole parameter update (found by a warm-started
        convergence-twin run: the JAX side NaN'd on step 1)."""
        args = make_args(sigmoid=False, bin_dist=False)
        rng = np.random.RandomState(1)
        feat = rng.randn(2, 5, 5, 16).astype(np.float32)
        atten = rng.rand(2, 5, 5, 1).astype(np.float32)

        val, grad = jax.value_and_grad(
            lambda f: steps.distill_loss(args, jnp.asarray(feat), f,
                                         jnp.asarray(atten)))(
            jnp.asarray(feat))
        assert float(val) == 0.0
        assert np.all(np.asarray(grad) == 0.0), np.max(np.abs(grad))

        s = torch.from_numpy(feat.transpose(0, 3, 1, 2)).requires_grad_()
        t = torch.from_numpy(feat.transpose(0, 3, 1, 2))
        a = torch.from_numpy(atten.transpose(0, 3, 1, 2))
        loss = torch.linalg.norm(
            ((t - s) * a).reshape(2, -1), dim=-1).mean()
        loss.backward()
        assert float(loss) == 0.0
        assert torch.all(s.grad == 0.0)        # torch's subgradient is 0 too


class TestOptimizerParity:
    def test_adam_matches_torch_with_weight_decay(self):
        """torch Adam applies weight decay to the grad BEFORE moments
        (train.py:28-30); verify our chain reproduces a few steps."""
        rng = np.random.RandomState(0)
        w0 = rng.randn(6, 4).astype(np.float32)
        grads = [rng.randn(6, 4).astype(np.float32) for _ in range(4)]
        lr, wd = 1e-3, 1e-2

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
        for g in grads:
            opt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            opt.step()

        import optax
        tx = optax.chain(optax.add_decayed_weights(wd),
                         optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        params = jnp.asarray(w0)
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update(jnp.asarray(g), state, params)
            params = params - lr * updates

        np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                                   atol=1e-5)

    def test_global_norm_clip_matches_torch(self):
        rng = np.random.RandomState(1)
        g1 = rng.randn(5, 5).astype(np.float32) * 10
        g2 = rng.randn(3).astype(np.float32) * 10
        max_norm = 5.0

        t1 = torch.from_numpy(g1.copy())
        t2 = torch.from_numpy(g2.copy())
        p1 = torch.nn.Parameter(torch.zeros(5, 5)); p1.grad = t1
        p2 = torch.nn.Parameter(torch.zeros(3)); p2.grad = t2
        torch.nn.utils.clip_grad_norm_([p1, p2], max_norm)

        import optax
        tx = optax.clip_by_global_norm(max_norm)
        clipped, _ = tx.update({'a': jnp.asarray(g1), 'b': jnp.asarray(g2)},
                               tx.init(None))
        np.testing.assert_allclose(np.asarray(clipped['a']),
                                   p1.grad.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(clipped['b']),
                                   p2.grad.numpy(), rtol=1e-5)


class TestLoaderFixture:
    @pytest.fixture(scope='class')
    def cmu(self, tmp_path_factory):
        from pose_tpu.data.synthetic import make_cmu_fixture
        root = tmp_path_factory.mktemp('cmu_l')
        return make_cmu_fixture(str(root), num_train=6, num_valid=4)

    def test_loader_batches(self, cmu):
        from datasets import get_data_loader
        args = make_args(shuffle=True, geometry=True, colour=True,
                         eraser=False, occluder=False, batch_size=3,
                         num_joints=19, data_name='cmu', metadata_path=cmu,
                         random_zoom=0.9, n_cudas=1, workers=1, occ_path=None,
                         nexponent=False, to_depth=False, do_teach=False,
                         attention=False)
        loader, data_info = get_data_loader(args, 'train')
        assert len(loader) == 2
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b['image'].shape == (3, 65, 65, 3)
        assert b['true_cam'].shape == (3, 19, 3)
        assert b['true_val'].shape == (3, 19)
        assert np.all(np.isfinite(np.asarray(b['image'])))

    def test_eval_loader_has_back_rotation(self, cmu):
        from datasets import get_data_loader
        args = make_args(shuffle=False, geometry=False, colour=False,
                         eraser=False, occluder=False, batch_size=4,
                         num_joints=19, data_name='cmu', metadata_path=cmu,
                         random_zoom=0.9, n_cudas=1, workers=1, occ_path=None,
                         nexponent=False, to_depth=False, do_teach=False,
                         attention=False)
        loader, _ = get_data_loader(args, 'valid')
        batch = next(iter(loader))
        assert 'back_rotation' in batch
        assert batch['back_rotation'].shape == (4, 3, 3)
        # back_rotation must be orthonormal (product of rotations)
        br = batch['back_rotation'][0]
        np.testing.assert_allclose(br @ br.T, np.eye(3), atol=1e-4)

    def test_determinism_same_epoch(self, cmu):
        from datasets import get_data_loader
        args = make_args(shuffle=False, geometry=True, colour=True,
                         eraser=False, occluder=False, batch_size=3,
                         num_joints=19, data_name='cmu', metadata_path=cmu,
                         random_zoom=0.9, n_cudas=1, workers=1, occ_path=None,
                         nexponent=False, to_depth=False, do_teach=False,
                         attention=False)
        loader, _ = get_data_loader(args, 'train')
        first = next(iter(loader))
        loader.set_epoch(loader.epoch - 1 if loader.epoch else 0)
        loader2, _ = get_data_loader(args, 'train')
        second = next(iter(loader2))
        np.testing.assert_allclose(np.asarray(first['image']),
                                   np.asarray(second['image']))


class TestJointTestDoTrack:
    """The -do_track DETER eval path (reference train.py:268-301 printing,
    utils.py:296-332 get_deter_cam): the root reconstruction runs on device,
    dispatched alongside the pipelined eval step (engine._overlap), and the
    mesh-padding rows (the loader duplicates the last real row, so padding
    just re-solves a real sample) are sliced off after the fetch."""

    @pytest.fixture(scope='class')
    def cmu(self, tmp_path_factory):
        from pose_tpu.data.synthetic import make_cmu_fixture
        root = tmp_path_factory.mktemp('cmu_track')
        return make_cmu_fixture(str(root), num_train=6, num_valid=6)

    def test_deter_metrics_and_spec_invariance(self, cmu):
        from datasets import build_info
        from pose_tpu.data.loader import PoseLoader
        from pose_tpu.models import build_model
        from pose_tpu.train.engine import RgbTrainer
        from tests.mp_worker import make_args as cluster_args

        args = cluster_args(cmu)
        args.joint_space = True
        args.do_track = True
        # 6 valid samples into batch_size 8 on the 8-device mesh: the last
        # batch carries 2 padded rows straight through the device-side
        # reconstruction solve
        info = build_info('cmu')
        model = build_model(args, 'rgb')
        trainer = RgbTrainer(args, model, info)
        trainer.init_state((jnp.ones((1, args.side_in, args.side_in, 3)),))

        rec_track = trainer.joint_test(1, PoseLoader(args, 'valid', info))
        for key in ('recon_cam_mean', 'recon_score_pck', 'recon_score_auc'):
            assert key in rec_track and np.isfinite(rec_track[key]), key
        assert rec_track['recon_cam_mean'] > 0

        # the pipelined loop must be deterministic and ordered
        rec_again = trainer.joint_test(1, PoseLoader(args, 'valid', info))
        assert rec_again == rec_track

        # DETER is additive-only: every non-recon metric is unchanged
        args.do_track = False
        rec_plain = trainer.joint_test(1, PoseLoader(args, 'valid', info))
        assert not any(k.startswith('recon_') for k in rec_plain)
        for key in rec_plain:
            assert rec_plain[key] == rec_track[key], key


class TestDistillTeacherBN:
    """Teacher BN semantics in distillation (depth_train.py:156-158): without
    -do_freeze the torch teacher stays in train mode under no_grad, so it
    normalizes with *batch* statistics and its running stats drift; with
    -do_freeze both networks run eval-mode BN and nothing drifts."""

    def _setup(self, do_freeze):
        from pose_tpu.models.resnet import PoseResNet

        args = make_args(depth=2, num_joints=3, depth_range=100.0, stride=32,
                         do_freeze=do_freeze)
        model = PoseResNet(block='basic', layers=(1, 1, 1, 1), variant='depth',
                           in_channels=3, stride=32, num_joints=3, depth=2)
        teacher = model
        tx = steps.make_optimizer(args)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        state = steps.init_state(model, args, tx, (x,), rng)
        t_vars_raw = teacher.init(jax.random.PRNGKey(1), x, train=False)
        teacher_vars = dict(params=t_vars_raw['params'],
                            batch_stats=t_vars_raw['batch_stats'])

        key = jax.random.PRNGKey(2)
        batch = dict(
            color=jax.random.normal(key, (2, 32, 32, 3)),
            true_cam=jnp.zeros((2, 3, 3)),
            true_val=jnp.ones((2, 3)),
            atten_map=jnp.ones((2, 1, 1, 1)))
        step = steps.make_distill_train_step(
            model, teacher, args, key_index=0, tx=tx,
            teacher_is_fusion=False, with_semi=False)
        return args, model, teacher, state, teacher_vars, batch, step

    def _manual_dist_loss(self, args, model, teacher, state, teacher_vars,
                          batch, train_mode):
        t_out = teacher.apply(
            {'params': teacher_vars['params'],
             'batch_stats': teacher_vars['batch_stats']},
            batch['color'], train=train_mode,
            mutable=['batch_stats'] if train_mode else False)
        (_, teach_last) = t_out[0] if train_mode else t_out
        s_out, _ = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            batch['color'], train=not args.do_freeze,
            mutable=['batch_stats'])
        (_, last_feat) = s_out
        if args.do_freeze:
            (_, last_feat) = model.apply(
                {'params': state.params, 'batch_stats': state.batch_stats},
                batch['color'], train=False)
        return float(steps.distill_loss(args, teach_last, last_feat,
                                        batch['atten_map']))

    def test_teacher_uses_batch_stats_and_drifts(self):
        (args, model, teacher, state, teacher_vars, batch,
         step) = self._setup(do_freeze=False)
        want = self._manual_dist_loss(args, model, teacher, state,
                                      teacher_vars, batch, train_mode=True)
        not_want = self._manual_dist_loss(args, model, teacher, state,
                                          teacher_vars, batch,
                                          train_mode=False)
        old_stats = jax.tree_util.tree_map(np.asarray,
                                           teacher_vars['batch_stats'])
        _, new_teacher_vars, out = step(state, teacher_vars, batch,
                                        jnp.float32(1e-4), jnp.float32(0.5))
        got = float(out['dist_loss'])
        assert got == pytest.approx(want, rel=1e-4)
        assert got != pytest.approx(not_want, rel=1e-4)
        # running stats drifted with momentum 0.9 toward the batch stats
        drift = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            new_teacher_vars['batch_stats'], old_stats)
        assert max(jax.tree_util.tree_leaves(drift)) > 1e-4

    def test_do_freeze_keeps_teacher_eval_and_static(self):
        (args, model, teacher, state, teacher_vars, batch,
         step) = self._setup(do_freeze=True)
        want = self._manual_dist_loss(args, model, teacher, state,
                                      teacher_vars, batch, train_mode=False)
        old_stats = jax.tree_util.tree_map(np.asarray,
                                           teacher_vars['batch_stats'])
        _, new_teacher_vars, out = step(state, teacher_vars, batch,
                                        jnp.float32(1e-4), jnp.float32(0.5))
        assert float(out['dist_loss']) == pytest.approx(want, rel=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            new_teacher_vars['batch_stats'], old_stats)


class TestHalfAcc:
    def test_bf16_step_trains_and_grad_scaling_is_inert(self):
        """The fp16 master-copy divergence pinned behaviorally (SURVEY.md §7
        item 5; steps.py docstring): `-half_acc` runs the step in bf16 —
        finite loss, parameters actually move — and `-grad_scaling` is
        accepted-and-ignored (bf16 needs no loss scaling, so two values of
        the flag produce the identical trajectory; the reference scales the
        loss and un-scales fp32 master grads, depth_train.py:233-269)."""
        results = []
        for grad_scaling in (1.0, 512.0):
            args = make_args(half_acc=True, grad_scaling=grad_scaling,
                             extra_channel=False, skip_relu=False,
                             early_dist=False, batch_size=2)
            from pose_tpu.models import PoseResNet
            model = PoseResNet(block='basic', layers=(1, 1, 1, 1),
                               variant='rgb', in_channels=3, stride=32,
                               num_joints=5, depth=4)
            tx = steps.make_optimizer(args)
            state = steps.init_state(model, args, tx,
                                     (jnp.ones((1, 65, 65, 3)),))
            step = steps.make_cam_train_step(model, args, 2, tx)
            rng = np.random.RandomState(3)
            batch = dict(
                image=jnp.asarray(rng.randn(2, 65, 65, 3).astype(np.float32)),
                true_cam=jnp.asarray(rng.uniform(
                    -300, 300, (2, 5, 3)).astype(np.float32) + 2500),
                true_val=jnp.ones((2, 5), bool))
            p0 = jax.device_get(state.params)
            losses_seen = []
            for _ in range(3):
                state, out = step(state, batch, 1e-4)
                losses_seen.append(float(out['cam_loss']))
            p1 = jax.device_get(state.params)
            assert np.isfinite(losses_seen).all(), losses_seen
            moved = jax.tree_util.tree_reduce(
                lambda acc, ab: acc + float(np.abs(ab).sum()),
                jax.tree_util.tree_map(lambda a, b: a - b, p0, p1), 0.0)
            assert moved > 0.0
            results.append((losses_seen, p1))
        # grad_scaling changed nothing: identical losses and parameters
        assert results[0][0] == results[1][0]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), results[0][1], results[1][1])


@pytest.mark.slow
class TestConvergence:
    def test_cam_step_overfits_fixed_batch(self):
        """System-level learning evidence: Adam on one fixed batch
        must steadily overfit (110 steps of Adam at
        5e-4; final loss well under half the initial). Exercises the full
        forward/decode/loss/backward/update loop end-to-end — a wiring bug
        anywhere (stale batch_stats, wrong gradient sign, decode offset)
        shows up as a flat or rising curve."""
        from pose_tpu.serve import default_args
        from pose_tpu.models import build_model

        args = default_args(model='resnet18', side_in=65, stride=32,
                            depth=4, num_joints=5, half_acc=False,
                            joint_space=False, criterion='SmoothL1',
                            grad_norm=5.0, weight_decay=4e-5, loss_div=10.0)
        model = build_model(args, 'rgb')
        tx = steps.make_optimizer(args)
        state = steps.init_state(model, args, tx,
                                 (jnp.ones((1, 65, 65, 3)),))
        step = steps.make_cam_train_step(model, args, 2, tx)

        rng = np.random.RandomState(0)
        batch = dict(
            image=jnp.asarray(rng.randn(4, 65, 65, 3).astype(np.float32)),
            true_cam=jnp.asarray(
                rng.uniform(-300, 300, (4, 5, 3)).astype(np.float32) + 2500),
            true_val=jnp.ones((4, 5), bool))

        history = []
        for i in range(110):
            state, out = step(state, batch, 5e-4)
            history.append(float(out['cam_loss']))
        assert np.isfinite(history).all()
        # steady decline: each third of the run must improve on the last,
        # and the end must sit well under half of the start (measured run:
        # 150 -> 55 on this seed)
        thirds = [np.mean(history[i:i + 36]) for i in (0, 37, 74)]
        assert thirds[0] > thirds[1] > thirds[2], thirds
        assert history[-1] < 0.45 * history[0], history[::10]


@pytest.mark.slow
class TestDistillConvergence:
    def test_student_descends_both_objectives(self):
        """The privileged-information core must LEARN end-to-end: 80 Adam
        steps of frozen-teacher distillation on one fixed batch must reduce
        both the pose loss and the feature-distillation loss."""
        from pose_tpu.serve import default_args
        from pose_tpu.models import build_model

        args = default_args(model='resnet18', side_in=65, stride=32,
                            depth=4, num_joints=5, half_acc=False,
                            joint_space=False, criterion='SmoothL1',
                            grad_norm=5.0, weight_decay=4e-5, loss_div=10.0,
                            sigmoid=False, bin_dist=False, do_freeze=True,
                            depth_only=False)
        model = build_model(args, 'depth')
        teacher = build_model(args, 'depth')
        tx = steps.make_optimizer(args)
        state = steps.init_state(model, args, tx,
                                 (jnp.ones((1, 65, 65, 3)),))
        t_vars = jax.device_get(teacher.init(
            jax.random.PRNGKey(7), jnp.ones((1, 65, 65, 3)), train=False))
        t_vars = dict(params=t_vars['params'],
                      batch_stats=t_vars['batch_stats'])
        step = steps.make_distill_train_step(
            model, teacher, args, 2, tx, teacher_is_fusion=False,
            with_semi=False)

        rng = np.random.RandomState(0)
        batch = dict(
            color=jnp.asarray(rng.randn(4, 65, 65, 3).astype(np.float32)),
            true_cam=jnp.asarray(
                rng.uniform(-300, 300, (4, 5, 3)).astype(np.float32) + 2500),
            true_val=jnp.ones((4, 5), bool),
            atten_map=jnp.ones((4, 3, 3, 1), jnp.float32))

        cam_hist, dist_hist = [], []
        for i in range(80):
            state, t_vars, out = step(state, t_vars, batch,
                                      jnp.float32(5e-4), jnp.float32(0.5))
            cam_hist.append(float(out['cam_loss']))
            dist_hist.append(float(out['dist_loss']))
        assert np.isfinite(cam_hist).all() and np.isfinite(dist_hist).all()
        assert np.mean(cam_hist[-10:]) < 0.6 * np.mean(cam_hist[:10]), \
            cam_hist[::16]
        assert np.mean(dist_hist[-10:]) < 0.7 * np.mean(dist_hist[:10]), \
            dist_hist[::16]

    def test_warm_start_from_teacher_stays_finite(self):
        """Distill steps with the student warm-started AT the teacher (exact
        same params/stats) must stay finite: the dist term starts at exactly
        0 where the norm's subgradient matters (see
        TestDistillLoss.test_zero_diff_subgradient_matches_torch)."""
        from pose_tpu.serve import default_args
        from pose_tpu.models import build_model

        args = default_args(model='resnet18', side_in=65, stride=32,
                            depth=4, num_joints=5, half_acc=False,
                            joint_space=False, criterion='SmoothL1',
                            grad_norm=5.0, weight_decay=4e-5, loss_div=10.0,
                            sigmoid=False, bin_dist=False, do_freeze=False,
                            depth_only=False)
        model = build_model(args, 'depth')
        teacher = build_model(args, 'depth')
        tx = steps.make_optimizer(args)
        state = steps.init_state(model, args, tx,
                                 (jnp.ones((1, 65, 65, 3)),))
        t_vars = dict(params=jax.device_get(state.params),
                      batch_stats=jax.device_get(state.batch_stats))
        step = steps.make_distill_train_step(
            model, teacher, args, 2, tx, teacher_is_fusion=False,
            with_semi=False)
        rng = np.random.RandomState(0)
        batch = dict(
            color=jnp.asarray(rng.randn(2, 65, 65, 3).astype(np.float32)),
            true_cam=jnp.asarray(
                rng.uniform(-300, 300, (2, 5, 3)).astype(np.float32) + 2500),
            true_val=jnp.ones((2, 5), bool),
            atten_map=jnp.ones((2, 3, 3, 1), jnp.float32))
        for i in range(3):
            state, t_vars, out = step(state, t_vars, batch,
                                      jnp.float32(2e-5), jnp.float32(0.5))
            assert np.isfinite(float(out['cam_loss'])), i
            assert np.isfinite(float(out['dist_loss'])), i
        finite = jax.tree_util.tree_map(
            lambda a: bool(jnp.all(jnp.isfinite(a))), state.params)
        assert all(jax.tree_util.tree_leaves(finite))
