"""End-to-end CLI tests on synthetic fixture datasets: the run_test.sh-style
acceptance surface (SURVEY.md §4) — train an epoch via the reference CLI,
then reload the checkpoint with -val_only and require identical metrics."""

import os
import re
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, flags, cwd=REPO, devices=1):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    if devices > 1:
        env['XLA_FLAGS'] = (
            '--xla_force_host_platform_device_count=%d' % devices)
    # the axon TPU plugin registers from sitecustomize when this var is set
    # and force-selects the tunnel backend; strip it so the subprocess stays
    # on host CPU
    env.pop('PALLAS_AXON_POOL_IPS', None)
    result = subprocess.run([sys.executable, script] + flags, cwd=cwd,
                            capture_output=True, text=True, env=env,
                            timeout=900)
    assert result.returncode == 0, result.stdout + result.stderr
    return result.stdout


@pytest.fixture(scope='module')
def cmu_fixture(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('cmu')
    return make_cmu_fixture(str(root), num_train=8, num_valid=4)


@pytest.fixture(scope='module')
def ntu_fixture(tmp_path_factory):
    from pose_tpu.data.synthetic import make_ntu_fixture
    root = tmp_path_factory.mktemp('ntu')
    return make_ntu_fixture(str(root), num_train=8, num_valid=4)


BASE = ['-suffix', 'e2e', '-criterion', 'SmoothL1', '-batch_size', '4',
        '-side_in', '65', '-stride', '32', '-depth', '4', '-n_epochs', '1',
        '-n_cudas', '1', '-learn_rate', '1e-4', '-model', 'resnet18']


def _spec_line(stdout):
    m = re.findall(r'=>\[SPEC\] cam_mean: ([\d.]+)\s+\[pck\]: ([\d.]+)'
                   r'\s+\[auc\]: ([\d.]+)', stdout)
    assert m, stdout
    return m[-1]


def test_main_train_and_val_roundtrip(cmu_fixture, tmp_path):
    save = str(tmp_path / 'save')
    flags = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                    '-metadata_path', cmu_fixture, '-save_path', save,
                    '-shuffle', '-save_record', '-geometry', '-colour']
    out = run_cli('main.py', flags)
    trained = _spec_line(out)
    assert os.path.exists(os.path.join(save, 'resnet18-e2e', 'model_1.pth'))
    assert os.path.exists(os.path.join(save, 'resnet18-e2e', 'best.pth'))

    val_flags = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                        '-metadata_path', cmu_fixture, '-save_path', save,
                        '-val_only']
    out = run_cli('main.py', val_flags)
    assert _spec_line(out) == trained  # checkpoint roundtrip is exact


def test_main_test_only(cmu_fixture, tmp_path):
    """-test_only evaluates the TEST split from best.pth and exits
    (reference main.py:24-68 + train.py:205): the SPEC line parses and —
    the fixture's test and valid splits being different samples — differs
    from the valid-split metrics of the same checkpoint."""
    save = str(tmp_path / 'save')
    flags = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                    '-metadata_path', cmu_fixture, '-save_path', save,
                    '-shuffle', '-save_record', '-geometry', '-colour']
    run_cli('main.py', flags)

    common = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                     '-metadata_path', cmu_fixture, '-save_path', save]
    val = _spec_line(run_cli('main.py', common + ['-val_only']))
    test = _spec_line(run_cli('main.py', common + ['-test_only']))
    assert test != val


def test_main_mesh_spatial(cmu_fixture, tmp_path):
    """-mesh_spatial through the CLI acceptance surface: a (2, 2)
    (data, space) mesh on 4 virtual devices trains and evals an epoch;
    the checkpoint reloads with -val_only on the same spatial mesh to the
    identical SPEC line (metric roundtrip, CLAUDE.md acceptance rule)."""
    save = str(tmp_path / 'save')
    sp = ['-n_cudas', '4', '-mesh_spatial', '2']
    flags = BASE + sp + ['-data_name', 'cmu', '-num_joints', '19',
                         '-metadata_path', cmu_fixture, '-save_path', save,
                         '-shuffle', '-save_record', '-geometry', '-colour']
    # BASE pins -n_cudas 1; the later duplicate flag wins in argparse
    out = run_cli('main.py', flags, devices=4)
    trained = _spec_line(out)

    val_flags = BASE + sp + ['-data_name', 'cmu', '-num_joints', '19',
                             '-metadata_path', cmu_fixture,
                             '-save_path', save, '-val_only']
    out = run_cli('main.py', val_flags, devices=4)
    assert _spec_line(out) == trained


def test_depth_main_vanilla(ntu_fixture, tmp_path):
    save = str(tmp_path / 'save')
    flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                    '-metadata_path', ntu_fixture, '-save_path', save,
                    '-shuffle', '-save_record', '-depth_only']
    out = run_cli('depth_main.py', flags)
    _spec_line(out)
    assert 'Cam Loss' in out


def test_main_imagenet_pretrain_with_extra_channel(cmu_fixture, tmp_path):
    """The cmu_train.sh warm-start path: a torchvision-style ImageNet
    state_dict (incl. fc.* keys) loads with the extra-channel conv1 surgery
    through the CLI (resnet.py:213-236 semantics)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pose_tpu.models import PoseResNet
    from pose_tpu.models.convert import (save_torch_file,
                                         variables_to_torch_state)

    m = PoseResNet(block='basic', layers=(2, 2, 2, 2), variant='rgb',
                   in_channels=3, stride=32, num_joints=19, depth=4)
    v = m.init(jax.random.PRNGKey(42), jnp.ones((1, 65, 65, 3)), train=False)
    state = variables_to_torch_state(jax.device_get(v))
    state = {k: val for k, val in state.items()
             if not k.startswith(('cam_regressor', 'mat_regressor'))}
    rng = np.random.RandomState(0)
    state['fc.weight'] = rng.randn(1000, 512).astype(np.float32)
    state['fc.bias'] = rng.randn(1000).astype(np.float32)
    ckpt = str(tmp_path / 'imagenet_resnet18.pth')
    save_torch_file(state, ckpt)

    save = str(tmp_path / 'save')
    flags = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                    '-metadata_path', cmu_fixture, '-save_path', save,
                    '-shuffle', '-save_record', '-pretrain',
                    '-extra_channel', '-model_path', ckpt]
    out = run_cli('main.py', flags)
    assert 'key [ fc.weight ] deleted' in out
    _spec_line(out)


def test_depth_main_distill(ntu_fixture, tmp_path):
    """The -do_teach path (depth_train.py:161-283): train a vanilla depth
    teacher for one epoch, then distill it into a fresh student through the
    CLI with attention-weighted feature distillation. The teacher runs
    train-mode BN (batch statistics) per the reference's no_grad semantics."""
    save = str(tmp_path / 'save')
    teacher_flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                            '-metadata_path', ntu_fixture, '-save_path', save,
                            '-shuffle', '-save_record']
    run_cli('depth_main.py', teacher_flags)
    teacher_ckpt = os.path.join(save, 'resnet18-e2e', 'model_1.pth')
    assert os.path.exists(teacher_ckpt)

    student_save = str(tmp_path / 'student')
    flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                    '-metadata_path', ntu_fixture, '-save_path', student_save,
                    '-shuffle', '-save_record', '-do_teach', '-attention',
                    '-teacher_path', teacher_ckpt,
                    '-alpha_init', '0.5', '-alpha_dest', '0.1']
    out = run_cli('depth_main.py', flags)
    _spec_line(out)
    assert 'Dist Loss' in out
    assert os.path.exists(os.path.join(student_save, 'resnet18-e2e',
                                       'model_1.pth'))


def test_depth_main_distill_semi_teach(ntu_fixture, tmp_path):
    """-semi_teach (depth_train.py:67-71, 222-231): the PKU unlabeled stream
    is resolved by hijacking data_name in a copied namespace, and each update
    folds an extra distillation-only batch. The teacher forwards main + semi
    batches in order, drifting its train-mode BN stats through both."""
    import json

    from pose_tpu.data.synthetic import make_pku_fixture

    pku_meta = make_pku_fixture(str(tmp_path / 'pku'), num_train=8,
                                num_valid=4)
    merged = json.load(open(ntu_fixture))
    pku = json.load(open(pku_meta))
    for key in ('root', 'loader', 'no_depth', 'thresholds'):
        merged[key].update(pku[key])
    meta = str(tmp_path / 'metadata.json')
    json.dump(merged, open(meta, 'w'))

    save = str(tmp_path / 'save')
    teacher_flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                            '-metadata_path', meta, '-save_path', save,
                            '-shuffle', '-save_record']
    run_cli('depth_main.py', teacher_flags)
    teacher_ckpt = os.path.join(save, 'resnet18-e2e', 'model_1.pth')

    student_save = str(tmp_path / 'student')
    flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                    '-metadata_path', meta, '-save_path', student_save,
                    '-shuffle', '-save_record', '-do_teach', '-attention',
                    '-teacher_path', teacher_ckpt, '-semi_teach',
                    '-semi_batch', '4']
    out = run_cli('depth_main.py', flags)
    _spec_line(out)
    assert 'Semi Loss' in out


def test_main_save_state_sidecar_resume(cmu_fixture, tmp_path):
    """-save_state writes the orbax full-train-state sidecar each epoch and
    -resume restores it (Adam moments + BN stats + step), making resume
    bit-exact — the reference torch checkpoint only carries weights."""
    save = str(tmp_path / 'save')
    flags = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                    '-metadata_path', cmu_fixture, '-save_path', save,
                    '-shuffle', '-save_record', '-save_state']
    run_cli('main.py', flags)
    sidecar = os.path.join(save, 'resnet18-e2e', 'orbax')
    assert os.path.isdir(sidecar)

    # the sidecar holds a genuinely-trained optimizer state
    import types
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pose_tpu.models import build_model
    from pose_tpu.train import steps
    from pose_tpu.train.orbax_io import restore_train_state
    args = types.SimpleNamespace(
        model='resnet18', criterion='SmoothL1', half_acc=False,
        extra_channel=False, joint_space=False, skip_relu=False,
        early_dist=False, depth_only=False, side_in=65, stride=32,
        num_joints=19, depth=4, depth_range=1000.0, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4)
    model = build_model(args, 'rgb')
    tx = steps.make_optimizer(args)
    template = steps.init_state(model, args, tx,
                                (jnp.ones((1, 65, 65, 3)),))
    restored = restore_train_state(sidecar, template)
    assert int(restored.step) > 0
    mu_norm = sum(float(jnp.sum(jnp.abs(x)))
                  for x in jax.tree_util.tree_leaves(restored.opt_state))
    assert mu_norm > 0.0   # fresh init would be all zeros

    resume_flags = BASE + [
        '-data_name', 'cmu', '-num_joints', '19',
        '-metadata_path', cmu_fixture, '-save_path', save,
        '-shuffle', '-save_record', '-save_state', '-resume',
        '-model_path', os.path.join(save, 'resnet18-e2e', 'model_1.pth'),
        '-n_epochs', '2']
    out = run_cli('main.py', resume_flags)
    assert '=> Restoring full train state from' in out
    assert os.path.exists(os.path.join(save, 'resnet18-e2e', 'model_2.pth'))


def test_depth_main_distill_depth_only_teacher(ntu_fixture, tmp_path):
    """-do_teach -depth_only: the privileged teacher consumes the raw
    1-channel depth stream while the student consumes RGB (the reference's
    vanilla_infer(color), depth_train.py:193; the combination is a latent
    crash in the reference — its student inherits the 1-ch stem —
    adjudicated here to the clear intent)."""
    save = str(tmp_path / 'save')
    teacher_flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                            '-metadata_path', ntu_fixture, '-save_path', save,
                            '-shuffle', '-save_record', '-depth_only']
    run_cli('depth_main.py', teacher_flags)
    teacher_ckpt = os.path.join(save, 'resnet18-e2e', 'model_1.pth')

    student_save = str(tmp_path / 'student')
    flags = BASE + ['-data_name', 'ntu', '-num_joints', '17',
                    '-metadata_path', ntu_fixture,
                    '-save_path', student_save,
                    '-shuffle', '-save_record', '-do_teach', '-attention',
                    '-depth_only', '-teacher_path', teacher_ckpt]
    out = run_cli('depth_main.py', flags)
    _spec_line(out)
    assert 'Dist Loss' in out


def test_main_trace_dir_captures_profile(cmu_fixture, tmp_path):
    """-trace_dir wraps the first trained epoch in a jax.profiler trace
    (beyond-reference: SURVEY.md §5 notes the reference has no profiler);
    the capture must produce an xplane artifact and leave training intact."""
    save = str(tmp_path / 'save')
    trace_dir = str(tmp_path / 'trace')
    flags = BASE + ['-data_name', 'cmu', '-num_joints', '19',
                    '-metadata_path', cmu_fixture, '-save_path', save,
                    '-shuffle', '-save_record', '-geometry',
                    '-trace_dir', trace_dir]
    out = run_cli('main.py', flags)
    _spec_line(out)
    assert '=> Capturing profiler trace to ' + trace_dir in out
    captured = [os.path.join(root, f)
                for root, _, files in os.walk(trace_dir) for f in files]
    assert any(f.endswith('.xplane.pb') for f in captured), captured
