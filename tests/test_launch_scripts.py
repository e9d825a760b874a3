"""The reference launch scripts must run unchanged (BASELINE.json;
SURVEY.md §0 notes they use flags the reference's own opts.py never
defined). These tests parse the LITERAL argv each script passes and push it
through opts.build_parser, so any flag-surface regression breaks here
without needing a training run."""

import os
import re
import subprocess

import pytest

import opts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ['cmu_train.sh', 'ntu_train.sh', 'run_test.sh']


def script_argv(name):
    """Extract the python entry point and its argv from a launcher script,
    resolving `${VAR:-default}` to the default."""
    text = open(os.path.join(REPO, name)).read()
    text = text.replace('\\\n', ' ')
    line = next(ln for ln in text.splitlines()
                if ln.strip().startswith(('python ', 'python3 ')))
    line = re.sub(r'\$\{[A-Z_]+:-([^}]*)\}', r'\1', line)
    tokens = line.split()
    return tokens[1], tokens[2:]


@pytest.mark.parametrize('name', SCRIPTS)
def test_script_is_valid_bash(name):
    subprocess.run(['bash', '-n', os.path.join(REPO, name)], check=True)


@pytest.mark.parametrize('name,script,expect', [
    ('cmu_train.sh', 'main.py',
     dict(model='resnet50', extra_channel=True, half_acc=True,
          joint_space=True, do_track=True, pretrain=True, static_filter=True,
          data_name='cmu', criterion='SmoothL1', batch_size=64,
          learn_rate=2e-5, n_cudas=1)),
    ('ntu_train.sh', 'depth_main.py',
     dict(model='resnet50', half_acc=True, pretrain=True, data_name='ntu',
          num_joints=17, depth_range=1000.0, loss_div=10.0,
          criterion='SmoothL1')),
    ('run_test.sh', 'main.py',
     dict(model='resnet50', val_only=True, joint_space=True, do_track=True,
          static_filter=True, data_name='cmu', batch_size=64)),
])
def test_script_flag_surface_parses(name, script, expect):
    entry, argv = script_argv(name)
    assert entry == script
    args = opts.build_parser().parse_args(argv)
    for key, want in expect.items():
        assert getattr(args, key) == want, (key, getattr(args, key))
    # the flags the reference snapshot forgot to define (SURVEY.md §0)
    assert hasattr(args, 'static_filter')
    assert hasattr(args, 'data_root_path')
    assert hasattr(args, 'data_down_path')
    assert hasattr(args, 'thresh_solid')
    # scripts don't pass -metadata_path: the default must resolve
    assert args.metadata_path


def test_metadata_env_override(monkeypatch):
    """POSE_TPU_METADATA redirects the metadata default WITHOUT editing the
    scripts (they never pass -metadata_path); unset, the reference's
    hard-coded path is preserved (datasets.py:42)."""
    monkeypatch.delenv('POSE_TPU_METADATA', raising=False)
    args = opts.build_parser().parse_args(['-model', 'resnet18', '-suffix',
                                           't', '-data_name', 'cmu',
                                           '-save_path', '/tmp/x',
                                           '-criterion', 'SmoothL1'])
    assert args.metadata_path == '/globalwork/liu/metadata.json'
    monkeypatch.setenv('POSE_TPU_METADATA', '/tmp/fixture/metadata.json')
    args = opts.build_parser().parse_args(['-model', 'resnet18', '-suffix',
                                           't', '-data_name', 'cmu',
                                           '-save_path', '/tmp/x',
                                           '-criterion', 'SmoothL1'])
    assert args.metadata_path == '/tmp/fixture/metadata.json'
