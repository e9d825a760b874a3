"""Multi-host scale-out (VERDICT round-2 missing #4): the same 8-device
data-parallel mesh run as TWO processes x 4 virtual CPU devices with gloo
cross-process collectives — init_distributed, process-sliced loader batches
reassembled by make_array_from_process_local_data, process_allgather eval,
and rank-0 console/checkpoint gating — must reproduce the single-process
8-device run (exactly rank-vs-rank; within cross-process reduction-order
float noise vs single-process)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def worker_env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['PYTHONPATH'] = REPO
    return env


def run_cluster(argv_per_rank, tmp_path, timeout=1500, nprocs=2):
    """Launch one subprocess per rank, wait, and return their stdout logs
    (asserting clean exits). argv_per_rank: rank -> full argv list."""
    procs = [subprocess.Popen(argv_per_rank(r), cwd=REPO, env=worker_env(),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for r in range(nprocs)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), '\n'.join(logs)
    return logs


def run_workers(mode, fixture, tmp_path, nprocs=2):
    """Run tests/mp_worker.py on `nprocs` ranks; returns the result
    dicts."""
    port = free_port()
    outs = [str(tmp_path / f'out{r}.json') for r in range(nprocs)]
    worker = os.path.join(REPO, 'tests', 'mp_worker.py')
    run_cluster(
        lambda r: [sys.executable, worker, str(r), str(nprocs), str(port),
                   fixture, outs[r], mode],
        tmp_path, nprocs=nprocs)
    return [json.load(open(o)) for o in outs]


@pytest.fixture(scope='module')
def cmu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_cmu_fixture
    root = tmp_path_factory.mktemp('mp_cmu')
    return make_cmu_fixture(str(root), num_train=16, num_valid=8)


@pytest.fixture(scope='module')
def rgb_reference(cmu):
    """The same RGB epoch in THIS process (conftest: 8 virtual devices)."""
    from tests.mp_worker import run_rgb_epoch
    return run_rgb_epoch(cmu)


def test_two_process_training_matches_single_process(cmu, rgb_reference,
                                                     tmp_path):
    results = run_workers('rgb', cmu, tmp_path)
    # the metric pipeline (allgathered on both) must agree across ranks
    for key in ('train_loss', 'test_loss', 'cam_mean', 'score_pck',
                'score_auc'):
        assert np.isclose(results[0][key], results[1][key],
                          rtol=1e-6), (key, results)

    # same global batches, same device count and layout, same seeds: the
    # two-process run must reproduce the single-process epoch
    for key in ('train_loss', 'test_loss', 'cam_mean'):
        assert np.isclose(results[0][key], rgb_reference[key],
                          rtol=1e-5), (key, results[0], rgb_reference)


def test_two_process_spatial_partitioning(cmu, rgb_reference, tmp_path):
    """-mesh_spatial 2 under cluster mode: the 8 global devices fold to a
    (4, 2) (data, space) grid whose rows stay process-local (2 per rank),
    loader blocks reassemble over the data axis only, and the steps'
    sharding constraint drives the conv halo exchanges across gloo. Must
    agree rank-vs-rank exactly and reproduce the DP single-process epoch
    (halo/reduction-order float noise only)."""
    results = run_workers('rgb_spatial', cmu, tmp_path)
    for key in ('train_loss', 'test_loss', 'cam_mean', 'score_pck',
                'score_auc'):
        assert np.isclose(results[0][key], results[1][key],
                          rtol=1e-6), (key, results)
    for key in ('train_loss', 'test_loss', 'cam_mean'):
        assert np.isclose(results[0][key], rgb_reference[key],
                          rtol=5e-4), (key, results[0], rgb_reference)


def test_three_process_ranks_agree(cmu, tmp_path):
    """Cluster generality beyond the 2-rank reference shape: 3 processes x
    4 devices (global batch 12, 16 train samples -> a padded final batch
    whose real rows span the process blocks unevenly). No single-process
    twin at this width, so the pin is rank-vs-rank: loader slicing,
    reassembly, the psum'd loss stream and the allgathered eval metrics
    must agree exactly across all three ranks."""
    results = run_workers('rgb', cmu, tmp_path, nprocs=3)
    assert [r['rank'] for r in results] == [0, 1, 2]
    for key in ('train_loss', 'test_loss', 'cam_mean', 'score_pck',
                'score_auc'):
        vals = [r[key] for r in results]
        assert np.isclose(vals[0], vals[1], rtol=1e-6), (key, results)
        assert np.isclose(vals[0], vals[2], rtol=1e-6), (key, results)
        assert np.isfinite(vals[0]), (key, results)


def test_cli_two_process_run(cmu, rgb_reference, tmp_path):
    """The user-facing surface of cluster mode: `main.py -dist_coord ...`
    run twice — rank 0 owns the console and the checkpoint files, rank 1 is
    silent; the SPEC metrics match the single-process reference epoch."""
    import re

    port = free_port()
    save = str(tmp_path / 'save')
    base = ['-suffix', 'mp', '-criterion', 'SmoothL1', '-batch_size', '8',
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-n_epochs', '1', '-n_cudas', '8', '-learn_rate', '1e-4',
            '-model', 'resnet18', '-data_name', 'cmu', '-num_joints', '19',
            '-metadata_path', cmu, '-save_path', save,
            '-shuffle', '-save_record', '-geometry', '-colour',
            '-dist_coord', f'127.0.0.1:{port}', '-dist_nprocs', '2']
    logs = run_cluster(
        lambda r: [sys.executable, 'main.py'] + base + ['-dist_rank',
                                                        str(r)],
        tmp_path)

    spec = re.findall(r'=>\[SPEC\] cam_mean: ([\d.]+)\s+\[pck\]: ([\d.]+)'
                      r'\s+\[auc\]: ([\d.]+)', logs[0])
    assert spec, logs[0]
    assert '[SPEC]' not in logs[1], logs[1]  # rank 1 console is silenced

    assert os.path.exists(os.path.join(save, 'resnet18-mp', 'model_1.pth'))
    assert os.path.exists(os.path.join(save, 'resnet18-mp', 'best.pth'))

    assert np.isclose(float(spec[-1][0]), rgb_reference['cam_mean'],
                      atol=0.005), (spec, rgb_reference)


def test_cli_cluster_save_state_resume(cmu, tmp_path):
    """-save_state under cluster mode: the orbax sidecar save/restore is a
    COLLECTIVE under jax.distributed — every rank must participate
    (orbax commits from the primary process; a rank-0-only gate would
    deadlock the multihost barrier), and the shared save_path is the
    contract (docs/ARCHITECTURE.md "Scale-out"). Resume then restores the
    full TrainState on every rank so the continued run stays in lockstep."""
    port = free_port()
    save = str(tmp_path / 'save')
    base = ['-suffix', 'mpst', '-criterion', 'SmoothL1', '-batch_size', '8',
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-n_cudas', '8', '-learn_rate', '1e-4',
            '-model', 'resnet18', '-data_name', 'cmu', '-num_joints', '19',
            '-metadata_path', cmu, '-save_path', save,
            '-shuffle', '-save_record', '-save_state',
            '-dist_nprocs', '2']
    run_cluster(
        lambda r: [sys.executable, 'main.py'] + base +
        ['-n_epochs', '1', '-dist_coord', f'127.0.0.1:{port}',
         '-dist_rank', str(r)],
        tmp_path)
    run_dir = os.path.join(save, 'resnet18-mpst')
    sidecar = os.path.join(run_dir, 'orbax')
    assert os.path.isdir(os.path.join(sidecar, '1')), os.listdir(run_dir)

    port2 = free_port()
    logs = run_cluster(
        lambda r: [sys.executable, 'main.py'] + base +
        ['-n_epochs', '2', '-resume',
         '-model_path', os.path.join(run_dir, 'model_1.pth'),
         '-dist_coord', f'127.0.0.1:{port2}', '-dist_rank', str(r)],
        tmp_path)
    assert '=> Restoring full train state from' in logs[0], logs[0]
    assert os.path.exists(os.path.join(run_dir, 'model_2.pth'))
    assert os.path.isdir(os.path.join(sidecar, '2')), os.listdir(sidecar)
    # epoch 2's metrics print on rank 0 only
    assert '[SPEC]' in logs[0] and '[SPEC]' not in logs[1]


@pytest.fixture(scope='module')
def ntu(tmp_path_factory):
    from pose_tpu.data.synthetic import make_ntu_fixture
    root = tmp_path_factory.mktemp('mp_ntu')
    return make_ntu_fixture(str(root), num_train=16, num_valid=8)


def test_two_process_distillation_matches_single_process(ntu, tmp_path):
    """The privileged-information core at scale: a DepthPoseLoader epoch
    through the teacher+student distillation step as 2 processes x 4
    devices must reproduce the single-process loss streams."""
    results = run_workers('distill', ntu, tmp_path)
    assert np.allclose(results[0]['cam_losses'], results[1]['cam_losses'],
                       rtol=1e-6), results
    assert np.allclose(results[0]['dist_losses'], results[1]['dist_losses'],
                       rtol=1e-6), results

    from tests.mp_worker import run_distill_epoch
    ref = run_distill_epoch(ntu)
    assert len(ref['cam_losses']) == 2
    # vs single-process: the gloo cross-process all-reduce sums in a
    # different order than XLA's single-process reduction, so the psum'd
    # distill loss/grads carry ~1e-7 float noise that compounds through the
    # step-1 Adam update into ~1e-5-scale step-2 loss differences (measured:
    # 3.5e-5 rel). Rank-vs-rank above stays strict — both processes see the
    # SAME reduction.
    assert np.allclose(results[0]['cam_losses'], ref['cam_losses'],
                       rtol=5e-4), (results[0], ref)
    assert np.allclose(results[0]['dist_losses'], ref['dist_losses'],
                       rtol=5e-4), (results[0], ref)


@pytest.fixture(scope='module')
def combined(tmp_path_factory):
    """Merged NTU+PKU metadata (the config-5 mixed stream)."""
    from pose_tpu.data.synthetic import make_ntu_fixture, make_pku_fixture
    root = tmp_path_factory.mktemp('mp_mix')
    ntu_meta = make_ntu_fixture(str(root / 'ntu'), num_train=8, num_valid=4)
    pku_meta = make_pku_fixture(str(root / 'pku'), num_train=8, num_valid=4)
    merged = json.load(open(ntu_meta))
    pku = json.load(open(pku_meta))
    for key in ('root', 'loader', 'no_depth', 'thresholds'):
        merged[key].update(pku[key])
    path = str(root / 'metadata.json')
    json.dump(merged, open(path, 'w'))
    return path


def test_two_process_mixed_stream_matches_single_process(combined, tmp_path):
    """BASELINE config 5 ("pod-slice scale"): the mixed NTU+PKU stream as 2
    processes — identical member interleave order on both ranks (the
    MixedLoader RNG is seed-deterministic) and the loss stream matches the
    single-process run."""
    results = run_workers('mixed', combined, tmp_path)
    assert results[0]['order'] == results[1]['order'], results
    assert np.allclose(results[0]['losses'], results[1]['losses'],
                       rtol=1e-6), results

    from tests.mp_worker import run_mixed_epoch
    ref = run_mixed_epoch(combined)
    assert results[0]['order'] == ref['order'], (results[0], ref)
    assert len(ref['losses']) == 2  # one NTU + one PKU batch
    assert np.allclose(results[0]['losses'], ref['losses'],
                       rtol=5e-4), (results[0], ref)