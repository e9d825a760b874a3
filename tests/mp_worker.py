"""Worker process for tests/test_multiprocess.py: joins an nprocs-process
gloo cluster (each process owning 4 virtual CPU devices of a 4*nprocs-device
global mesh) and runs one train epoch + one eval epoch through the full
Trainer/Loader stack — the multi-host scale-out path of
pose_tpu.parallel.mesh (init_distributed / process-sliced loaders /
process_allgather eval). Not a test module; launched by the test with
argv = rank nprocs port fixture_metadata out_json."""

import json
import sys
import types


def make_args(metadata_path):
    """One batch row per live device: 8 under the single-process conftest
    mesh and under the reference 2x4 cluster, 4*nprocs for wider clusters —
    every mode (rgb/distill/mixed) sizes its mesh and batch from this."""
    import jax
    ndev = jax.device_count()
    return types.SimpleNamespace(
        criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
        depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4, n_epochs=1,
        do_track=False, joint_space=False, shuffle=True, geometry=True,
        colour=True, eraser=False, occluder=False, occ_path=None,
        occ_count=0, batch_size=ndev, data_name='cmu',
        metadata_path=metadata_path, random_zoom=0.9, n_cudas=ndev, workers=1,
        nexponent=False, to_depth=False, do_teach=False, attention=False,
        semi_teach=False, extra_channel=False, model='resnet18',
        depth_only=False, skip_relu=False, early_dist=False,
        thresh_solid=0.4, thresh_close=0.8, thresh_rough=1.2,
        alpha_init=0.5, alpha_dest=0.1, alpha_span=10,
        print_freq=1)


def run_rgb_epoch(fixture, mesh_spatial=1):
    """One cam train epoch + one eval epoch through the full Trainer/Loader
    stack; returns the record dict. Runs identically single- or
    multi-process (the callers differ only in init_distributed)."""
    import jax.numpy as jnp

    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    from pose_tpu.models import build_model
    from pose_tpu.train.engine import RgbTrainer

    args = make_args(fixture)
    args.mesh_spatial = mesh_spatial
    info = build_info('cmu')
    model = build_model(args, 'rgb')
    trainer = RgbTrainer(args, model, info)
    trainer.init_state((jnp.ones((1, args.side_in, args.side_in, 3)),))

    train_rec = trainer.cam_train(1, PoseLoader(args, 'train', info),
                                  args.learn_rate)
    test_rec = trainer.cam_test(1, PoseLoader(args, 'valid', info))
    return {'train_loss': train_rec['cam_train_loss'],
            'test_loss': test_rec['test_loss'],
            'cam_mean': test_rec['cam_mean'],
            'score_pck': test_rec['score_pck'],
            'score_auc': test_rec['score_auc']}


def run_distill_epoch(fixture):
    """The privileged-information core — teacher+student distillation fed by
    a real DepthPoseLoader epoch over the mesh (depth_train.py:161-283
    analogue); returns the per-batch loss streams."""
    import jax
    import jax.numpy as jnp

    from depth_main import get_info
    from pose_tpu.data.loader import DepthPoseLoader
    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh, shard_replicated
    from pose_tpu.train import steps

    args = make_args(fixture)
    args.data_name = 'ntu'
    args.num_joints = 17
    args.do_teach = True
    args.attention = True
    args.do_freeze = False
    args.sigmoid = False
    args.bin_dist = False
    info = get_info()
    mesh = make_mesh(args.n_cudas)

    model = build_model(args, 'depth')
    teacher = build_model(args, 'depth')
    tx = steps.make_optimizer(args)
    state = shard_replicated(mesh, steps.init_state(
        model, args, tx, (jnp.ones((1, 65, 65, 3)),)))
    t_raw = teacher.init(jax.random.PRNGKey(3), jnp.ones((1, 65, 65, 3)),
                         train=False)
    teacher_vars = shard_replicated(
        mesh, dict(params=t_raw['params'], batch_stats=t_raw['batch_stats']))
    step = steps.make_distill_train_step(model, teacher, args,
                                         info.key_index, tx,
                                         teacher_is_fusion=False,
                                         with_semi=False)

    cam_losses, dist_losses = [], []
    for batch in DepthPoseLoader(args, 'train', info, mesh=mesh):
        device_batch = dict(color=batch['color'],
                            true_cam=batch['true_cam'],
                            true_val=batch['true_val'],
                            atten_map=batch['atten_map'])
        state, teacher_vars, out = step(state, teacher_vars, device_batch,
                                        jnp.float32(1e-4), jnp.float32(0.5))
        cam_losses.append(float(out['cam_loss']))
        dist_losses.append(float(out['dist_loss']))
    return {'cam_losses': cam_losses, 'dist_losses': dist_losses}


def run_mixed_epoch(fixture):
    """BASELINE config 5 at cluster scale: the CMU-style mixed NTU+PKU
    stream (MixedLoader interleave, seed-deterministic on every process)
    through the vanilla depth train step; returns the per-batch loss stream
    and the member interleave order."""
    import jax.numpy as jnp

    from depth_main import get_info
    from pose_tpu.data.mixed import build_mixed_loader
    from pose_tpu.models import build_model
    from pose_tpu.parallel import make_mesh, shard_replicated
    from pose_tpu.train import steps

    args = make_args(fixture)
    args.data_name = 'ntu'
    args.num_joints = 17
    info = get_info()
    mesh = make_mesh(args.n_cudas)
    loader = build_mixed_loader(args, 'train', info, ['ntu', 'pku'],
                                metadata_path=fixture, mesh=mesh)

    model = build_model(args, 'depth')
    tx = steps.make_optimizer(args)
    state = shard_replicated(mesh, steps.init_state(
        model, args, tx, (jnp.ones((1, 65, 65, 3)),)))
    step = steps.make_vanilla_train_step(model, args, info.key_index, tx)

    losses, order = [], []
    for batch in loader:
        order.append(int(batch['_dataset']))
        device_batch = dict(in_image=batch['color'],
                            true_cam=batch['true_cam'],
                            true_val=batch['true_val'])
        state, out = step(state, device_batch, 1e-4)
        losses.append(float(out['cam_loss']))
    return {'losses': losses, 'order': order}


def main():
    rank, nprocs, port, fixture, out_path = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else 'rgb'

    from pose_tpu.parallel import init_distributed

    dist_args = types.SimpleNamespace(
        dist_coord='127.0.0.1:' + port, dist_nprocs=int(nprocs),
        dist_rank=int(rank))
    assert init_distributed(dist_args)

    import jax

    assert jax.process_count() == int(nprocs), jax.process_count()
    assert len(jax.devices()) == 4 * int(nprocs), jax.devices()

    run = {'rgb': run_rgb_epoch, 'distill': run_distill_epoch,
           'mixed': run_mixed_epoch,
           # -mesh_spatial under a cluster: (data, space) rows process-local
           'rgb_spatial': lambda f: run_rgb_epoch(f, mesh_spatial=2)}[mode]
    result = dict(run(fixture))
    result['rank'] = int(rank)
    with open(out_path, 'w') as f:
        json.dump(result, f)
    print('worker %s done' % rank, flush=True)


if __name__ == '__main__':
    main()
