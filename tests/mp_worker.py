"""Worker process for tests/test_multiprocess.py: joins a 2-process gloo
cluster (each process owning 4 virtual CPU devices of an 8-device global
mesh) and runs one train epoch + one eval epoch through the full
Trainer/Loader stack — the multi-host scale-out path of
pose_tpu.parallel.mesh (init_distributed / process-sliced loaders /
process_allgather eval). Not a test module; launched by the test with
argv = rank nprocs port fixture_metadata out_json."""

import json
import sys
import types


def make_args(metadata_path):
    return types.SimpleNamespace(
        criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
        depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0, learn_rate=1e-4, n_epochs=1,
        do_track=False, joint_space=False, shuffle=True, geometry=True,
        colour=True, eraser=False, occluder=False, occ_path=None,
        occ_count=0, batch_size=8, data_name='cmu',
        metadata_path=metadata_path, random_zoom=0.9, n_cudas=8, workers=1,
        nexponent=False, to_depth=False, do_teach=False, attention=False,
        semi_teach=False, extra_channel=False, model='resnet18',
        depth_only=False, skip_relu=False, early_dist=False,
        thresh_solid=0.4, thresh_close=0.8, thresh_rough=1.2,
        print_freq=1)


def main():
    rank, nprocs, port, fixture, out_path = sys.argv[1:6]

    from pose_tpu.parallel import init_distributed

    dist_args = types.SimpleNamespace(
        dist_coord='127.0.0.1:' + port, dist_nprocs=int(nprocs),
        dist_rank=int(rank))
    assert init_distributed(dist_args)

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == int(nprocs), jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    from pose_tpu.models import build_model
    from pose_tpu.train.engine import RgbTrainer

    args = make_args(fixture)
    info = build_info('cmu')
    model = build_model(args, 'rgb')
    trainer = RgbTrainer(args, model, info)
    trainer.init_state((jnp.ones((1, args.side_in, args.side_in, 3)),))

    train_loader = PoseLoader(args, 'train', info)
    val_loader = PoseLoader(args, 'valid', info)

    train_rec = trainer.cam_train(1, train_loader, args.learn_rate)
    test_rec = trainer.cam_test(1, val_loader)

    with open(out_path, 'w') as f:
        json.dump({'rank': int(rank),
                   'train_loss': train_rec['cam_train_loss'],
                   'test_loss': test_rec['test_loss'],
                   'cam_mean': test_rec['cam_mean'],
                   'score_pck': test_rec['score_pck'],
                   'score_auc': test_rec['score_auc']}, f)
    print('worker %s done' % rank, flush=True)


if __name__ == '__main__':
    main()
