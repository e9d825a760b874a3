"""RGB training entry point — CLI-compatible with the reference's main.py so
cmu_train.sh / run_test.sh run unchanged. The torch/cuda machinery maps to:
model catalogue -> pose_tpu.models.build_model, DataParallel -> jax.sharding
mesh (main.py:66 -> pose_tpu.parallel), checkpoint IO -> torch-key-compatible
converter (pose_tpu.models.convert)."""

import os

import jax.numpy as jnp

import opts
from datasets import get_data_loader
from pose_tpu.models import build_model
from pose_tpu.models import convert
from pose_tpu.train import Logger, RgbTrainer
from pose_tpu.utils.profiling import cli_trace as _trace_ctx


def create_variables(args, model, trainer):
    """Checkpoint/pretrain resolution (reference main.py:24-68)."""
    assert not (args.resume and args.pretrain)
    assert args.model in ('resnet18', 'resnet50')
    state = None

    in_ch = 4 if args.extra_channel else 3
    trainer.init_state((jnp.ones((1, args.side_in, args.side_in, in_ch)),))

    if args.pretrain:
        template = trainer.get_variables()
        variables = convert.load_pretrained(template, args, 'rgb')
        trainer.set_variables(variables)

    if args.test_only or args.val_only:
        save_path = os.path.join(args.save_path,
                                 args.model + '-' + args.suffix)
        print('=> Loading checkpoint from '
              + os.path.join(save_path, 'best.pth'))
        assert os.path.exists(save_path)
        best = convert.load_torch_file(os.path.join(save_path, 'best.pth'))
        best = best['best']
        checkpoint = os.path.join(save_path, 'model_%d.pth' % best)
        checkpoint = convert.load_torch_file(checkpoint)['model']
        template = trainer.get_variables()
        trainer.set_variables(convert.variables_from_torch(
            template, checkpoint))

    if args.resume:
        print('=> Loading checkpoint from ' + args.model_path)
        checkpoint = convert.load_torch_file(args.model_path)
        template = trainer.get_variables()
        trainer.set_variables(convert.variables_from_torch(
            template, checkpoint['model'], verbose=False))
        state = checkpoint['state']
        if getattr(args, 'save_state', False):
            # -save_state: the orbax sidecar carries the FULL TrainState
            # (Adam moments, BN stats, step) for bit-exact resume; the
            # torch checkpoint remains the interchange format
            from pose_tpu.train.orbax_io import maybe_restore_sidecar
            maybe_restore_sidecar(trainer, args)

    return state


def main():
    args = opts.args if opts.args is not None else opts.parse()
    assert args.do_track <= args.joint_space

    # multi-host scale-out (-dist_coord): join the cluster before any JAX
    # backend use; only process 0 keeps the reference console/checkpoint IO
    from pose_tpu.parallel import init_distributed, is_main_process
    if init_distributed(args) and not is_main_process():
        import sys
        sys.stdout = open(os.devnull, 'w')

    from pose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args)

    model = build_model(args, 'rgb')

    if args.test_only:
        test_loader, data_info = get_data_loader(args, 'test')
    elif args.val_only:
        test_loader, data_info = get_data_loader(args, 'valid')
    else:
        test_loader, data_info = get_data_loader(args, 'valid')
        data_loader, data_info = get_data_loader(args, 'train')
    print('=> Dataloaders are ready')

    trainer = RgbTrainer(args, model, data_info)
    state = create_variables(args, model, trainer)
    print('=> Model and criterion are ready')

    logger = Logger(args, state)
    print('=> Logger is ready')
    print('=> Trainer is ready')

    if args.test_only or args.val_only:
        with _trace_ctx(args, capture=True):
            trainer.test(0, test_loader)
    else:
        start_epoch = logger.state['epoch'] + 1
        if (args.resume and args.save_state
                and getattr(args, 'save_every', 0)):
            # a mid-epoch sidecar for start_epoch (if one exists) resumes
            # the interrupted epoch from its exact batch (engine.MidEpochSaver)
            trainer._mid_resume_pending = True
        print('=> Start training')
        for epoch in range(start_epoch, args.n_epochs + 1):
            with _trace_ctx(args, capture=(epoch == start_epoch)):
                train_rec = trainer.train(epoch, data_loader)
            test_rec = trainer.test(epoch, test_loader)
            logger.record(epoch, train_rec, test_rec,
                          trainer.get_variables())
            if args.save_state:
                from pose_tpu.train.orbax_io import maybe_save_sidecar
                maybe_save_sidecar(trainer, args, epoch)
        logger.final_print()


if __name__ == '__main__':
    main()
