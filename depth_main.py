"""Depth/fusion/distillation entry point — CLI-compatible with the
reference's depth_main.py (ntu_train.sh runs unchanged). Model dispatch
mirrors depth_main.py:37-42: ('partial_' if -partial_conv else '') +
('fusion' if -do_fusion else 'depth')."""

import importlib
import os

import jax.numpy as jnp

import opts
from pose_tpu.models import build_model, convert
from pose_tpu.train import DepthTrainer, Logger
from pose_tpu.train.depth_engine import load_metadata
from pose_tpu.utils.profiling import cli_trace as _trace_ctx


def get_info():
    """JointInfo from the h36m tables (reference depth_main.py:14-33; the
    h36m layout is reused for the NTU/PKU 17-joint subset)."""
    from datasets import build_info
    return build_info('h36m')


def model_variant(args):
    variant = 'fusion' if args.do_fusion else 'depth'
    if args.partial_conv:
        variant = 'partial_' + variant
    return variant


def sample_inputs(args, variant):
    s = args.side_in
    if variant in ('fusion', 'partial_fusion'):
        return (jnp.ones((1, s, s, 3)), jnp.ones((1, s, s, 1)))
    in_ch = 1 if args.depth_only else 3
    return (jnp.ones((1, s, s, in_ch)),)


def get_loader_module(args):
    """depth_train.get_loader (depth_train.py:15-19): metadata.json names the
    loader module."""
    metadata = load_metadata(args)
    return importlib.import_module(metadata['loader'][args.data_name])


def load_checkpoint_into(trainer, args):
    if args.test_only or args.val_only:
        save_path = os.path.join(args.save_path,
                                 args.model + '-' + args.suffix)
        assert os.path.exists(save_path)
        checkpoint = os.path.join(save_path,
                                  'model_{}.pth'.format(args.n_epochs))
        print('=> Loads checkpoint from ' + checkpoint)
        checkpoint = convert.load_torch_file(checkpoint)['model']
        template = trainer.get_variables()
        trainer.set_variables(convert.variables_from_torch(
            template, checkpoint, verbose=False))

    state = None
    if args.resume:
        print('=> Loads checkpoint from ' + args.model_path)
        checkpoint = convert.load_torch_file(args.model_path)
        template = trainer.get_variables()
        trainer.set_variables(convert.variables_from_torch(
            template, checkpoint['model'], verbose=False))
        state = checkpoint['state']
        if getattr(args, 'save_state', False):
            from pose_tpu.train.orbax_io import maybe_restore_sidecar
            maybe_restore_sidecar(trainer, args)
    return state


def main():
    args = opts.args if opts.args is not None else opts.parse()
    assert not (args.resume and args.pretrain)
    assert not (args.do_fusion and args.depth_only)
    assert not (args.depth_host and args.depth_only)

    # multi-host scale-out (-dist_coord): join the cluster before any JAX
    # backend use; only process 0 keeps the reference console/checkpoint IO
    from pose_tpu.parallel import init_distributed, is_main_process
    if init_distributed(args) and not is_main_process():
        import sys
        sys.stdout = open(os.devnull, 'w')

    from pose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args)

    data_info = get_info()
    variant = model_variant(args)

    if args.do_teach:
        # create_pair (depth_main.py:77-108): frozen teacher of the flagged
        # variant + fresh/pretrained depthnet student. The student under
        # distillation ALWAYS consumes the RGB stream (the reference's
        # vanilla_infer(color_image), depth_train.py:193) — -depth_only
        # shapes only the TEACHER's stem, so the student args must not
        # inherit it.
        import copy
        student_args = copy.copy(args)
        student_args.depth_only = False
        teacher_model = build_model(args, variant)
        student_model = build_model(student_args, 'depth')
        trainer = DepthTrainer(args, student_model, data_info)
        trainer.init_state(sample_inputs(student_args, 'depth'))
        if args.pretrain:
            template = trainer.get_variables()
            trainer.set_variables(convert.load_pretrained(
                template, student_args, 'depth'))
        # teacher weights
        import jax
        teacher_template = jax.device_get(teacher_model.init(
            jax.random.PRNGKey(1), *sample_inputs(args, variant),
            train=False))
        textbook = convert.load_torch_file(args.teacher_path)['model']
        teacher_vars = convert.variables_from_torch(teacher_template,
                                                    textbook, verbose=False)
        trainer.set_teacher(teacher_model, teacher_vars)
        state = load_checkpoint_into(trainer, args)
    else:
        model = build_model(args, variant)
        trainer = DepthTrainer(args, model, data_info)
        trainer.init_state(sample_inputs(args, variant))
        if args.pretrain:
            template = trainer.get_variables()
            trainer.set_variables(convert.load_pretrained(template, args,
                                                          variant))
        state = load_checkpoint_into(trainer, args)
    print('=> Models are created and filled')

    module = get_loader_module(args)

    if args.test_only:
        test_loader = module.data_loader(args, 'test', data_info)
    elif args.val_only:
        test_loader = module.data_loader(args, 'valid', data_info)
    else:
        test_loader = module.data_loader(args, 'valid', data_info)
        data_loader = module.data_loader(args, 'train', data_info)
    print('=> Dataloaders are ready')

    if args.semi_teach:
        # the reference hijacks the namespace to build the PKU semi loader
        # (depth_train.py:67-71)
        import copy
        semi_args = copy.copy(args)
        semi_args.data_name = 'pku'
        semi_args.batch_size = args.semi_batch
        semi_module = get_loader_module(semi_args)
        trainer.set_semi_loader(
            semi_module.data_loader(semi_args, 'train', data_info))

    logger = Logger(args, state)
    print('=> Logger is ready')
    print('=> Trainer is ready')

    if args.test_only or args.val_only:
        print('=> Evaluation starts')
        with _trace_ctx(args, capture=True):
            test_rec = trainer.test(0, test_loader)
        logger.print_rec(test_rec)
    else:
        start_epoch = logger.state['epoch'] + 1
        if (args.resume and args.save_state
                and getattr(args, 'save_every', 0)):
            # a mid-epoch sidecar for start_epoch (if one exists) resumes
            # the interrupted epoch from its exact batch (engine.MidEpochSaver)
            trainer._mid_resume_pending = True
        print('=> Train starts')
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
