"""Full-train-state checkpointing via orbax (beyond-reference extra).

The reference's resume restores only the model weights and epoch counter
(main.py:58-63); Adam moments restart from zero. These helpers persist the
complete TrainState (params, batch_stats, optimizer state, step) so resume
is bit-exact. The torch-format `model_<E>.pth` files from
pose_tpu.train.logger remain the interchange format; this is the
orbax-native sidecar (SURVEY.md §5).
"""

import os

import jax
import orbax.checkpoint as ocp


def save_train_state(directory, state, step=None):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    with ocp.CheckpointManager(directory) as manager:
        saved = manager.save(step, args=ocp.args.StandardSave(
            jax.device_get(state)), force=True)
        manager.wait_until_finished()
    if not saved:
        # orbax's should_save silently refuses steps <= the latest existing
        # one; returning as if saved would break the bit-exact-resume
        # guarantee, so surface it
        raise RuntimeError(
            f'orbax refused to save step {step} into {directory} '
            f'(latest existing step is newer?)')
    return step


def restore_train_state(directory, template_state, step=None):
    """template_state provides the pytree structure/dtypes (from
    steps.init_state)."""
    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as manager:
        if step is None:
            step = manager.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoints in {directory}')
        restored = manager.restore(
            step, args=ocp.args.StandardRestore(
                jax.device_get(template_state)))
    return restored


def sidecar_dir(args):
    """The per-run sidecar location, next to the torch checkpoints."""
    return os.path.join(args.save_path, args.model + '-' + args.suffix,
                        'orbax')


def maybe_restore_sidecar(trainer, args):
    """-resume -save_state: restore the full TrainState when a sidecar
    exists (shared by main.py and depth_main.py so the resume protocol
    cannot diverge between the entry points)."""
    if not getattr(args, 'save_state', False):
        return False
    directory = sidecar_dir(args)
    if not os.path.isdir(directory):
        return False
    print('=> Restoring full train state from ' + directory)
    trainer.load_state(restore_train_state(directory, trainer.state))
    return True


def maybe_save_sidecar(trainer, args, epoch):
    """Per-epoch sidecar write under -save_state."""
    if getattr(args, 'save_state', False):
        save_train_state(sidecar_dir(args), trainer.state, step=epoch)
        # the epoch is complete: any mid-epoch checkpoint is now stale and
        # must not hijack the next resume
        clear_mid_epoch(args)


# ----------------------------------------------------- mid-epoch sidecar
#
# TPU pods preempt; the reference's per-epoch-only resume (log.py:33-40
# semantics) loses up to a full epoch of work. Because the loaders are
# (seed, epoch, batch-index)-deterministic — the per-batch RNG key is
# fold_in(PRNGKey(seed + f(epoch)), i_batch) regardless of where iteration
# starts — a run can be frozen after any train step and continued
# bit-exactly: the mid-epoch sidecar carries the full TrainState, any
# extra step-carried pytrees (e.g. the distillation teacher's drifting BN
# stats), the loss-meter partial sums, and the index of the next batch.
# `-save_every N` (with -save_state) writes one every N train steps.

_MID_EPOCH_RADIX = 10 ** 7    # step id = epoch * radix + next_batch


def mid_epoch_dir(args):
    return os.path.join(sidecar_dir(args), 'mid')


def clear_mid_epoch(args):
    import shutil
    shutil.rmtree(mid_epoch_dir(args), ignore_errors=True)


def open_mid_epoch_manager(args):
    """A long-lived CheckpointManager for the mid-epoch snapshots of one
    epoch. ASYNC: `save_mid_epoch` returns once the (already host-side)
    payload is staged, and the filesystem write overlaps the next train
    steps — the caller flushes with `manager.wait_until_finished()` /
    `manager.close()` at epoch end. Orbax finalizes snapshots by rename,
    so a preemption mid-write loses only the in-flight snapshot, never
    the previous one. Must be opened (and each save issued) on EVERY
    process of a multi-host run — orbax save/close are collective."""
    directory = mid_epoch_dir(args)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=2,
                                           enable_async_checkpointing=True)
    return ocp.CheckpointManager(directory, options=options)


def save_mid_epoch(manager, payload, epoch, next_batch):
    """payload: a pytree (dict) with everything the continuation needs;
    the engines own its schema. Bounded at the 2 most recent snapshots
    (manager options). Asynchronous — see open_mid_epoch_manager."""
    assert next_batch < _MID_EPOCH_RADIX
    step = epoch * _MID_EPOCH_RADIX + next_batch
    saved = manager.save(step, args=ocp.args.StandardSave(
        jax.device_get(payload)), force=True)
    if not saved:
        raise RuntimeError(f'orbax refused mid-epoch step {step}')


def restore_mid_epoch(args, template, expected_epoch):
    """(payload, next_batch) from the latest mid-epoch snapshot of
    `expected_epoch`, or None if there is none for that epoch (older
    snapshots are stale — their epoch completed and was recorded)."""
    directory = mid_epoch_dir(args)
    if not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(directory) as manager:
        step = manager.latest_step()
        if step is None or step // _MID_EPOCH_RADIX != expected_epoch:
            return None
        payload = manager.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(template)))
    return payload, step % _MID_EPOCH_RADIX
