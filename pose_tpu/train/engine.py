"""Host-side training engines.

The reference's Trainer classes (train.py:12, depth_train.py:40) survive as
thin epoch/batch orchestrators: all per-batch compute lives in the jitted
steps (steps.py); here we pick the step variant from flags, feed sharded
batches, and keep the reference's exact console output and record dicts so
downstream tooling (log.Logger, run_test.sh parsing) is unchanged.
"""

import numpy as np

import jax

from .. import metrics
from ..parallel import (make_mesh, shard_batch, shard_replicated,
                        spatial_sharding)
from . import schedules, steps


class JointInfo:
    """Skeleton metadata record (reference: utils.py:146-151)."""

    def __init__(self, short_names, parent, mirror, key_index):
        self.short_names = short_names
        self.parent = parent
        self.mirror = mirror
        self.key_index = key_index


def _overlap(dispatched):
    """One-deep software pipeline over an eval epoch: pull item i+1 from
    `dispatched` (whose body shards the batch and dispatches the jitted eval
    step — both asynchronous) BEFORE yielding item i to the host-side
    metrics/console work. The device then computes batch i+1 while the host
    reduces batch i; without this the two serialize (the reference's
    DataLoader+GPU pipeline got the same overlap from CUDA async queues,
    train.py:268-301). Keeps exactly one batch in flight, so device memory
    holds at most two eval outputs."""
    pending = None
    for item in dispatched:
        if pending is not None:
            yield pending
        pending = item
    if pending is not None:
        yield pending


def _to_host(tree):
    """Fetch device values to host numpy. Multi-process: batch-sharded eval
    outputs span non-addressable devices, so they are gathered to full
    replicas first (host numpy leaves — e.g. each process's back_rotation
    rows — concatenate in process order = global batch order)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.tree_util.tree_map(np.asarray, tree)


class LossMeter:
    """Batch-weighted loss averages accumulated *on device*: `add` enqueues a
    tiny multiply-add without synchronizing, so the host only blocks on the
    device when a console line is actually printed (-print_freq) and once at
    epoch end. Per-step `float(loss)` fetches otherwise serialize host and
    device (VERDICT round-2 item 9)."""

    def __init__(self, keys):
        self.sums = {k: None for k in keys}
        self.total = 0

    def add(self, out, weight):
        for k in self.sums:
            term = out[k] * weight
            self.sums[k] = term if self.sums[k] is None else (
                self.sums[k] + term)
        self.total += weight

    def mean(self, key):
        if self.sums[key] is None:
            return 0.0
        return float(self.sums[key]) / max(self.total, 1)


def back_rotate(back_rotation, cam):
    """spec/true rotation back to the original camera (train.py:269-270)."""
    return np.einsum('Bij,BCj->BCi', back_rotation, cam)


class MidEpochSaver:
    """Preemption-safe mid-epoch checkpointing (`-save_state -save_every N`;
    beyond-reference — the reference resumes per epoch only, log.py:33-40,
    losing up to an epoch on a pod preemption).

    Every N train steps the epoch's full continuation record goes into the
    orbax mid-epoch sidecar: TrainState, any extra step-carried pytrees
    (e.g. the distillation teacher's drifting BN stats and the semi-stream
    position), the loss-meter partial sums, the loader's epoch counter and
    the next batch index. Because the loaders draw every RNG from
    (seed, epoch, batch-index), a restored run replays the REST of the
    epoch bit-exactly: skipped batches are never decoded and keep their
    original indices (loader.start_batch).

    Saves are ASYNC (orbax stages the host payload and writes in the
    background; `close()` flushes at epoch end) and — like every orbax
    call in this repo — issued on EVERY process of a multi-host run:
    orbax save/close are collective, so gating them on process 0 would
    desynchronize the barrier sequence. Restore likewise runs on all
    processes from the shared checkpoint path.
    `extra` maps name -> (getter, setter) over pytrees owned by the
    trainer. Loaders without fast-forward support (no `start_batch`)
    disable the saver with a console note rather than checkpointing
    something that could not resume correctly."""

    def __init__(self, trainer, epoch, data_loader, meters, extra=None):
        self.trainer = trainer
        self.args = trainer.args
        self.epoch = epoch
        self.loader = data_loader
        self.meters = meters
        self.extra = extra or {}
        every = int(getattr(self.args, 'save_every', 0) or 0)
        enabled = every > 0 and getattr(self.args, 'save_state', False)
        if enabled and not hasattr(data_loader, 'start_batch'):
            print('=> -save_every: %s cannot fast-forward (no start_batch) '
                  '— mid-epoch checkpointing disabled for this run'
                  % type(data_loader).__name__)
            enabled = False
        self.every = every if enabled else 0
        self.offset = 0
        self._manager = None
        if self.every and getattr(trainer, '_mid_resume_pending', False):
            trainer._mid_resume_pending = False
            self.offset = self._try_restore()

    def _payload(self):
        return dict(
            state=self.trainer.state,
            extra={name: get() for name, (get, _) in self.extra.items()},
            meters={name: dict(
                        sums={k: np.float32(0.0) if v is None else v
                              for k, v in m.sums.items()},
                        total=np.int64(m.total))
                    for name, m in self.meters.items()},
            loader_epoch=np.int64(getattr(self.loader, 'epoch', 0)))

    def _try_restore(self):
        from .orbax_io import restore_mid_epoch
        res = restore_mid_epoch(self.args, self._payload(), self.epoch)
        if res is None:
            return 0
        payload, next_batch = res
        self.trainer.load_state(payload['state'])
        for name, m in self.meters.items():
            saved = payload['meters'][name]
            m.sums = dict(saved['sums'])
            m.total = int(saved['total'])
        for name, (_, set_) in self.extra.items():
            set_(payload['extra'][name])
        self.loader.set_epoch(int(payload['loader_epoch']))
        self.loader.start_batch = next_batch
        print('=> Resuming epoch %d from batch %d (mid-epoch sidecar)'
              % (self.epoch, next_batch))
        return next_batch

    def step_done(self, i_batch):
        """Call after train step `i_batch` has been dispatched and metered;
        stages a snapshot when the cadence hits. The device_get of the
        TrainState is the only synchronous cost — the filesystem write
        overlaps the following train steps (async orbax); `close()`
        flushes."""
        if self.every and (i_batch + 1) % self.every == 0:
            from .orbax_io import open_mid_epoch_manager, save_mid_epoch
            if self._manager is None:
                self._manager = open_mid_epoch_manager(self.args)
            save_mid_epoch(self._manager, self._payload(), self.epoch,
                           i_batch + 1)

    def close(self):
        """Flush any in-flight async snapshot write; call at epoch end
        (including on the exception path, so the last staged snapshot is
        durable when a preemption arrives as an exception rather than a
        kill)."""
        if self._manager is not None:
            self._manager.wait_until_finished()
            self._manager.close()
            self._manager = None


class BaseTrainer:
    def __init__(self, args, model, data_info, mesh=None):
        self.args = args
        self.model = model
        self.data_info = data_info
        self.mesh = mesh if mesh is not None else make_mesh(
            args.n_cudas, spatial=getattr(args, 'mesh_spatial', 1))
        # -mesh_spatial: constrain the jitted steps' image inputs to
        # (data, space) so GSPMD splits H over 'space' with conv halo
        # exchanges; batches stay DP-placed (device_put can't represent
        # the uneven 257/space split, with_sharding_constraint can).
        # Held on the TRAINER and passed explicitly to every step factory:
        # lazily-built steps can never pick up another trainer's setting,
        # even when trainers share one args namespace.
        assert (getattr(args, 'mesh_spatial', 1) <= 1
                or 'space' in self.mesh.axis_names), (
            '-mesh_spatial %d was requested but the trainer received an '
            'explicit mesh without a space axis — build it with '
            'make_mesh(n, spatial=...)' % args.mesh_spatial)
        self._spatial = (spatial_sharding(self.mesh)
                         if 'space' in self.mesh.axis_names else None)
        self._foreign_mesh_warned = False
        self.tx = steps.make_optimizer(args)
        self.state = None
        # set by the entry points on -resume -save_state -save_every; the
        # first train() consumes it (MidEpochSaver)
        self._mid_resume_pending = False

    def init_state(self, sample_inputs, rng=None):
        self.state = steps.init_state(self.model, self.args, self.tx,
                                      sample_inputs, rng)
        self.state = shard_replicated(self.mesh, self.state)
        return self.state

    def load_state(self, state):
        self.state = shard_replicated(self.mesh, state)

    def set_variables(self, variables):
        """Install converted model variables ({'params', 'batch_stats'}) into
        the (already initialized) train state."""
        self.state = self.state.replace(
            params=variables['params'],
            batch_stats=variables.get('batch_stats', self.state.batch_stats))
        self.state = shard_replicated(self.mesh, self.state)

    def get_variables(self):
        return {'params': jax.device_get(self.state.params),
                'batch_stats': jax.device_get(self.state.batch_stats)}

    def _shard(self, batch, keys):
        """Select the device-bound keys of a loader batch and place them on
        the mesh (host-only extras like back_rotation/_true_size stay out)."""
        selected = {k: batch[k] for k in keys if k in batch}
        if not self._foreign_mesh_warned:
            from jax.sharding import NamedSharding
            for v in selected.values():
                sh = getattr(v, 'sharding', None)
                if isinstance(sh, NamedSharding) and sh.mesh != self.mesh:
                    import sys
                    print('[pose_tpu] WARNING: loader batches arrive on a '
                          'mesh shaped %s but the trainer mesh is %s — '
                          'every batch pays a cross-device reshard; pass '
                          'the trainer mesh to the loader or set '
                          '-mesh_spatial consistently'
                          % (dict(sh.mesh.shape), dict(self.mesh.shape)),
                          file=sys.stderr)
                    self._foreign_mesh_warned = True
                    break
        return shard_batch(self.mesh, selected)

    @staticmethod
    def _size(batch, key):
        return batch.get('_true_size', len(batch[key]))


class RgbTrainer(BaseTrainer):
    """train.py semantics: cam_train/joint_train + cam_test/joint_test."""

    def __init__(self, args, model, data_info, mesh=None):
        super().__init__(args, model, data_info, mesh)
        self.thresh = dict(solid=args.thresh_solid, close=args.thresh_close,
                           rough=args.thresh_rough)
        key = data_info.key_index
        self._cam_step = None
        self._joint_steps = {}
        self._recon_step = None
        self._eval_step = steps.make_rgb_eval_step(
            model, args, key, spatial=self._spatial)

    def _get_cam_step(self):
        if self._cam_step is None:
            self._cam_step = steps.make_cam_train_step(
                self.model, self.args, self.data_info.key_index, self.tx,
                spatial=self._spatial)
        return self._cam_step

    def _get_joint_step(self, do_track):
        if do_track not in self._joint_steps:
            self._joint_steps[do_track] = steps.make_joint_train_step(
                self.model, self.args, self.data_info.key_index, self.tx,
                do_track, spatial=self._spatial)
        return self._joint_steps[do_track]

    def train(self, epoch, data_loader):
        lr = schedules.rgb_learn_rate(self.args, epoch)
        if self.args.joint_space:
            return self.joint_train(epoch, data_loader, lr)
        return self.cam_train(epoch, data_loader, lr)

    def cam_train(self, epoch, data_loader, lr):
        step = self._get_cam_step()
        n_batches = len(data_loader)
        freq = getattr(self.args, 'print_freq', 1)
        meter = LossMeter(('cam_loss',))
        saver = MidEpochSaver(self, epoch, data_loader, {'train': meter})

        # the consumer's float() fetch for the console line is the only
        # per-step host sync; _overlap dispatches step i+1 first, so the
        # device trains batch i+1 while the host waits on batch i's loss
        # (console text/order unchanged)
        def dispatched():
            for i, batch in enumerate(data_loader, start=saver.offset):
                b = self._size(batch, 'image')
                device_batch = self._shard(
                    batch, ('image', 'true_cam', 'true_val'))
                self.state, out = step(self.state, device_batch, lr)
                meter.add(out, b)
                saver.step_done(i)
                yield i, out

        try:
            for i, out in _overlap(dispatched()):
                if freq and i % freq == 0:
                    print('| train Epoch[%d] [%d/%d]  Loss %1.4f'
                          % (epoch, i, n_batches, float(out['cam_loss'])))
        finally:
            saver.close()
        loss_avg = meter.mean('cam_loss')
        print('\n=> train Epoch[%d]  Cam Loss: %1.4f\n' % (epoch, loss_avg))
        return dict(cam_train_loss=loss_avg)

    def joint_train(self, epoch, data_loader, lr):
        do_track = self.args.do_track and (epoch != 1)
        step = self._get_joint_step(do_track)
        n_batches = len(data_loader)
        freq = getattr(self.args, 'print_freq', 1)
        meter = LossMeter(('cam_loss', 'mat_loss', 'recon_loss'))
        saver = MidEpochSaver(self, epoch, data_loader, {'train': meter})

        def dispatched():
            for i, batch in enumerate(data_loader, start=saver.offset):
                b = self._size(batch, 'image')
                device_batch = self._shard(
                    batch, ('image', 'true_cam', 'true_val', 'true_mat',
                            'intrinsics'))
                self.state, out = step(self.state, device_batch, lr)
                meter.add(out, b)
                saver.step_done(i)
                yield i, out

        try:
            for i, out in _overlap(dispatched()):
                if freq and i % freq == 0:
                    message = ('| train Epoch[%d] [%d/%d]'
                               % (epoch, i, n_batches))
                    message += '  Cam Loss: %1.4f' % float(out['cam_loss'])
                    message += '  Mat Loss: %1.4f' % float(out['mat_loss'])
                    if do_track:
                        message += ('  Recon Loss: %1.4f'
                                    % float(out['recon_loss']))
                    print(message)
        finally:
            saver.close()
        cam_avg = meter.mean('cam_loss')
        mat_avg = meter.mean('mat_loss')
        recon_avg = meter.mean('recon_loss')
        message = ('=> train Epoch[%d]  Cam Loss: %1.4f  Mat Loss: %1.4f'
                   % (epoch, cam_avg, mat_avg))
        if do_track:
            message += '  Recon Loss: %1.4f' % recon_avg
        print('\n' + message + '\n')
        return dict(cam_train_loss=cam_avg, mat_train_loss=mat_avg,
                    recon_train_loss=recon_avg)

    def test(self, epoch, test_loader):
        if self.args.joint_space:
            return self.joint_test(epoch, test_loader)
        return self.cam_test(epoch, test_loader)

    def cam_test(self, epoch, test_loader):
        n_batches = len(test_loader)
        loss_avg, total = 0.0, 0
        cam_stats = []

        def dispatched():
            for i, batch in enumerate(test_loader):
                b = self._size(batch, 'image')
                device_batch = self._shard(
                    batch, ('image', 'true_cam', 'true_val'))
                yield i, b, batch, self._eval_step(self.state, device_batch)

        for i, b, batch, out in _overlap(dispatched()):
            out = _to_host(out)
            loss_avg += float(out['cam_loss']) * b
            total += b
            # one gather for every host-needed leaf (a per-leaf _to_host
            # would cost one collective each in cluster mode)
            host = _to_host(dict(true_val=batch['true_val'],
                                 back_rotation=batch['back_rotation'],
                                 true_cam=batch['true_cam']))
            true_val = host['true_val'].astype(bool)[:b]
            rot = host['back_rotation'][:b]
            spec_cam = back_rotate(rot, out['spec_cam'][:b])
            true_cam = back_rotate(rot, host['true_cam'][:b])
            cam_stats.append(metrics.analyze(spec_cam, true_cam, true_val,
                                             self.data_info.mirror,
                                             self.thresh))
            print('| test Epoch[%d] [%d/%d]  Cam Loss %1.4f'
                  % (epoch, i, n_batches, float(out['cam_loss'])))
        loss_avg /= max(total, 1)
        record = dict(test_loss=loss_avg)
        record.update(metrics.parse_epoch(cam_stats))
        print('\n=> test Epoch[%d]  Cam Loss: %1.4f\n' % (epoch, loss_avg))
        print('=>[SPEC] cam_mean: %1.3f  [pck]: %1.3f  [auc]: %1.3f\n'
              % (record['cam_mean'], record['score_pck'], record['score_auc']))
        return record

    def joint_test(self, epoch, test_loader):
        n_batches = len(test_loader)
        cam_avg = mat_avg = 0.0
        total = 0
        mat_stats, cam_stats, det_stats = [], [], []
        do_track = self.args.do_track
        if do_track and self._recon_step is None:
            from ..ops import recon as recon_ops
            self._recon_step = jax.jit(recon_ops.recon_root)

        def dispatched():
            for i, batch in enumerate(test_loader):
                b = self._size(batch, 'image')
                device_batch = self._shard(
                    batch, ('image', 'true_cam', 'true_val', 'true_mat',
                            'intrinsics'))
                out = self._eval_step(self.state, device_batch)
                if do_track:
                    # root reconstruction stays on device, dispatched with
                    # the step (utils.py:296-332 get_deter_cam); the solve is
                    # strictly per-row, so the loader's duplicated-last-row
                    # mesh padding just recomputes a real row — sliced off
                    # with the rest of the padding after the fetch
                    out = dict(out, deter_cam=self._recon_step(
                        out['spec_mat'], out['relat_cam'],
                        device_batch['intrinsics']))
                yield i, b, batch, out

        for i, b, batch, out in _overlap(dispatched()):
            out = _to_host(out)
            cam_loss = float(out['cam_loss'])
            mat_loss = float(out['mat_loss'])
            cam_avg += cam_loss * b
            mat_avg += mat_loss * b
            total += b
            print('| test Epoch[%d] [%d/%d]  Cam Loss: %1.4f  Mat Loss: %1.4f'
                  % (epoch, i, n_batches, cam_loss, mat_loss))

            host = _to_host(dict(true_val=batch['true_val'],
                                 back_rotation=batch['back_rotation'],
                                 true_cam=batch['true_cam'],
                                 true_mat=batch['true_mat']))
            true_val = host['true_val'].astype(bool)[:b]
            spec_mat = out['spec_mat'][:b]
            true_mat = host['true_mat'][:b]
            mat_stats.append(metrics.analyze_mat(spec_mat, true_mat, true_val,
                                                 self.args.side_in))

            rot = host['back_rotation'][:b]
            spec_cam = back_rotate(rot, out['spec_cam'][:b])
            true_cam = back_rotate(rot, host['true_cam'][:b])
            cam_stats.append(metrics.analyze(spec_cam, true_cam, true_val,
                                             self.data_info.mirror,
                                             self.thresh))

            if do_track:
                deter = back_rotate(rot, out['deter_cam'][:b])
                det_stats.append(metrics.analyze(deter, true_cam, true_val,
                                                 self.data_info.mirror,
                                                 self.thresh))

        cam_avg /= max(total, 1)
        mat_avg /= max(total, 1)
        record = dict(cam_test_loss=cam_avg, mat_test_loss=mat_avg)
        record.update(metrics.parse_epoch_mat(mat_stats))
        record.update(metrics.parse_epoch(cam_stats))
        print('\n=> test Epoch[%d]  Cam Loss: %1.4f  Mat Loss: %1.4f\n'
              % (epoch, cam_avg, mat_avg))
        print('=> mat_mean: %1.3f  [oks]: %1.3f\n'
              % (record['mat_mean'], record['score_oks']))
        print('=>[SPEC] cam_mean: %1.3f  [pck]: %1.3f  [auc]: %1.3f\n'
              % (record['cam_mean'], record['score_pck'], record['score_auc']))
        if self.args.do_track:
            track_rec = metrics.parse_epoch(det_stats)
            print('=>[DETER] cam_mean: %1.3f  [pck]: %1.3f  [auc]: %1.3f\n'
                  % (track_rec['cam_mean'], track_rec['score_pck'],
                     track_rec['score_auc']))
            for key in track_rec:
                record['recon_' + key] = track_rec[key]
        return record
