"""Depth/fusion/distillation training engine (reference: depth_train.py).

Three train modes dispatched by flags (depth_train.py:465-474): vanilla
(single modality), fusion (two-input model), distill (frozen teacher +
feature distillation, optional semi-supervised extra batches). Metric
thresholds and the no-depth flag come from the machine-local metadata.json
(depth_train.py:58-62); -save_last dumps last-stage features and predictions
per batch (utils.py:45-65).
"""

import json
import os

import numpy as np

import jax

from .. import metrics
from . import schedules, steps
from ..parallel import is_main_process
from .engine import (BaseTrainer, LossMeter, MidEpochSaver, _overlap,
                     _to_host, back_rotate)


def load_metadata(args):
    with open(args.metadata_path) as file:
        return json.load(file)


def save_array(array, i_batch, last_path):
    """utils.save_array (utils.py:45-52)."""
    save_file = os.path.join(last_path, 'batch_' + str(i_batch) + '_spec.npy')
    if os.path.exists(save_file):
        return
    with open(save_file, 'wb') as file:
        np.save(file, array)


def save_tensor(tensor, i_batch, last_path):
    """utils.save_tensor (utils.py:55-65)."""
    if not os.path.exists(last_path):
        os.makedirs(last_path, exist_ok=True)
    save_file = os.path.join(last_path, 'batch_' + str(i_batch) + '.npy')
    if os.path.exists(save_file):
        return
    with open(save_file, 'wb') as file:
        np.save(file, np.asarray(tensor))


class DepthTrainer(BaseTrainer):
    def __init__(self, args, model, data_info, mesh=None):
        super().__init__(args, model, data_info, mesh)

        metadata = load_metadata(args)
        self.no_depth = metadata['no_depth'][args.data_name]
        self.thresh = metadata['thresholds'][args.data_name]

        self.save_last = args.save_last
        root_me = os.path.dirname(args.metadata_path)
        self.last_path = os.path.join(root_me, 'last_' + args.data_name,
                                      args.suffix)

        self.teacher = None
        self.teacher_vars = None
        self.semi_loader = None
        self.semi_worker = None

        key = data_info.key_index
        self._vanilla_step = None
        self._fusion_step = None
        self._distill_step = None
        self._eval_step = steps.make_depth_eval_step(
            model, args, key, fusion=args.do_fusion and not args.do_teach,
            spatial=self._spatial)

    def set_teacher(self, teacher, teacher_vars):
        self.teacher = teacher
        self.teacher_vars = teacher_vars

    def set_semi_loader(self, loader):
        self.semi_loader = loader
        self.semi_worker = iter(loader)
        self._semi_pulled = 0   # batches consumed in the current cycle

    def _next_semi_batch(self):
        try:
            batch = next(self.semi_worker)
        except StopIteration:
            self.semi_worker = iter(self.semi_loader)
            self._semi_pulled = 0
            batch = next(self.semi_worker)
        self._semi_pulled += 1
        return batch

    # --- -save_every: the semi stream's position is part of the mid-epoch
    # continuation record; restore replays it via loader fast-forward
    def _get_semi_pos(self):
        return dict(epoch=np.int64(self.semi_loader.epoch),
                    pulled=np.int64(self._semi_pulled))

    def _set_semi_pos(self, pos):
        self.semi_loader.set_epoch(int(pos['epoch']))
        self.semi_loader.start_batch = int(pos['pulled'])
        self.semi_worker = iter(self.semi_loader)
        self._semi_pulled = int(pos['pulled'])

    # ------------------------------------------------------------- training

    def train(self, epoch, data_loader):
        lr = schedules.depth_learn_rate(self.args, epoch)
        if self.args.do_teach:
            return self.distill_train(epoch, data_loader, lr)
        if self.args.do_fusion:
            return self.fusion_train(epoch, data_loader, lr)
        return self.vanilla_train(epoch, data_loader, lr)

    def vanilla_train(self, epoch, data_loader, lr):
        if self._vanilla_step is None:
            self._vanilla_step = steps.make_vanilla_train_step(
                self.model, self.args, self.data_info.key_index, self.tx,
                spatial=self._spatial)
        n_batches = len(data_loader)
        freq = getattr(self.args, 'print_freq', 1)
        meter = LossMeter(('cam_loss',))
        saver = MidEpochSaver(self, epoch, data_loader, {'train': meter})

        # delayed console print: step i+1 dispatches before batch i's
        # float() fetch (engine._overlap), keeping the device busy across
        # the per-line host sync; console text/order unchanged
        def dispatched():
            for i_batch, batch in enumerate(data_loader, start=saver.offset):
                in_image = (batch['depth'] if self.args.depth_only
                            else batch['color'])
                device_batch = dict(in_image=in_image,
                                    true_cam=batch['true_cam'],
                                    true_val=batch['true_val'])
                b = self._size(batch, 'color')
                self.state, out = self._vanilla_step(
                    self.state,
                    self._shard(device_batch, device_batch.keys()), lr)
                meter.add(out, b)
                saver.step_done(i_batch)
                yield i_batch, out

        try:
            for i_batch, out in _overlap(dispatched()):
                if freq and i_batch % freq == 0:
                    print('| train Epoch[%d] [%d/%d]  Loss %1.4f'
                          % (epoch, i_batch, n_batches,
                             float(out['cam_loss'])), flush=True)
        finally:
            saver.close()
        loss_avg = meter.mean('cam_loss')
        print('\n=> train Epoch[%d]  Cam Loss: %1.4f\n' % (epoch, loss_avg))
        return dict(cam_train_loss=loss_avg)

    def fusion_train(self, epoch, data_loader, lr):
        if self._fusion_step is None:
            self._fusion_step = steps.make_fusion_train_step(
                self.model, self.args, self.data_info.key_index, self.tx,
                spatial=self._spatial)
        n_batches = len(data_loader)
        freq = getattr(self.args, 'print_freq', 1)
        meter = LossMeter(('cam_loss',))
        saver = MidEpochSaver(self, epoch, data_loader, {'train': meter})

        def dispatched():
            for i_batch, batch in enumerate(data_loader, start=saver.offset):
                device_batch = dict(color=batch['color'],
                                    depth=batch['depth'],
                                    true_cam=batch['true_cam'],
                                    true_val=batch['true_val'])
                b = self._size(batch, 'color')
                self.state, out = self._fusion_step(
                    self.state,
                    self._shard(device_batch, device_batch.keys()), lr)
                meter.add(out, b)
                saver.step_done(i_batch)
                yield i_batch, out

        try:
            for i_batch, out in _overlap(dispatched()):
                if freq and i_batch % freq == 0:
                    print('| train Epoch[%d] [%d/%d]  Loss %1.4f'
                          % (epoch, i_batch, n_batches,
                             float(out['cam_loss'])))
        finally:
            saver.close()
        loss_avg = meter.mean('cam_loss')
        print('\n=> train Epoch[%d]  Cam Loss: %1.4f\n' % (epoch, loss_avg))
        return dict(cam_train_loss=loss_avg)

    def distill_train(self, epoch, data_loader, lr):
        if self._distill_step is None:
            self._distill_step = steps.make_distill_train_step(
                self.model, self.teacher, self.args,
                self.data_info.key_index, self.tx,
                teacher_is_fusion=self.args.do_fusion,
                with_semi=self.args.semi_teach, spatial=self._spatial)
        alpha = schedules.dist_weight(self.args, epoch)
        print('\n=> alpha value: {:.2f}'.format(alpha))

        n_batches = len(data_loader)
        freq = getattr(self.args, 'print_freq', 1)
        cam_meter = LossMeter(('cam_loss',))
        dist_meter = LossMeter(('dist_loss',))
        # the teacher's BN stats drift with every step (no -do_freeze) and
        # the semi stream has its own position — both are part of the
        # mid-epoch continuation record
        from ..parallel import shard_replicated
        extra = {'teacher_vars': (
            lambda: self.teacher_vars,
            lambda v: setattr(self, 'teacher_vars',
                              shard_replicated(self.mesh, v)))}
        if self.args.semi_teach:
            extra['semi_pos'] = (self._get_semi_pos, self._set_semi_pos)
        saver = MidEpochSaver(self, epoch, data_loader,
                              {'cam': cam_meter, 'dist': dist_meter}, extra)

        def dispatched():
            for i_batch, batch in enumerate(data_loader, start=saver.offset):
                full_batch = self._size(batch, 'color')
                device_batch = dict(color=batch['color'],
                                    depth=batch['depth'],
                                    true_cam=batch['true_cam'],
                                    true_val=batch['true_val'],
                                    atten_map=batch['atten_map'])
                sharded = self._shard(device_batch, device_batch.keys())
                if self.args.semi_teach:
                    semi = self._next_semi_batch()
                    semi_batch = semi.get('_true_size', len(semi['color']))
                    semi_device = dict(color=semi['color'],
                                       depth=semi['depth'],
                                       atten_map=semi['atten_map'])
                    self.state, self.teacher_vars, out = self._distill_step(
                        self.state, self.teacher_vars, sharded, lr, alpha,
                        self._shard(semi_device, semi_device.keys()))
                else:
                    self.state, self.teacher_vars, out = self._distill_step(
                        self.state, self.teacher_vars, sharded, lr, alpha)

                cam_meter.add(out, full_batch)
                dist_meter.add({'dist_loss': out['dist_loss']}, full_batch)
                if self.args.semi_teach:
                    dist_meter.add({'dist_loss': out['semi_loss']},
                                   semi_batch)
                saver.step_done(i_batch)
                yield i_batch, out

        try:
            for i_batch, out in _overlap(dispatched()):
                if freq and i_batch % freq == 0:
                    message = '[=] train Epoch[{0}] Batch[{1}|{2}] '.format(
                        epoch, i_batch, n_batches)
                    message += ' Cam Loss {:.4f} '.format(
                        float(out['cam_loss']))
                    message += ' Dist Loss {:.4f} '.format(
                        float(out['dist_loss']))
                    if self.args.semi_teach:
                        message += ' Semi Loss {:.4f}'.format(
                            float(out['semi_loss']))
                    print(message)
        finally:
            saver.close()

        cam_loss_sum = cam_meter.mean('cam_loss')
        dist_loss_sum = dist_meter.mean('dist_loss')
        print('\n=> train Epoch[%d]  Cam Loss: %1.4f  Dist Loss: %1.4f\n\n'
              % (epoch, cam_loss_sum, dist_loss_sum))
        return dict(dist_train_loss=dist_loss_sum, cam_train_loss=cam_loss_sum)

    # ------------------------------------------------------------ evaluation

    def test(self, epoch, test_loader):
        if self.args.do_fusion and not self.args.do_teach:
            return self.fusion_test(epoch, test_loader)
        return self.vanilla_test(epoch, test_loader)

    def _eval_batches(self, test_loader, fusion):
        """Yield (size, device_batch, host_batch) adapting no-depth datasets
        (depth_train.py:28-37)."""
        for batch in test_loader:
            if fusion:
                device_batch = dict(color=batch['color'],
                                    depth=batch['depth'],
                                    true_cam=batch['true_cam'],
                                    true_val=batch['true_val'])
                size = self._size(batch, 'color')
            else:
                if self.no_depth:
                    in_image = batch['image' if 'image' in batch else 'color']
                else:
                    # under distillation the student always consumes the
                    # RGB stream (depth_train.py:193); -depth_only shapes
                    # the teacher only, so eval must feed the student
                    # colour too (the reference's -do_teach -depth_only
                    # combination is a latent crash, adjudicated here)
                    use_depth = (self.args.depth_only
                                 and not getattr(self.args, 'do_teach',
                                                 False))
                    in_image = (batch['depth'] if use_depth
                                else batch['color'])
                device_batch = dict(in_image=in_image,
                                    true_cam=batch['true_cam'],
                                    true_val=batch['true_val'])
                size = self._size(batch, 'color' if 'color' in batch
                                  else 'image')
            yield size, device_batch, batch

    def _test_loop(self, epoch, test_loader, fusion):
        n_batches = len(test_loader)
        loss_avg, total = 0.0, 0
        cam_stats = []

        def dispatched():
            for i_batch, (b, device_batch, host_batch) in enumerate(
                    self._eval_batches(test_loader, fusion)):
                out = self._eval_step(self.state,
                                      self._shard(device_batch,
                                                  device_batch.keys()))
                if not self.save_last:
                    # last_feat is a full feature map per batch; don't pay
                    # the device->host transfer unless -save_last writes it
                    out = {k: v for k, v in out.items() if k != 'last_feat'}
                yield i_batch, b, host_batch, out

        for i_batch, b, host_batch, out in _overlap(dispatched()):
            out = _to_host(out)
            loss = float(out['cam_loss'])
            loss_avg += loss * b
            total += b

            # one gather for every host-needed leaf (a per-leaf
            # _to_host would cost one collective each in cluster mode)
            host = _to_host(dict(true_val=host_batch['true_val'],
                                 back_rotation=host_batch['back_rotation'],
                                 true_cam=host_batch['true_cam']))
            true_val = host['true_val'].astype(bool)[:b]
            color_br = host['back_rotation'][:b]
            spec_cam = back_rotate(color_br, out['spec_cam'][:b])
            true_cam = back_rotate(color_br, host['true_cam'][:b])
            if self.save_last and is_main_process():
                # rank-0 gated like Logger.record: in cluster mode every
                # process holds the identical gathered arrays and the dump
                # paths would collide on a shared filesystem
                os.makedirs(self.last_path, exist_ok=True)
                save_array(spec_cam, i_batch, self.last_path)
                # slice away mesh-padding rows so the feature dump stays
                # row-aligned with the spec_cam dump
                save_tensor(out['last_feat'][:b], i_batch, self.last_path)
            cam_stats.append(metrics.analyze(spec_cam, true_cam, true_val,
                                             self.data_info.mirror,
                                             self.thresh))
            print('| test Epoch[%d] [%d/%d]  Cam Loss %1.4f'
                  % (epoch, i_batch, n_batches, loss))
        loss_avg /= max(total, 1)
        record = dict(test_loss=loss_avg)
        record.update(metrics.parse_epoch(cam_stats))
        print('\n=> test Epoch[%d]  Cam Loss: %1.4f\n' % (epoch, loss_avg))
        print('=>[SPEC] cam_mean: %1.3f  [pck]: %1.3f  [auc]: %1.3f\n'
              % (record['cam_mean'], record['score_pck'], record['score_auc']))
        return record

    def fusion_test(self, epoch, test_loader):
        return self._test_loop(epoch, test_loader, fusion=True)

    def vanilla_test(self, epoch, test_loader):
        return self._test_loop(epoch, test_loader, fusion=False)
