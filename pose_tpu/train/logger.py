"""Checkpoint/record logger matching the reference's log.Logger semantics
(log.py:5-81): per-epoch `model_<E>.pth` files holding {'state', 'model'},
a `best.pth` pointer tracked by auc+pck sum, and an appended
`train_record.pth` history under -save_record.

Checkpoints store the model as a torch-style state_dict (numpy tensors under
the reference's key names, via models.convert) saved with torch.save, so
reference-side tooling can read them and -teacher_path / -host_path /
-resume accept files from either implementation.
"""

import os

from ..models.convert import (load_torch_file, save_torch_file,
                              variables_to_torch_state)
from ..parallel import is_main_process


class Logger:
    def __init__(self, args, state):
        self.state = state if state else dict(best_auc=0, best_pck=0,
                                              best_epoch=0, epoch=0)

        if not os.path.exists(args.save_path):
            os.makedirs(args.save_path, exist_ok=True)

        self.save_path = os.path.join(args.save_path,
                                      args.model + '-' + args.suffix)
        if not os.path.exists(self.save_path):
            os.makedirs(self.save_path, exist_ok=True)

        assert args.save_record != (args.test_only or args.val_only)
        self.save_record = args.save_record

        record_path = os.path.join(self.save_path, 'train_record.pth')
        self.train_record = (load_torch_file(record_path)
                             if args.resume and os.path.exists(record_path)
                             else None)

    def record(self, epoch, train_recs, test_recs, variables):
        """variables: the model's flax variables pytree
        ({'params': ..., 'batch_stats': ...})."""
        if not is_main_process():
            # multi-host runs: params are replicated, so only process 0
            # writes checkpoints/records (the paths would collide on a
            # shared filesystem)
            return
        self.state['epoch'] = epoch

        if train_recs:
            model_file = os.path.join(self.save_path, 'model_%d.pth' % epoch)
            checkpoint = dict(state=self.state,
                              model=variables_to_torch_state(variables))
            save_torch_file(checkpoint, model_file)

        if test_recs:
            score_sum = test_recs['score_auc'] + test_recs['score_pck']
            best_sum = self.state['best_auc'] + self.state['best_pck']
            if score_sum > best_sum:
                self.state['best_epoch'] = epoch
                self.state['best_auc'] = test_recs['score_auc']
                self.state['best_pck'] = test_recs['score_pck']
                save_torch_file({'best': epoch},
                                os.path.join(self.save_path, 'best.pth'))

        train_recs.update(test_recs)

        if self.save_record:
            if self.train_record:
                keys = [key for key in train_recs]
                records = [self.train_record[key] + [train_recs[key]]
                           for key in train_recs]
                self.train_record = dict(zip(keys, records))
            else:
                keys = [key for key in train_recs]
                records = [[train_recs[key]] for key in train_recs]
                self.train_record = dict(zip(keys, records))

            record_path = os.path.join(self.save_path, 'train_record.pth')
            save_torch_file(self.train_record, record_path)
            print('- train record saved to', record_path, '\n')

    def final_print(self):
        print('[=] Best:  epoch: {:3d}  auc: {:6.3f}  pck: {:6.3f}'.format(
            self.state['best_epoch'], self.state['best_auc'],
            self.state['best_pck']))

    def print_rec(self, record):
        for key, value in record.items():
            print('{:>9}'.format(key) + ':', '{:.4f}'.format(value))
