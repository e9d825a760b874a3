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
        self.state = state or dict(
            best_auc=0, best_pck=0, best_epoch=0, epoch=0)

        run_dir = os.path.join(args.save_path, f'{args.model}-{args.suffix}')
        os.makedirs(run_dir, exist_ok=True)
        self.save_path = run_dir
        self.record_path = os.path.join(run_dir, 'train_record.pth')

        # -save_record and -test_only/-val_only are mutually exclusive, and
        # exactly one must be set (reference log.py:20)
        assert args.save_record != (args.test_only or args.val_only)
        self.save_record = args.save_record

        self.train_record = None
        if args.resume and os.path.exists(self.record_path):
            self.train_record = load_torch_file(self.record_path)

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
            save_torch_file(
                dict(state=self.state,
                     model=variables_to_torch_state(variables)),
                os.path.join(self.save_path, 'model_%d.pth' % epoch))

        if test_recs and self._improves_best(test_recs):
            self.state.update(best_epoch=epoch,
                              best_auc=test_recs['score_auc'],
                              best_pck=test_recs['score_pck'])
            save_torch_file({'best': epoch},
                            os.path.join(self.save_path, 'best.pth'))

        train_recs.update(test_recs)

        if self.save_record:
            # append this epoch's scalars to the per-key history lists
            history = self.train_record or {}
            self.train_record = {
                name: history.get(name, []) + [value]
                for name, value in train_recs.items()}
            save_torch_file(self.train_record, self.record_path)
            print('- train record saved to', self.record_path, '\n')

    def _improves_best(self, test_recs):
        cur = test_recs['score_auc'] + test_recs['score_pck']
        return cur > self.state['best_auc'] + self.state['best_pck']

    def final_print(self):
        print('[=] Best:  epoch: {:3d}  auc: {:6.3f}  pck: {:6.3f}'.format(
            self.state['best_epoch'], self.state['best_auc'],
            self.state['best_pck']))

    def print_rec(self, record):
        for name, value in record.items():
            print(f'{name:>9}: {value:.4f}')
