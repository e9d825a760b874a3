"""Multi-dataset mixed training (BASELINE.json config 5: CMU + NTU + PKU
with full on-device augmentation at pod-slice scale).

The reference has no mixed-dataset runtime — its multi-dataset support is
one-dataset-per-run plus the semi-supervised PKU side loader
(depth_train.py:67-71). Here MixedLoader interleaves several dataset loaders
batch-wise with probabilities proportional to their sizes, so a single mesh
sees a stream of identically-shaped batches; per-sample enhance thresholds
already ride inside the depth batches (pose_tpu.data.augment
.process_depth_batch), so NTU and PKU samples can share a batch stream.
"""

import numpy as np


class MixedLoader:
    """Round-robin-with-weights interleave of several loaders.

    All loaders must produce identically-shaped batches (same side_in,
    num_joints, modalities). One epoch = every member epoch exhausted once.
    """

    def __init__(self, loaders, seed=0):
        assert loaders
        self.loaders = list(loaders)
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return sum(len(loader) for loader in self.loaders)

    def set_epoch(self, epoch):
        self.epoch = epoch
        for loader in self.loaders:
            if hasattr(loader, 'set_epoch'):
                loader.set_epoch(epoch)

    def __iter__(self):
        iters = [iter(loader) for loader in self.loaders]
        remaining = [len(loader) for loader in self.loaders]
        rng = np.random.RandomState(self.seed + self.epoch)
        while sum(remaining) > 0:
            weights = np.asarray(remaining, np.float64)
            idx = rng.choice(len(iters), p=weights / weights.sum())
            try:
                batch = next(iters[idx])
            except StopIteration:
                remaining[idx] = 0
                continue
            remaining[idx] = max(0, remaining[idx] - 1)
            batch['_dataset'] = idx
            yield batch
        self.epoch += 1


def build_mixed_loader(args, phase, data_info, data_names, metadata_path=None,
                       **kwargs):
    """Construct per-dataset loaders (rgb or depth, by metadata no_depth
    flag) and interleave them."""
    import copy
    import json

    from .loader import DepthPoseLoader, PoseLoader

    with open(metadata_path or args.metadata_path) as f:
        metadata = json.load(f)

    loaders = []
    for name in data_names:
        sub_args = copy.copy(args)
        sub_args.data_name = name
        no_depth = metadata['no_depth'].get(name, True)
        cls = PoseLoader if no_depth else DepthPoseLoader
        loaders.append(cls(sub_args, phase, data_info, **kwargs))
    return MixedLoader(loaders, seed=getattr(args, 'seed', 0))
