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
    num_joints, modalities) — datasets with different skeletons need a
    shared joint mapping at dataset-build time before they can share a
    stream. One epoch = every member epoch exhausted once.
    """

    def __init__(self, loaders, seed=0, normalize_rgb_key=False):
        assert loaders
        self.loaders = list(loaders)
        self.seed = seed
        self.epoch = 0
        # -save_every mid-epoch resume (engine.MidEpochSaver): one-shot
        # fast-forward, see __iter__
        self.start_batch = 0
        # when RGB-only and depth loaders are mixed, rename the RGB
        # stream's 'image' key to 'color' so the batch schema is uniform
        # (the depth-family trainers consume 'color')
        self.normalize_rgb_key = normalize_rgb_key

    def __len__(self):
        return sum(len(loader) for loader in self.loaders)

    def set_epoch(self, epoch):
        self.epoch = epoch
        for loader in self.loaders:
            if hasattr(loader, 'set_epoch'):
                loader.set_epoch(epoch)

    @staticmethod
    def _draw(rng, est, alive):
        """ONE interleave slot: weighted member choice + est bookkeeping.
        Shared by the live loop and the fast-forward simulation — resume
        correctness requires both to burn identical rng draws with
        identical weights, so the logic must not exist twice."""
        weights = np.asarray(
            [(max(e, 1e-9) if a else 0.0) for e, a in zip(est, alive)],
            np.float64)
        idx = rng.choice(len(est), p=weights / weights.sum())
        est[idx] = max(est[idx] - 1, 0)
        return idx

    def __iter__(self):
        n = len(self.loaders)
        lens = [len(loader) for loader in self.loaders]
        est = list(lens)
        rng = np.random.RandomState(self.seed + self.epoch)

        # mid-epoch fast-forward: the which-member-per-slot sequence
        # depends only on (seed, epoch, member lengths) — never on batch
        # contents — so the first `start` slots can be SIMULATED (burning
        # the same rng draws and the same est bookkeeping as the real
        # loop) and each member told how many of its batches were already
        # consumed. Members then fast-forward via their own start_batch
        # (no decode, indices preserved), and the interleave continues
        # with the rng positioned exactly where the uninterrupted epoch
        # would have it.
        start = self.start_batch
        self.start_batch = 0
        if start:
            consumed = [0] * n
            alive = [m > 0 for m in lens]
            for _ in range(start):
                idx = self._draw(rng, est, alive)
                consumed[idx] += 1
                if consumed[idx] >= lens[idx]:
                    alive[idx] = False
            for loader, done in zip(self.loaders, consumed):
                loader.start_batch = done

        # one-batch lookahead so every member generator runs to actual
        # StopIteration: that is what executes the member's own
        # end-of-epoch bookkeeping (PoseLoader's `epoch += 1`) and lets
        # its producer threads exit. Counting batches and abandoning the
        # suspended generator would silently replay identical shuffle
        # orders/augmentation draws every epoch and leak blocked
        # producer threads per member per epoch.
        iters = [iter(loader) for loader in self.loaders]
        heads = []
        for it in iters:
            try:
                heads.append(next(it))
            except StopIteration:
                heads.append(None)
        while any(h is not None for h in heads):
            idx = self._draw(rng, est, [h is not None for h in heads])
            batch = heads[idx]
            try:
                heads[idx] = next(iters[idx])
            except StopIteration:
                heads[idx] = None
            if self.normalize_rgb_key and 'image' in batch:
                batch['color'] = batch.pop('image')
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
    kinds = set()
    for name in data_names:
        sub_args = copy.copy(args)
        sub_args.data_name = name
        # hard index, matching the engines' dispatch — a dataset missing
        # from the metadata must fail here, not silently get the RGB class
        no_depth = metadata['no_depth'][name]
        kinds.add(no_depth)
        cls = PoseLoader if no_depth else DepthPoseLoader
        loaders.append(cls(sub_args, phase, data_info, **kwargs))
    return MixedLoader(loaders, seed=getattr(args, 'seed', 0),
                       normalize_rgb_key=len(kinds) > 1)
