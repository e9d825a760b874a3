"""Depth/fusion/distillation engine module shim (reference: depth_train.py)."""

import importlib

from pose_tpu.train.depth_engine import (DepthTrainer as Trainer,  # noqa: F401
                                         load_metadata)
from pose_tpu.train.schedules import (depth_learn_rate as adapt_learn_rate,  # noqa: F401
                                      dist_weight as get_dist_weight)


def get_loader(args):
    """metadata.json names the loader module (depth_train.py:15-19)."""
    metadata = load_metadata(args)
    return importlib.import_module(metadata['loader'][args.data_name])


def to_test_worker(test_loader, no_depth, depth_only):
    """Adapt no-depth datasets for the vanilla test loop
    (depth_train.py:28-37); our loaders yield dict batches, so this selects
    the input modality per batch."""
    for batch in test_loader:
        if no_depth:
            in_image = batch.get('image', batch.get('color'))
        else:
            in_image = batch['depth'] if depth_only else batch['color']
        yield dict(batch, in_image=in_image)
