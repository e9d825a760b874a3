"""Epoch-indexed learning-rate schedules (host-side scalars fed to the jitted
steps).

- rgb_learn_rate: piecewise 1 / 0.2 / 0.04 at 60% / 90% of epochs, halved
  under -do_track from epoch 2 (train.py:380-392).
- depth_learn_rate: warmup factor then decay steps at epochs 15/20/25
  (depth_train.py:621-638).
- dist_weight: alpha linearly annealed alpha_init -> alpha_dest over
  alpha_span epochs (depth_train.py:641-647).
"""

import numpy as np


def rgb_learn_rate(args, epoch):
    if epoch - 1 < args.n_epochs * 0.6:
        learn_rate = args.learn_rate
    elif epoch - 1 < args.n_epochs * 0.9:
        learn_rate = args.learn_rate * 0.2
    else:
        learn_rate = args.learn_rate * 0.04
    if args.do_track and epoch != 1:
        learn_rate /= 2
    return learn_rate


def depth_learn_rate(args, epoch):
    if epoch - 1 < args.warmup:
        return args.learn_rate * args.warmup_factor
    if epoch - 1 < 15:
        return args.learn_rate
    if epoch - 1 < 20:
        return args.learn_rate * args.learn_decay
    if epoch - 1 < 25:
        return args.learn_rate * args.learn_decay ** 2
    return args.learn_rate * args.learn_decay ** 3


def dist_weight(args, epoch):
    alphas = np.linspace(args.alpha_init, args.alpha_dest, args.alpha_span)
    if epoch - 1 < args.alpha_span:
        return float(alphas[epoch - 1])
    return float(args.alpha_dest)
