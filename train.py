"""RGB training-engine module shim (reference: train.py). `Trainer` is the
jitted-step engine (pose_tpu.train.engine.RgbTrainer) with the reference's
.train(epoch, loader)/.test(epoch, loader) surface."""

from pose_tpu.train.engine import RgbTrainer as Trainer  # noqa: F401
from pose_tpu.train.schedules import rgb_learn_rate as adapt_learn_rate  # noqa: F401
