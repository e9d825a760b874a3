"""Module shim: `import log` / `log.Logger` as in the reference entry points
(depth_main.py:2). Implementation: pose_tpu.train.logger."""

from pose_tpu.train.logger import Logger  # noqa: F401
