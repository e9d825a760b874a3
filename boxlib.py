"""Module-path shim for reference pickles/tools; see pose_tpu.geometry.boxlib."""

from pose_tpu.geometry.boxlib import *          # noqa: F401,F403
