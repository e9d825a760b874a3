from . import losses, schedules, steps
from .depth_engine import DepthTrainer
from .engine import JointInfo, RgbTrainer
from .logger import Logger
