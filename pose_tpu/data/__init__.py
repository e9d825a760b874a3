from . import augment, crop, samples, synthetic
from .loader import (DepthPoseLoader, PoseLoader, data_loader,
                     depth_data_loader)
