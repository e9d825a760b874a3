from . import backproject, dataset_build, depth_build, detector, video
