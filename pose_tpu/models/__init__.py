from .resnet import PoseResNet, build_model, stage_schedule
