"""pose_tpu — TPU-native privileged-information 3D pose estimation framework.

A ground-up JAX/Flax/Pallas/pjit rebuild of the capabilities of
Hunger-Prevails/3D-Pose-Estimation-with-Previleged-Information:

- geometry: pinhole + OpenCV-distortion camera model, virtual-crop-camera
  synthesis, bounding boxes (reference: cameralib.py, boxlib.py)
- ops: on-device homography warp, photometric augmentation, occluder pasting,
  volumetric soft-argmax decode, least-squares root reconstruction,
  mask-propagating partial convolution (reference: augment_colour.py,
  augment_occluder.py, utils.py, mat_utils.py, partial_conv.py)
- models: configurable Flax ResNet trunks covering the RGB, depth-only,
  fusion and partial-conv model families (reference: resnet.py, depthnet.py,
  fusionnet.py, partial_depthnet.py, partial_fusionnet.py)
- train: jitted training engines with bf16 mixed precision, distillation,
  LR schedules and metrics (reference: train.py, depth_train.py)
- parallel: device-mesh data parallelism via jax.sharding (replaces
  nn.DataParallel, reference: main.py:66)
"""

__version__ = "0.1.0"
