"""yolo_dual_tpu — TPU-native dual-task vision framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Z1HaoC/YOLO-Dual
(a YOLOv5-v7.0-derived dual-task framework): YAML-compiled detection /
instance-segmentation / semantic-segmentation / classification models,
device-side data pipeline, fixed-shape NMS + mask post-processing, and a
pjit/sharding-based scale-out story.

Layout
------
- ``yolo_dual_tpu.nn``       Flax module zoo (Conv/C3/C2f/SPPF/attention/DCN/...)
- ``yolo_dual_tpu.models``   YAML graph compiler + Detect/Segment heads + model wrappers
- ``yolo_dual_tpu.ops``      jitted post-processing (boxes, NMS, masks, preprocessing)
- ``yolo_dual_tpu.kernels``  Pallas TPU kernels (deformable sampling, fused preproc)
- ``yolo_dual_tpu.losses``   detection / instance-seg / semantic-seg / OTA losses
- ``yolo_dual_tpu.data``     datasets and host->device input pipeline
- ``yolo_dual_tpu.train``    trainer, optimizer groups, EMA, checkpointing
- ``yolo_dual_tpu.metrics``  mAP / mIoU evaluators
- ``yolo_dual_tpu.parallel`` mesh + sharding helpers
"""

__version__ = "0.1.0"
