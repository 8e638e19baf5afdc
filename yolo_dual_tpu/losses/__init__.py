from yolo_dual_tpu.losses.semantic import (  # noqa: F401
    SemanticSegLoss,
    seg_labels_to_class_weights,
    parse_class_weights,
)
from yolo_dual_tpu.losses.detect import ComputeLoss, smooth_bce  # noqa: F401
from yolo_dual_tpu.losses.segment import ComputeSegmentLoss  # noqa: F401
from yolo_dual_tpu.losses.ota import ComputeLossOTA, ComputeLossAuxOTA  # noqa: F401
