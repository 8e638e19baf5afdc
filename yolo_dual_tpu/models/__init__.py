from yolo_dual_tpu.models.model import (  # noqa: F401
    DetectionModel,
    SegmentationModel,
    SemanticSegModel,
    ClassificationModel,
    build_model,
)
