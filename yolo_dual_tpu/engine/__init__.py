from yolo_dual_tpu.engine.validator import evaluate_segment, evaluate_semantic  # noqa: F401
from yolo_dual_tpu.engine.predictor import predict_images  # noqa: F401
from yolo_dual_tpu.engine.autoshape import AutoShape, Detections  # noqa: F401
