from yolo_dual_tpu.metrics.ap import (  # noqa: F401
    ap_per_class,
    compute_ap,
    fitness,
    ConfusionMatrix,
)
from yolo_dual_tpu.metrics.seg import (  # noqa: F401
    ap_per_class_box_and_mask,
    Metric,
    Metrics,
    fitness_seg,
    SegmentationConfusionMatrix,
)
