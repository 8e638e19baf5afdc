from yolo_dual_tpu.ops.boxes import (  # noqa: F401
    bbox_iou,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
)
from yolo_dual_tpu.ops.nms import non_max_suppression, nms_padded, soft_nms_padded  # noqa: F401
from yolo_dual_tpu.ops.mask_ops import (  # noqa: F401
    crop_mask,
    mask_iou,
    masks_iou,
    process_mask,
    process_mask_upsample,
    scale_image,
)
