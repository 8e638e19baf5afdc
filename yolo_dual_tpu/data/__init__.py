from yolo_dual_tpu.data.dataset import YoloDataset, create_dataloader  # noqa: F401
from yolo_dual_tpu.data.json_dataset import (  # noqa: F401
    JSONSegmentDataset,
    create_json_segment_dataloader,
    mask_to_json,
    batch_convert_masks_to_json,
    verify_json_masks,
)
from yolo_dual_tpu.data.loader import Loader  # noqa: F401
