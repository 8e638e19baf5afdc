from yolo_dual_tpu.kernels.dcn_sampling import (  # noqa: F401
    dcnv3_core_pallas,
    dcnv3_sampling,
    use_pallas,
)
from yolo_dual_tpu.kernels.preprocess import (  # noqa: F401
    letterbox_normalize,
    semantic_preprocess,
)
