from yolo_dual_tpu.kernels.dcn_sampling import dcnv3_core_pallas  # noqa: F401
from yolo_dual_tpu.kernels.preprocess import letterbox_normalize  # noqa: F401
