from yolo_dual_tpu.nn import common  # noqa: F401
