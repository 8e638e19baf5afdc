from yolo_dual_tpu.io.torch_import import (  # noqa: F401
    import_torch_state_dict,
    load_torch_checkpoint,
)
from yolo_dual_tpu.io.ensemble import Ensemble, attempt_load  # noqa: F401
from yolo_dual_tpu.io.multibackend import MultiBackend, detect_kind  # noqa: F401
from yolo_dual_tpu.io.remote import RemoteModel  # noqa: F401
