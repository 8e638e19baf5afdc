from yolo_dual_tpu.train.optim import smart_optimizer, build_lr_schedule, freeze_layers  # noqa: F401
from yolo_dual_tpu.train.ema import ModelEMA  # noqa: F401
from yolo_dual_tpu.train.trainer import Trainer, TrainState, EarlyStopping  # noqa: F401
from yolo_dual_tpu.train.checkpoint import save_checkpoint, load_checkpoint, strip_optimizer  # noqa: F401
