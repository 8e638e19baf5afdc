"""Semantic-segmentation losses: class-weighted CE + 0.5·Dice or 0.5·Jaccard.

Capability parity with the reference's per-script SegmentationLoss
(reference unet-lite/Resnet50/seg_diceloss_Resnet50.py:741-787 Dice form,
yolov8/seg_jaccardloss_yolov8.py:799-815 Jaccard/IoU form), including its
quirks, faithfully:

- `pred` is whatever the model emits — the reference graph models end in
  nn.Softmax yet the loss applies cross_entropy (log_softmax) and another
  softmax on top; we reproduce that by operating on the raw model output.
- CE uses torch CrossEntropyLoss semantics: per-pixel weighted NLL with
  label smoothing, normalized by the SUM OF WEIGHTS of the target pixels.
- Dice/Jaccard weight the *prediction* tensor only (not the target), and
  average over (batch, class).
- No ignore_index in the loss (the reference only ignores class 11 at eval).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _one_hot(target: jnp.ndarray, nc: int) -> jnp.ndarray:
    return jax.nn.one_hot(target, nc, dtype=jnp.float32)  # (b,h,w,nc)


def weighted_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray,
                           class_weights: jnp.ndarray, label_smoothing: float = 0.0):
    """torch F.cross_entropy(weight=w, label_smoothing=s) on NHWC logits.

    Torch normalizes by the sum of per-pixel target-class weights."""
    nc = pred.shape[-1]
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    onehot = _one_hot(target, nc)
    s = label_smoothing
    pix_w = class_weights[target]  # (b,h,w)
    # torch semantics: target term weighted by w[y], smoothing term by per-class
    # weights w_j; normalized by sum of target-class weights
    main = -(onehot * logp).sum(-1) * pix_w
    smooth = -(logp * class_weights[None, None, None, :]).sum(-1)
    nll = (1.0 - s) * main + (s / nc) * smooth
    return nll.sum() / (pix_w.sum() + 1e-12)


def dice_loss(pred_prob: jnp.ndarray, target: jnp.ndarray, class_weights: jnp.ndarray,
              eps: float = 1e-6):
    """1 - mean Dice over (batch, class), prediction weighted by class weights
    (reference seg_diceloss_Resnet50.py:780-787)."""
    nc = pred_prob.shape[-1]
    onehot = _one_hot(target, nc)
    wpred = pred_prob * class_weights[None, None, None, :]
    inter = (wpred * onehot).sum(axis=(1, 2))
    psum = wpred.sum(axis=(1, 2))
    tsum = onehot.sum(axis=(1, 2))
    dice = (2.0 * inter + eps) / (psum + tsum + eps)
    return 1.0 - dice.mean()


def jaccard_loss(pred_prob: jnp.ndarray, target: jnp.ndarray, class_weights: jnp.ndarray,
                 eps: float = 1e-6):
    """1 - mean IoU over (batch, class) (reference yolov8/seg_jaccardloss_yolov8.py:800-815)."""
    nc = pred_prob.shape[-1]
    onehot = _one_hot(target, nc)
    wpred = pred_prob * class_weights[None, None, None, :]
    inter = (wpred * onehot).sum(axis=(1, 2))
    union = wpred.sum(axis=(1, 2)) + onehot.sum(axis=(1, 2)) - inter
    jac = (inter + eps) / (union + eps)
    return 1.0 - jac.mean()


class SemanticSegLoss:
    """total = CE + 0.5 · (Dice | Jaccard). Callable under jit.

    pred: (b,h,w,nc) model output (logits or probs — treated as logits like the
    reference); target: (b,h,w) int class ids. Returns (loss, (total, ce, aux)).
    """

    def __init__(self, nc: int = 12, label_smoothing: float = 0.0,
                 class_weights: Optional[Sequence[float]] = None,
                 flavor: str = "dice"):
        self.nc = nc
        self.label_smoothing = float(label_smoothing)
        w = np.ones(nc, np.float32) if class_weights is None else np.asarray(class_weights, np.float32)
        self.class_weights = jnp.asarray(w)
        assert flavor in ("dice", "jaccard", "ce")
        self.flavor = flavor

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray):
        if pred.shape[1:3] != target.shape[1:3]:
            # nearest-resize target to pred resolution (reference :764-766)
            target = jax.image.resize(target.astype(jnp.float32)[..., None],
                                      (target.shape[0], pred.shape[1], pred.shape[2], 1),
                                      method="nearest")[..., 0].astype(jnp.int32)
        ce = weighted_cross_entropy(pred, target, self.class_weights, self.label_smoothing)
        if self.flavor == "ce":
            total = ce
            aux = jnp.zeros(())
        else:
            prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
            fn = dice_loss if self.flavor == "dice" else jaccard_loss
            aux = fn(prob, target, self.class_weights)
            total = ce + 0.5 * aux
        return total, (total, ce, aux)


def seg_labels_to_class_weights(json_files, num_classes: int) -> np.ndarray:
    """Data-driven class weights total/(nc·count) from JSON dense masks
    (reference seg_diceloss_Resnet50.py:791-809)."""
    counts = np.zeros(num_classes, np.int64)
    total = 0
    for f in json_files:
        try:
            with open(f) as fh:
                data = json.load(fh)
            flat = np.asarray(data["mask_data"], np.int64)
            counts += np.bincount(flat, minlength=num_classes)[:num_classes]
            total += flat.size
        except Exception:
            continue
    return (total / (num_classes * (counts + 1e-8))).astype(np.float32)


def parse_class_weights(spec, num_classes: int, class_names: Optional[Sequence[str]] = None):
    """Weights from a YAML file ({name: w} or list), a CSV string, or None
    (reference seg_diceloss_Resnet50.py:812-847)."""
    import os

    import yaml
    if not spec:
        return None
    if isinstance(spec, (list, tuple, np.ndarray)):
        w = list(spec)
    elif os.path.exists(str(spec)):
        with open(spec) as f:
            data = yaml.safe_load(f)
        if isinstance(data, dict):
            if class_names is None:
                w = list(data.values())
            else:
                w = [data[c] for c in class_names[:num_classes]]
        elif isinstance(data, list):
            w = data
        else:
            raise ValueError("weight file must contain a dict or list")
    else:
        w = [float(x) for x in str(spec).split(",")]
    if len(w) != num_classes:
        raise ValueError(f"{len(w)} weights for {num_classes} classes")
    return np.asarray(w, np.float32)
