"""Mask post-processing: proto matmul, crop, resize, IoU — all jnp/XLA.

Capability parity with reference utils/segment/general.py (crop_mask :7-22,
process_mask/process_mask_upsample :25-67, scale_image :70-95, mask_iou
:98-121, masks2segments :124-137). The proto matmul + sigmoid + crop (+resize)
chain is a single jitted function so XLA fuses it; threshold binarization is
optional so the evaluator can keep soft masks where the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside each box. masks (n,h,w), boxes (n,4) xyxy in
    mask-pixel coords (reference utils/segment/general.py:7-22)."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (n,1,1)
    r = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    c = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    keep = (r >= x1) * (r < x2) * (c >= y1) * (c < y2)
    return masks * keep


def _resize_masks_bilinear(masks: jnp.ndarray, shape) -> jnp.ndarray:
    n, h, w = masks.shape
    if (h, w) == tuple(shape):
        return masks
    return jax.image.resize(masks, (n, shape[0], shape[1]), method="bilinear")


def process_mask(protos: jnp.ndarray, masks_in: jnp.ndarray, bboxes: jnp.ndarray,
                 shape, upsample: bool = False, binarize: bool = True) -> jnp.ndarray:
    """Crop-then-(optionally)-upsample (reference utils/segment/general.py:43-67).

    protos: (mh, mw, c) NHWC proto output for ONE image; masks_in: (n, c) NMS-kept
    coefficients; bboxes: (n, 4) xyxy in input-image pixels; shape: (ih, iw).
    Returns (n, h, w) float (or bool if binarize).
    """
    mh, mw, c = protos.shape
    ih, iw = shape
    masks = jax.nn.sigmoid(masks_in @ protos.reshape(mh * mw, c).T).reshape(-1, mh, mw)
    scale = jnp.asarray([mw / iw, mh / ih, mw / iw, mh / ih], bboxes.dtype)
    masks = crop_mask(masks, bboxes * scale)
    if upsample:
        masks = _resize_masks_bilinear(masks, shape)
    return masks > 0.5 if binarize else masks


def process_mask_upsample(protos: jnp.ndarray, masks_in: jnp.ndarray,
                          bboxes: jnp.ndarray, shape, binarize: bool = True) -> jnp.ndarray:
    """Upsample-then-crop (reference utils/segment/general.py:25-40)."""
    mh, mw, c = protos.shape
    masks = jax.nn.sigmoid(masks_in @ protos.reshape(mh * mw, c).T).reshape(-1, mh, mw)
    masks = _resize_masks_bilinear(masks, shape)
    masks = crop_mask(masks, bboxes)
    return masks > 0.5 if binarize else masks


def scale_image(im1_shape, masks: np.ndarray, im0_shape, ratio_pad=None) -> np.ndarray:
    """Un-letterbox masks (h,w[,n]) from model input shape to original image
    shape — host-side (cv2), used at the visualization boundary only
    (reference utils/segment/general.py:70-95)."""
    import cv2
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = (im1_shape[1] - im0_shape[1] * gain) / 2, (im1_shape[0] - im0_shape[0] * gain) / 2
    else:
        pad = ratio_pad[1]
    top, left = int(pad[1]), int(pad[0])
    bottom, right = int(im1_shape[0] - pad[1]), int(im1_shape[1] - pad[0])
    if masks.ndim < 2:
        raise ValueError(f"masks must be 2D or 3D, got {masks.ndim}D")
    masks = masks[top:bottom, left:right].astype(np.float32)
    size = (im0_shape[1], im0_shape[0])
    if masks.ndim == 3 and masks.shape[2] > 4:
        # cv2.resize handles at most 4 channels; resize instance planes in
        # 4-channel blocks (N can be max_det=300 here)
        out = np.empty((size[1], size[0], masks.shape[2]), np.float32)
        for c0 in range(0, masks.shape[2], 4):
            blk = cv2.resize(masks[:, :, c0:c0 + 4], size)
            out[:, :, c0:c0 + 4] = blk if blk.ndim == 3 else blk[:, :, None]
        masks = out
    else:
        masks = cv2.resize(masks, size)
    if masks.ndim == 2:
        masks = masks[:, :, None]
    return masks


def mask_iou(mask1: jnp.ndarray, mask2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU of flattened binary masks: (N,hw) x (M,hw) -> (N,M)
    (reference utils/segment/general.py:98-110)."""
    inter = jnp.clip(mask1 @ mask2.T, 0, None)
    union = mask1.sum(1)[:, None] + mask2.sum(1)[None] - inter
    return inter / (union + eps)


def masks_iou(mask1: jnp.ndarray, mask2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU of aligned masks (reference utils/segment/general.py:113-121)."""
    inter = jnp.clip((mask1 * mask2).sum(1), 0, None)
    union = mask1.sum(1) + mask2.sum(1) - inter
    return inter / (union + eps)


def masks2segments(masks, strategy: str = "largest"):
    """Binary masks (n,h,w) -> polygon segments via cv2 contours — host-side
    (reference utils/segment/general.py:124-137)."""
    import cv2
    segments = []
    for x in np.asarray(masks).astype(np.uint8):
        contours = cv2.findContours(x, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if contours:
            if strategy == "concat":
                c = np.concatenate([c.reshape(-1, 2) for c in contours])
            else:  # largest
                c = np.array(contours[np.array([len(c) for c in contours]).argmax()]).reshape(-1, 2)
        else:
            c = np.zeros((0, 2))
        segments.append(c.astype(np.float32))
    return segments
