"""Box coordinate ops and IoU family, jnp-native (works on device under jit
and on host with numpy inputs).

Capability parity with reference utils/general.py:752-884 (converters,
scale/clip) and utils/metrics.py:225-263 + utils/general-softnms.py:881-936
(IoU variants incl. GIoU/DIoU/CIoU/SIoU/EIoU).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def xywh2xyxy(x):
    xy, wh = x[..., :2], x[..., 2:4]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2, x[..., 4:]], axis=-1) if x.shape[-1] > 4 else \
        jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def xyxy2xywh(x):
    tl, br = x[..., :2], x[..., 2:4]
    out = jnp.concatenate([(tl + br) / 2, br - tl], axis=-1)
    return jnp.concatenate([out, x[..., 4:]], axis=-1) if x.shape[-1] > 4 else out


def xywhn2xyxy(x, w: float = 640, h: float = 640, padw: float = 0, padh: float = 0):
    """Normalized xywh -> pixel xyxy (reference utils/general.py:775)."""
    scale = jnp.asarray([w, h, w, h], x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], x.dtype)
    return xywh2xyxy(x[..., :4] * scale) + pad


def xyxy2xywhn(x, w: float = 640, h: float = 640, clip: bool = False, eps: float = 0.0):
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    return xyxy2xywh(x[..., :4]) / jnp.asarray([w, h, w, h], x.dtype)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape[:2]
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w),
        jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w),
        jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Rescale xyxy boxes from letterboxed img1_shape back to img0_shape
    (reference utils/general.py:829-843)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (img1_shape[1] - img0_shape[1] * gain) / 2, (img1_shape[0] - img0_shape[0] * gain) / 2
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    boxes = boxes - jnp.asarray([pad[0], pad[1], pad[0], pad[1]], boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU: box1 (N,4), box2 (M,4) xyxy -> (N,M)."""
    a1, a2 = jnp.split(box1[:, None, :], 2, axis=-1)
    b1, b2 = jnp.split(box2[None, :, :], 2, axis=-1)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False,
             CIoU: bool = False, SIoU: bool = False, EIoU: bool = False, eps: float = 1e-7):
    """Elementwise IoU of aligned boxes with GIoU/DIoU/CIoU (reference
    utils/metrics.py:225-263) and SIoU/EIoU (reference utils/general-softnms.py:881-936)."""
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1x1, b1x2, b1y1, b1y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2x1, b2x2, b2y1, b2y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, -1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * \
        jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None)
    w1h1 = (b1x2 - b1x1) * (b1y2 - b1y1)
    w2h2 = (b2x2 - b2x1) * (b2y2 - b2y1)
    union = w1h1 + w2h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU or SIoU or EIoU:
        cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
        ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
        if CIoU or DIoU or EIoU:
            c2 = cw ** 2 + ch ** 2 + eps
            rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
            if CIoU:
                w1c, h1c = b1x2 - b1x1, b1y2 - b1y1 + eps
                w2c, h2c = b2x2 - b2x1, b2y2 - b2y1 + eps
                v = (4 / math.pi ** 2) * (jnp.arctan(w2c / h2c) - jnp.arctan(w1c / h1c)) ** 2
                import jax
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            if EIoU:
                w1c, h1c = b1x2 - b1x1, b1y2 - b1y1 + eps
                w2c, h2c = b2x2 - b2x1, b2y2 - b2y1 + eps
                rho_w2 = (w2c - w1c) ** 2
                rho_h2 = (h2c - h1c) ** 2
                cw2 = cw ** 2 + eps
                ch2 = ch ** 2 + eps
                return iou - (rho2 / c2 + rho_w2 / cw2 + rho_h2 / ch2)
            return iou - rho2 / c2  # DIoU
        if SIoU:
            # SCYLLA-IoU (reference utils/general-softnms.py:899-917)
            s_cw = (b2x1 + b2x2 - b1x1 - b1x2) * 0.5
            s_ch = (b2y1 + b2y2 - b1y1 - b1y2) * 0.5
            sigma = jnp.sqrt(s_cw ** 2 + s_ch ** 2) + eps
            sin_a = jnp.abs(s_cw) / sigma
            sin_b = jnp.abs(s_ch) / sigma
            threshold = math.sqrt(2) / 2
            sin_best = jnp.where(sin_a > threshold, sin_b, sin_a)
            angle_cost = jnp.cos(jnp.arcsin(sin_best) * 2 - math.pi / 2)
            rho_x = ((b2x1 + b2x2 - b1x1 - b1x2) / (2 * cw + eps)) ** 2
            rho_y = ((b2y1 + b2y2 - b1y1 - b1y2) / (2 * ch + eps)) ** 2
            gamma = angle_cost - 2
            dist_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
            w1c, h1c = b1x2 - b1x1, b1y2 - b1y1 + eps
            w2c, h2c = b2x2 - b2x1, b2y2 - b2y1 + eps
            omiga_w = jnp.abs(w1c - w2c) / jnp.maximum(w1c, w2c)
            omiga_h = jnp.abs(h1c - h2c) / jnp.maximum(h1c, h2c)
            shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
            return iou - 0.5 * (dist_cost + shape_cost)
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area  # GIoU
    return iou


def wh_iou(wh1, wh2, eps: float = 1e-7):
    """IoU of width-height pairs: wh1 (N,2), wh2 (M,2) -> (N,M)."""
    wh1 = wh1[:, None]
    wh2 = wh2[None]
    inter = jnp.minimum(wh1, wh2).prod(2)
    return inter / (wh1.prod(2) + wh2.prod(2) - inter + eps)


def bbox_ioa(box1, box2, eps: float = 1e-7):
    """Intersection over box2 area: box1 (N,4), box2 (M,4) -> (N,M)."""
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1[:, None], 4, -1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2[None], 4, -1)
    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * \
        jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None)
    area2 = (b2x2 - b2x1) * (b2y2 - b2y1)
    return (inter / (area2 + eps))[..., 0]
