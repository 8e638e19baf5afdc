"""Host-side augmentations (numpy/cv2) for the detection/instance-seg pipeline.

Capability parity with reference utils/augmentations.py (letterbox :111-141,
random_perspective :144-237, augment_hsv :67-87, copy_paste :240, mixup :289)
and utils/segment/augmentations.py (segment-aware variants :16-104). The hot
normalize step runs on device (see data/loader.py); these CPU transforms
produce uint8 HWC images + polygon segments.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Tuple

import cv2
import numpy as np


def letterbox(im: np.ndarray, new_shape=(640, 640), color=(114, 114, 114),
              auto: bool = False, scaleFill: bool = False, scaleup: bool = True,
              stride: int = 32):
    """Aspect-preserving resize + pad (reference utils/augmentations.py:111-141)."""
    shape = im.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = r, r
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = np.mod(dw, stride), np.mod(dh, stride)
    elif scaleFill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = new_shape[1] / shape[1], new_shape[0] / shape[0]
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)


def augment_hsv(im: np.ndarray, hgain=0.5, sgain=0.5, vgain=0.5, rng=None):
    """Random HSV jitter in-place-style (reference utils/augmentations.py:67-87)."""
    rng = rng or random
    if hgain or sgain or vgain:
        r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_RGB2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(im.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(im.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(im.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        im = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)
    return im


def xyn2xy(seg: np.ndarray, w: float, h: float, padw: float = 0, padh: float = 0):
    out = seg.copy()
    out[:, 0] = seg[:, 0] * w + padw
    out[:, 1] = seg[:, 1] * h + padh
    return out


def xywhn2xyxy_np(x: np.ndarray, w: float = 640, h: float = 640,
                  padw: float = 0, padh: float = 0) -> np.ndarray:
    """Pure-numpy twin of ops/boxes.xywhn2xyxy for the HOST loader hot path.

    The jnp version costs a device dispatch PER IMAGE inside the dataloader
    worker — ruinous through a remote-TPU tunnel if the consumer process ever
    forgets to pin jax to CPU (r4 finding: bench_loader wedged exactly this
    way), and measurable dispatch overhead even pinned. Same math as
    reference utils/general.py:775."""
    y = np.empty_like(x)
    y[..., 0] = x[..., 0] * w - x[..., 2] * w / 2 + padw
    y[..., 1] = x[..., 1] * h - x[..., 3] * h / 2 + padh
    y[..., 2] = x[..., 0] * w + x[..., 2] * w / 2 + padw
    y[..., 3] = x[..., 1] * h + x[..., 3] * h / 2 + padh
    if x.shape[-1] > 4:
        y[..., 4:] = x[..., 4:]
    return y


def xyxy2xywhn_np(x: np.ndarray, w: float = 640, h: float = 640,
                  clip: bool = False, eps: float = 0.0) -> np.ndarray:
    """Pure-numpy twin of ops/boxes.xyxy2xywhn (see xywhn2xyxy_np)."""
    if clip:
        x = x.copy()
        x[..., 0] = x[..., 0].clip(0, w - eps)
        x[..., 1] = x[..., 1].clip(0, h - eps)
        x[..., 2] = x[..., 2].clip(0, w - eps)
        x[..., 3] = x[..., 3].clip(0, h - eps)
    y = np.empty_like(x)
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2 / w
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2 / h
    y[..., 2] = (x[..., 2] - x[..., 0]) / w
    y[..., 3] = (x[..., 3] - x[..., 1]) / h
    if x.shape[-1] > 4:
        y[..., 4:] = x[..., 4:]
    return y


def segment2box(segment: np.ndarray, width: float, height: float):
    x, y = segment[:, 0], segment[:, 1]
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    return np.array([x.min(), y.min(), x.max(), y.max()]) if any(x) else np.zeros(4)


def resample_segments(segments: List[np.ndarray], n: int = 1000):
    """Up-sample polygons to n points each (reference utils/general.py:816-827)."""
    out = []
    for s in segments:
        s = np.concatenate((s, s[0:1, :]), axis=0)
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.concatenate([np.interp(x, xp, s[:, i]) for i in range(2)]).reshape(2, -1).T)
    return out


def sample_perspective_matrix(shape_hw, degrees=10, translate=0.1, scale=0.1,
                              shear=10, perspective=0.0, border=(0, 0), rng=None):
    """Sample the reference's C/P/R/S/T composite warp matrix without touching
    pixels (reference utils/segment/augmentations.py:28-52). Returns
    (M, s, (width, height)) — the device_aug pipeline applies M to pixels on
    the TPU (kernels/augment.py) while the host applies it to labels."""
    rng = rng or random
    height = shape_hw[0] + border[0] * 2
    width = shape_hw[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -shape_hw[1] / 2
    C[1, 2] = -shape_hw[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    return T @ S @ R @ P @ C, s, (width, height)


def apply_perspective_to_labels(M, s, perspective, targets, segments, width, height):
    """Transform labels+polygons by a sampled warp matrix and drop degenerate
    candidates (reference utils/segment/augmentations.py:60-88)."""
    n = len(targets)
    new_segments = []
    if n:
        new = np.zeros((n, 4))
        segments = resample_segments(segments)
        for i, segment in enumerate(segments):
            xy = np.ones((len(segment), 3))
            xy[:, :2] = segment
            xy = xy @ M.T
            xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2])
            new[i] = segment2box(xy, width, height)
            new_segments.append(xy)
        i = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.01)
        targets = targets[i]
        targets[:, 1:5] = new[i]
        new_segments = [new_segments[j] for j, keep in enumerate(i) if keep]
    return targets, new_segments


def random_perspective(im, targets=(), segments=(), degrees=10, translate=0.1, scale=0.1,
                       shear=10, perspective=0.0, border=(0, 0), rng=None):
    """Random affine/perspective warp of image + labels + polygons
    (reference utils/segment/augmentations.py:16-88)."""
    M, s, (width, height) = sample_perspective_matrix(
        im.shape[:2], degrees, translate, scale, shear, perspective, border, rng)
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    targets, new_segments = apply_perspective_to_labels(
        M, s, perspective, targets, segments, width, height)
    return im, targets, new_segments


def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate post-warp boxes (reference utils/augmentations.py:240)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def copy_paste(im, labels, segments, p=0.5, rng=None):
    """Copy-paste (segment flip-duplication) augmentation
    (reference utils/augmentations.py:240-270)."""
    rng = rng or random
    n = len(segments)
    if p and n:
        h, w, _ = im.shape
        im_new = np.zeros(im.shape, np.uint8)
        for j in rng.sample(range(n), k=round(p * n)):
            l, seg = labels[j], segments[j]
            box = w - l[3], l[2], w - l[1], l[4]
            # host-side numpy IoA (no device dispatch per instance inside the
            # CPU augment loop; ops.boxes.bbox_ioa stays the device-side twin)
            ioa = _bbox_ioa_np(np.asarray(box, np.float32),
                               labels[:, 1:5].astype(np.float32))
            if (ioa < 0.30).all():
                labels = np.concatenate((labels, [[l[0], *box]]), 0)
                segments.append(np.concatenate((w - seg[:, 0:1], seg[:, 1:2]), 1))
                cv2.drawContours(im_new, [seg.astype(np.int32)], -1, (1, 1, 1), cv2.FILLED)
        result = cv2.flip(im, 1)
        i = cv2.flip(im_new, 1).astype(bool)
        im[i] = result[i]
    return im, labels, segments


def mixup(im, labels, segments, im2, labels2, segments2, rng=None):
    """Beta(32,32) image blend (reference utils/segment/augmentations.py:91-104)."""
    r = np.random.beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    labels = np.concatenate((labels, labels2), 0)
    segments = list(segments) + list(segments2)
    return im, labels, segments


def _bbox_ioa_np(box: np.ndarray, boxes: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Intersection over box2 area, numpy host-side (reference utils/metrics.py
    bbox_ioa). box: (4,) xyxy; boxes: (n,4) xyxy."""
    ix = (np.minimum(box[2], boxes[:, 2]) - np.maximum(box[0], boxes[:, 0])).clip(0)
    iy = (np.minimum(box[3], boxes[:, 3]) - np.maximum(box[1], boxes[:, 1])).clip(0)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) + eps
    return ix * iy / area


def cutout(im: np.ndarray, labels: np.ndarray, p: float = 0.5, rng=None):
    """Random-erase occlusion patches; labels covered >60% are dropped
    (reference utils/augmentations.py:262-286 — defined there but commented
    out of the loader; here it is exposed behind hyp['cutout'], default 0)."""
    rng = rng or random
    if rng.random() < p:
        h, w = im.shape[:2]
        scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
        for s in scales:
            mask_h = rng.randint(1, max(1, int(h * s)))
            mask_w = rng.randint(1, max(1, int(w * s)))
            xmin = max(0, rng.randint(0, w) - mask_w // 2)
            ymin = max(0, rng.randint(0, h) - mask_h // 2)
            xmax = min(w, xmin + mask_w)
            ymax = min(h, ymin + mask_h)
            im[ymin:ymax, xmin:xmax] = [rng.randint(64, 191) for _ in range(3)]
            if len(labels) and s > 0.03:
                box = np.array([xmin, ymin, xmax, ymax], np.float32)
                from yolo_dual_tpu.ops.boxes import xywhn2xyxy
                xyxy = np.asarray(xywhn2xyxy(labels[:, 1:5].astype(np.float32), w, h))
                labels = labels[_bbox_ioa_np(box, xyxy) < 0.60]
    return im, labels


class Albumentations:
    """Optional albumentations pixel-transform adapter (reference
    utils/augmentations.py:22-53). Composes only photometric transforms
    (Blur/MedianBlur/ToGray/CLAHE + disabled-by-default contrast/gamma/
    compression) with YOLO bbox passthrough, so polygons/masks stay valid.
    No-op when the package is absent."""

    def __init__(self, size: int = 640):
        self.transform = None
        try:
            import albumentations as A
            T = [
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
                A.RandomBrightnessContrast(p=0.0),
                A.RandomGamma(p=0.0),
                A.ImageCompression(quality_lower=75, p=0.0),
            ]
            self.transform = A.Compose(
                T, bbox_params=A.BboxParams(format="yolo", label_fields=["class_labels"]))
            from yolo_dual_tpu.utils.general import LOGGER
            LOGGER.info("albumentations: " + ", ".join(
                type(t).__name__ for t in T if t.p))
        except ImportError:
            pass
        except Exception as e:  # pragma: no cover - version drift
            from yolo_dual_tpu.utils.general import LOGGER
            LOGGER.warning(f"albumentations: disabled ({e})")
            self.transform = None

    def __call__(self, im, labels, p: float = 1.0, rng=None):
        rng = rng or random
        if self.transform and rng.random() < p:
            new = self.transform(image=im, bboxes=labels[:, 1:5],
                                 class_labels=labels[:, 0])
            im = new["image"]
            if len(new["bboxes"]):
                labels = np.array([[c, *b] for c, b in
                                   zip(new["class_labels"], new["bboxes"])], np.float32)
            else:
                labels = np.zeros((0, 5), np.float32)
        return im, labels


def polygon2mask(img_size: Tuple[int, int], polygons, color: int = 1,
                 downsample_ratio: int = 1) -> np.ndarray:
    """Rasterize one polygon (reference utils/segment/dataloaders.py:274-289)."""
    mask = np.zeros(img_size, dtype=np.uint8)
    polygons = np.asarray(polygons).astype(np.int32).reshape(-1, 2)
    cv2.fillPoly(mask, [polygons], color=color)
    nh, nw = (img_size[0] // downsample_ratio, img_size[1] // downsample_ratio)
    return cv2.resize(mask, (nw, nh))


def polygons2masks(img_size, polygons, color, downsample_ratio=1):
    return np.array([polygon2mask(img_size, [p.reshape(-1)], color, downsample_ratio)
                     for p in polygons])


def polygons2masks_overlap(img_size, segments, downsample_ratio=1):
    """All instances in ONE index-encoded plane, sorted by area descending so
    small objects overwrite big ones; returns (mask, sorted_index)
    (reference utils/segment/dataloaders.py:309-331)."""
    mask = np.zeros((img_size[0] // downsample_ratio, img_size[1] // downsample_ratio),
                    dtype=np.int32 if len(segments) > 255 else np.uint8)
    areas = []
    ms = []
    for si in range(len(segments)):
        m = polygon2mask(img_size, [segments[si].reshape(-1)], 1, downsample_ratio)
        ms.append(m)
        areas.append(m.sum())
    areas = np.asarray(areas)
    index = np.argsort(-areas)
    ms = np.array(ms)[index]
    for i in range(len(segments)):
        m = ms[i] * (i + 1)
        mask = mask + m
        mask = np.clip(mask, a_min=0, a_max=i + 1)
    return mask, index
