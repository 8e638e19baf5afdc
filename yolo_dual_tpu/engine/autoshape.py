"""Hub-style convenience inference API.

Capability parity with reference models/common.py:627-835 (AutoShape +
Detections): feed file paths / numpy arrays / PIL images in any size, get a
Detections object with rendering, cropping and tabular export.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER, increment_path
from yolo_dual_tpu.utils.plots import Annotator, colors


class Detections:
    """Per-image results container (reference models/common.py:726-835)."""

    def __init__(self, imgs, dets, masks, names, times=(0, 0, 0)):
        self.ims = imgs                      # list of HWC RGB uint8
        self.dets = dets                     # list of (n, 6+nm) [xyxy, conf, cls, ...]
        self.masks = masks                   # list of (n, h, w) bool or None
        self.names = names
        self.t = times
        self.n = len(imgs)

    def __len__(self):
        return self.n

    def to_dicts(self) -> List[List[dict]]:
        """Tabular export (the reference's .pandas() equivalent without the
        pandas dependency)."""
        out = []
        for det in self.dets:
            rows = []
            for d in det:
                rows.append({"xmin": float(d[0]), "ymin": float(d[1]),
                             "xmax": float(d[2]), "ymax": float(d[3]),
                             "confidence": float(d[4]), "class": int(d[5]),
                             "name": self.names.get(int(d[5]), str(int(d[5])))})
            out.append(rows)
        return out

    def pandas(self):
        import pandas as pd
        return [pd.DataFrame(rows) for rows in self.to_dicts()]

    def render(self) -> List[np.ndarray]:
        rendered = []
        for im, det, msk in zip(self.ims, self.dets, self.masks):
            ann = Annotator(im.copy())
            if msk is not None and len(msk):
                ann.masks(msk, [colors(int(c)) for c in det[:, 5]])
            for d in det:
                cls = int(d[5])
                ann.box_label(d[:4], f"{self.names.get(cls, cls)} {d[4]:.2f}", colors(cls))
            rendered.append(ann.result())
        return rendered

    def save(self, save_dir="runs/detect/exp"):
        save_dir = increment_path(Path(save_dir), mkdir=True)
        import cv2
        for i, im in enumerate(self.render()):
            cv2.imwrite(str(save_dir / f"image{i}.jpg"), im[..., ::-1])
        LOGGER.info(f"saved {self.n} images to {save_dir}")
        return save_dir

    def crop(self, save_dir="runs/detect/exp"):
        save_dir = increment_path(Path(save_dir), mkdir=True)
        import cv2
        k = 0
        for im, det in zip(self.ims, self.dets):
            for d in det:
                x1, y1, x2, y2 = (int(v) for v in d[:4])
                name = self.names.get(int(d[5]), str(int(d[5])))
                out = save_dir / "crops" / name
                out.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(out / f"{k}.jpg"), im[max(y1, 0):y2, max(x1, 0):x2][..., ::-1])
                k += 1
        return save_dir

    def print(self):
        for i, det in enumerate(self.dets):
            LOGGER.info(f"image {i}: {len(det)} detections")


class AutoShape:
    """Wraps (model, variables) with input-robust preprocessing + NMS
    (reference models/common.py:627-724)."""

    def __init__(self, model, variables, imgsz: int = 640, conf: float = 0.25,
                 iou: float = 0.45, max_det: int = 300, names: Optional[dict] = None,
                 fuse: bool = True):
        if fuse:
            # conv+BN folding, like the reference hub loader (attempt_load fuse=True)
            model, variables = model.fuse(variables)
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.names = names or getattr(model, "names", {})
        head = model.spec.layers[-1]
        self.nm = head.kw().get("nm", 0) if head.name == "Segment" else 0
        anchors, strides = head.kw()["anchors"], head.kw()["strides"]

        import jax
        import jax.numpy as jnp
        from yolo_dual_tpu.ops.nms import nms_from_raw

        @jax.jit
        def _fwd(v, x):
            # fused decode+NMS straight off the raw head maps
            out = model.module.apply(v, x.astype(jnp.float32) / 255.0,
                                     train=False, decode=False)
            if head.name == "Segment":
                levels, protos = out
            else:
                levels, protos = out, None
                if head.name == "DetectAux":
                    levels = levels[:len(anchors)]  # lead head only at inference
            dets, nv = nms_from_raw(levels, anchors, strides, conf_thres=self.conf,
                                    iou_thres=self.iou, max_det=self.max_det, nm=self.nm)
            return dets, nv, protos

        self._fwd = _fwd

    def _to_rgb(self, im):
        import cv2
        if isinstance(im, (str, Path)):
            arr = cv2.cvtColor(cv2.imread(str(im)), cv2.COLOR_BGR2RGB)
        elif hasattr(im, "convert"):  # PIL
            arr = np.asarray(im.convert("RGB"))
        else:
            arr = np.asarray(im)
        return arr

    def __call__(self, imgs, size: Optional[int] = None):
        import jax.numpy as jnp
        from yolo_dual_tpu.data.augment import letterbox
        from yolo_dual_tpu.ops import scale_boxes
        from yolo_dual_tpu.ops.mask_ops import process_mask, scale_image

        size = size or self.imgsz
        if not isinstance(imgs, (list, tuple)):
            imgs = [imgs]
        ims0 = [self._to_rgb(im) for im in imgs]
        batch = np.stack([letterbox(im, size, auto=False)[0] for im in ims0])
        dets, nv, protos = self._fwd(self.variables, jnp.asarray(batch))
        dets = np.asarray(dets)
        nv = np.asarray(nv)
        out_dets, out_masks = [], []
        for i, im0 in enumerate(ims0):
            d = dets[i, : nv[i]].copy()
            masks = None
            if self.nm and len(d):
                m = np.asarray(process_mask(protos[i], jnp.asarray(d[:, 6:6 + self.nm]),
                                            jnp.asarray(d[:, :4]), (size, size), upsample=True))
                masks = scale_image((size, size), m.transpose(1, 2, 0).astype(np.float32),
                                    im0.shape).transpose(2, 0, 1) > 0.5
            d[:, :4] = np.asarray(scale_boxes((size, size), jnp.asarray(d[:, :4]), im0.shape))
            out_dets.append(d)
            out_masks.append(masks)
        return Detections(ims0, out_dets, out_masks, dict(self.names))
