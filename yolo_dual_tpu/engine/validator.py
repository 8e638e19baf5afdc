"""Evaluation engines: instance-seg box+mask mAP and semantic mIoU.

Capability parity with reference segment/val.py:128-400 (batch loop, NMS,
process_mask, per-threshold TP matching, ap_per_class_box_and_mask, speed
report) and unet-lite/Resnet50/val_diceloss.py:148-293 (semantic confusion
matrix mIoU). Device work (forward, NMS, proto matmul, IoU matrices) is
jitted; only the final AP curves run on host numpy.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.data.loader import normalize_image
from yolo_dual_tpu.metrics import SegmentationConfusionMatrix, ap_per_class_box_and_mask, Metrics
from yolo_dual_tpu.metrics.seg import IOUV, match_predictions
from yolo_dual_tpu.ops import box_iou, mask_iou, process_mask, xywh2xyxy
from yolo_dual_tpu.ops.nms import nms_batched
from yolo_dual_tpu.utils.general import LOGGER, Profile, colorstr


def evaluate_segment(model, variables, loader, nc: int, conf_thres: float = 0.001,
                     iou_thres: float = 0.6, max_det: int = 300, nm: int = 32,
                     mask_ratio: int = 4, names=None, plots: bool = False,
                     save_dir: str = ".", use_soft_nms: bool = False,
                     compute_loss=None, verbose: bool = False):
    """Returns ((mp,mr,map50,map)*box+(…)*mask, per-class maps, times_ms)."""

    @jax.jit
    def forward(variables, image):
        x = normalize_image(image)
        pred, protos, raw = model.module.apply(variables, x, train=False)
        out, n_valid = nms_batched(pred, conf_thres=conf_thres, iou_thres=iou_thres,
                                   multi_label=True, max_det=max_det, nm=nm,
                                   use_soft_nms=use_soft_nms)
        return out, n_valid, protos

    @jax.jit
    def masks_for(protos_i, coefs, boxes, shape):
        return process_mask(protos_i, coefs, boxes, shape, upsample=False, binarize=True)

    stats = []
    dt = [Profile(), Profile(), Profile()]
    seen = 0
    for batch in loader:
        image = jnp.asarray(batch["image"])
        with dt[0]:
            image = jax.block_until_ready(image)
        with dt[1]:
            out, n_valid, protos = jax.block_until_ready(forward(variables, image))
        h, w = image.shape[1:3]
        bsz = int(batch.get("n_valid", image.shape[0]))
        with dt[2]:
            out_np = np.asarray(out)
            nv = np.asarray(n_valid)
            for si in range(bsz):
                seen += 1
                n = int(nv[si])
                dets = out_np[si, :n]
                t = batch["targets"][si]
                tm = batch["tmask"][si].astype(bool)
                gt = t[tm]
                gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(gt[:, 1:5] * np.array([w, h, w, h], np.float32))))
                gt_cls = gt[:, 0]
                correct_b = np.zeros((n, len(IOUV)), bool)
                correct_m = np.zeros((n, len(IOUV)), bool)
                if n and len(gt):
                    iou_b = np.asarray(box_iou(jnp.asarray(gt_boxes), jnp.asarray(dets[:, :4])))
                    correct_b = match_predictions(dets[:, 5], gt_cls, iou_b)
                    # masks
                    pm = np.asarray(masks_for(protos[si], jnp.asarray(dets[:, 6:6 + nm]),
                                              jnp.asarray(dets[:, :4]), (h, w))).astype(np.float32)
                    gmask_plane = np.asarray(batch["masks"][si])
                    mh, mw = gmask_plane.shape[-2:]
                    gt_masks = np.stack([(gmask_plane == (i + 1)).astype(np.float32)
                                         for i in range(len(gt))]) if len(gt) else np.zeros((0, mh, mw))
                    if pm.shape[-2:] != (mh, mw):
                        import cv2
                        pm = np.stack([cv2.resize(m, (mw, mh), interpolation=cv2.INTER_NEAREST)
                                       for m in pm]) if len(pm) else pm
                    iou_m = np.asarray(mask_iou(jnp.asarray(gt_masks.reshape(len(gt), -1)),
                                                jnp.asarray(pm.reshape(max(n, 1), -1)[:n])))
                    correct_m = match_predictions(dets[:, 5], gt_cls, iou_m)
                stats.append((correct_b, correct_m, dets[:, 4], dets[:, 5], gt_cls))

    if not stats:
        return (0.0,) * 8, np.zeros(nc), (0.0, 0.0, 0.0)
    tp_b = np.concatenate([s[0] for s in stats])
    tp_m = np.concatenate([s[1] for s in stats])
    conf = np.concatenate([s[2] for s in stats])
    pred_cls = np.concatenate([s[3] for s in stats])
    target_cls = np.concatenate([s[4] for s in stats])

    metrics = Metrics()
    if tp_b.any() or len(conf):
        results = ap_per_class_box_and_mask(tp_b, tp_m, conf, pred_cls, target_cls,
                                            plot=plots, save_dir=save_dir,
                                            names=names or {i: str(i) for i in range(nc)})
        metrics.update(results)
    mean = metrics.mean_results()
    t = tuple(x.t / max(seen, 1) * 1e3 for x in dt)
    LOGGER.info(("%22s" + "%11s" * 8) % ("Class", "P(B)", "R(B)", "mAP50(B)", "mAP50-95(B)",
                                         "P(M)", "R(M)", "mAP50(M)", "mAP50-95(M)"))
    LOGGER.info(("%22s" + "%11.3g" * 8) % ("all", *mean))
    LOGGER.info(f"Speed: {t[0]:.1f}ms pre, {t[1]:.1f}ms inference+NMS, {t[2]:.1f}ms post per image")
    return mean, metrics.get_maps(nc), t


def evaluate_semantic(model, variables, loader, nc: int, ignore_index: Optional[int] = 11,
                      loss_fn=None, verbose: bool = False, names=None):
    """Semantic mIoU evaluation (reference val_diceloss.py:148-293).
    Returns ((miou, avg_loss, 0, 0), per_class_iou, times_ms)."""

    @jax.jit
    def forward(variables, image):
        x = normalize_image(image)
        out = model.module.apply(variables, x, train=False)
        from yolo_dual_tpu.nn.common import resize_bilinear
        if out.shape[1:3] != x.shape[1:3]:
            out = resize_bilinear(out, x.shape[1:3])
        return out

    cm = SegmentationConfusionMatrix(nc, ignore_index=ignore_index)
    total_loss = 0.0
    n_batches = 0
    seen = 0
    dt = Profile()
    for batch in loader:
        image = jnp.asarray(batch["image"])
        with dt:
            out = jax.block_until_ready(forward(variables, image))
        bsz = int(batch.get("n_valid", image.shape[0]))
        pred_ids = np.asarray(out.argmax(-1))[:bsz]
        gt = np.asarray(batch["mask"])[:bsz]
        cm.update(pred_ids, gt)
        if loss_fn is not None:
            loss, _ = loss_fn(out[:bsz], jnp.asarray(gt))
            total_loss += float(loss)
            n_batches += 1
        seen += bsz
    miou, iou = cm.compute_iou()
    avg_loss = total_loss / max(n_batches, 1)
    t = dt.t / max(seen, 1) * 1e3
    LOGGER.info(f"mIoU: {miou:.4f}  val-loss: {avg_loss:.4f}  ({t:.1f} ms/img)")
    if verbose and names:
        for i, v in enumerate(iou):
            tag = " (ignored)" if i == ignore_index else ""
            LOGGER.info(f"  {names.get(i, i):>12}: IoU {v:.4f}{tag}")
    return (miou, avg_loss, 0.0, 0.0), iou, (t,)
