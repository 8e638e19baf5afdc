"""Instance-segmentation loss: detection loss + prototype-mask branch.

Capability parity with reference utils/segment/loss.py:12-186, TPU-first:

- The mask branch needs per-positive mask rasters (n, mh, mw); materializing
  them for the full dense candidate lattice would be O(5·na·bs·M·mh·mw), so
  valid candidates are compacted to a static capacity `pos_capacity` with a
  stable top-k (validity-first). Overflow beyond capacity is dropped —
  equivalent to the reference when capacity >= number of positives (the
  default, 3 cells × na × max-labels, is exact by construction since at most
  3 of the 5 offset cells are selected per target).
- Per-image normalization (reference: mean over instances per image, summed
  over images, utils/segment/loss.py:89-95) is reproduced with segment-sums
  over the image index.
- overlap=True uses a single (bs, mh, mw) index-encoded mask plane
  (instance i encoded as value i+1), overlap=False gathers per-instance
  planes from (bs, M, mh, mw).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.losses.detect import (
    Assignment,
    ComputeLoss,
    bce_with_logits,
    build_targets_level,
)
from yolo_dual_tpu.ops.boxes import xywh2xyxy
from yolo_dual_tpu.ops.mask_ops import crop_mask


def _compact(asgn: Assignment, capacity: int) -> Assignment:
    """Stable validity-first selection of `capacity` candidates."""
    k = min(capacity, asgn.valid.shape[0])
    _, idx = jax.lax.top_k(asgn.valid.astype(jnp.int32), k)
    idx = jnp.sort(idx)  # preserve original candidate order among the selected
    return Assignment(
        b=asgn.b[idx], a=asgn.a[idx], gj=asgn.gj[idx], gi=asgn.gi[idx],
        tbox=asgn.tbox[idx], cls=asgn.cls[idx], tidx=asgn.tidx[idx],
        xywhn=asgn.xywhn[idx], anch=asgn.anch[idx], valid=asgn.valid[idx],
    )


class ComputeSegmentLoss(ComputeLoss):
    """Loss for (raw_levels, protos) model output.

    masks: overlap=True -> (bs, mh', mw') float/int plane with instance idx+1;
           overlap=False -> (bs, M, mh', mw') per-instance binary planes.
    """

    def __init__(self, anchors, strides: Sequence[int], nc: int, nm: int, hyp: Dict,
                 overlap: bool = True, pos_capacity: int = 0):
        super().__init__(anchors, strides, nc, hyp)
        self.nm = int(nm)
        self.overlap = overlap
        self.pos_capacity = pos_capacity  # 0 -> auto (3*na*bs*M at call time)

    def __call__(self, preds, targets: jnp.ndarray, tmask: jnp.ndarray, masks: jnp.ndarray):
        p, proto = preds
        bs, mh, mw, nm = proto.shape
        h = self.hyp
        lbox = lobj = lcls = lseg = jnp.zeros(())
        M = targets.shape[1]
        capacity = self.pos_capacity or (3 * self.na * bs * M)

        # GT masks at proto resolution (reference: F.interpolate nearest)
        if self.overlap:
            if masks.shape[-2:] != (mh, mw):
                masks = jax.image.resize(masks.astype(jnp.float32)[..., None],
                                         (bs, mh, mw, 1), method="nearest")[..., 0]
        else:
            if masks.shape[-2:] != (mh, mw):
                masks = jax.image.resize(masks.astype(jnp.float32)[..., None],
                                         (bs, M, mh, mw, 1), method="nearest")[..., 0]

        for i, pi in enumerate(p):
            _, _, ny, nx, _ = pi.shape
            asgn = build_targets_level(targets, tmask, self.anchors_grid[i], ny, nx,
                                       h.get("anchor_t", 4.0))
            lb, lc, tobj, _, _, _ = self._cls_obj_box(pi, asgn)
            lbox = lbox + lb
            lcls = lcls + lc
            lobj = lobj + bce_with_logits(pi[..., 4], tobj, h.get("obj_pw", 1.0)).mean() * self.balance[i]

            # ---- mask branch on compacted positives -------------------------
            ca = _compact(asgn, capacity)
            rows = pi[ca.b, ca.a, ca.gj, ca.gi]
            pmask = rows[:, 5 + self.nc: 5 + self.nc + self.nm]          # (C, nm)
            valid_f = ca.valid.astype(jnp.float32)

            # predicted instance masks: (C, mh, mw)
            proto_b = proto[ca.b]                                         # (C, mh, mw, nm)
            pred_masks = jnp.einsum("cn,chwn->chw", pmask, proto_b)

            if self.overlap:
                gt = (masks[ca.b] == (ca.tidx + 1)[:, None, None].astype(masks.dtype)).astype(jnp.float32)
            else:
                gt = masks[ca.b, ca.tidx].astype(jnp.float32)

            marea = ca.xywhn[:, 2] * ca.xywhn[:, 3]                        # normalized area
            mxyxy = xywh2xyxy(ca.xywhn * jnp.asarray([mw, mh, mw, mh], jnp.float32))
            bce = bce_with_logits(pred_masks, gt)
            per = crop_mask(bce, mxyxy).mean(axis=(1, 2)) / jnp.maximum(marea, 1e-9)
            per = jnp.where(ca.valid, per, 0.0)
            # per-image mean over instances, summed over images (reference :89-95)
            sums = jax.ops.segment_sum(per, ca.b, num_segments=bs)
            cnts = jax.ops.segment_sum(valid_f, ca.b, num_segments=bs)
            lseg = lseg + (sums / jnp.maximum(cnts, 1.0)).sum()

        lbox = lbox * h.get("box", 0.05)
        lobj = lobj * h.get("obj", 1.0)
        lcls = lcls * h.get("cls", 0.5)
        lseg = lseg * h.get("box", 0.05) / bs
        loss = lbox + lobj + lcls + lseg
        return loss * bs, jnp.stack([lbox, lseg, lobj, lcls])


def encode_overlap_masks(instance_masks: np.ndarray, areas_sorted: bool = True) -> np.ndarray:
    """Host helper: (n, h, w) binary instance masks -> (h, w) overlap-indexed
    plane (value i+1), larger instances written first so smaller ones win
    overlaps (reference utils/segment/dataloaders.py:309-331)."""
    n, hgt, wid = instance_masks.shape
    out = np.zeros((hgt, wid), np.float32)
    order = np.argsort(-instance_masks.reshape(n, -1).sum(1)) if areas_sorted else np.arange(n)
    # reference builds index values AFTER area sorting: sorted mask i gets value i+1
    for rank, i in enumerate(order):
        out[instance_masks[i] > 0] = rank + 1
    return out, order
