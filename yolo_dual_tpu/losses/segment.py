"""Instance-segmentation loss: detection loss + prototype-mask branch.

Capability parity with reference utils/segment/loss.py:12-186, TPU-first:

- The mask branch needs per-positive mask rasters; materializing them for the
  full dense candidate lattice would be O(5·na·bs·M·mh·mw), so valid
  candidates are compacted PER IMAGE to a static capacity `pos_capacity`
  (validity-first stable top-k). Grouping by image makes the proto matmul one
  batched MXU einsum (bs,C,nm)x(bs,mh,mw,nm) instead of a giant proto gather.
  Overflow beyond capacity is dropped — exact vs the reference when capacity
  >= positives per image (the default, 3 cells × na × max-labels, is exact by
  construction since at most 3 of the 5 offset cells are selected per target).
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


def _compact_per_image(asgn: Assignment, bs: int, capacity: int):
    """Per-image validity-first selection: (bs, capacity) indices into the
    dense lattice + validity. Grouping by image keeps the proto matmul a
    batched einsum instead of a (ΣC, mh, mw, nm) gather — the gather version
    moved ~3 GB/level through HBM and dominated the train step."""
    def per_img(i):
        mine = (asgn.b == i) & asgn.valid
        _, idx = jax.lax.top_k(mine.astype(jnp.int32), capacity)
        idx = jnp.sort(idx)
        return idx, mine[idx]
    return jax.vmap(per_img)(jnp.arange(bs))


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
        capacity = self.pos_capacity or (3 * self.na * M)  # per image

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

            # ---- mask branch on per-image compacted positives ----------------
            idx, val = _compact_per_image(asgn, bs, capacity)             # (bs, C)
            rows = pi[asgn.b[idx], asgn.a[idx], asgn.gj[idx], asgn.gi[idx]]
            pmask = rows[..., 5 + self.nc: 5 + self.nc + self.nm]         # (bs, C, nm)
            tidx = asgn.tidx[idx]                                          # (bs, C)
            xywhn = asgn.xywhn[idx]                                        # (bs, C, 4)

            # The (bs, C, mh, mw) lattice is the biggest tensor in the train
            # step (C=3*na*M rows vs typically ~tens of real positives), but
            # it is computed in ONE shot: a chunked lax.scan-with-cond variant
            # that skipped all-padding chunks was measured 10x SLOWER fwd+bwd
            # on TPU (7.4 ms vs 0.7 ms per level at C=128 — scan serializes,
            # cond blocks fusion, and the scan backward saves per-iteration
            # residuals; tools/bench_mask_branch.py). Dense rows are MXU food.
            # Elementwise work stays in the proto dtype (bf16 under the mixed-
            # precision policy); accumulation back to scalars is f32.
            cdt = proto.dtype
            scalev = jnp.asarray([mw, mh, mw, mh], jnp.float32)
            pred = jnp.einsum("bkn,bhwn->bkhw", pmask.astype(cdt), proto,
                              preferred_element_type=jnp.float32).astype(cdt)
            if self.overlap:
                gt = (masks[:, None] == (tidx + 1)[..., None, None]
                      .astype(masks.dtype)).astype(cdt)
            else:
                gt = jnp.take_along_axis(masks, tidx[..., None, None],
                                         axis=1).astype(cdt)
            marea = xywhn[..., 2] * xywhn[..., 3]
            mxyxy = xywh2xyxy(xywhn * scalev)
            bce = bce_with_logits(pred, gt)
            # crop COORDINATES stay f32: a bf16 cast rounds box edges by
            # up to 1 ulp (1 px past 128 mask-pixels), shifting the crop
            # boundary vs the reference's f32 crop (advisor r2)
            per = jax.vmap(crop_mask)(bce, mxyxy.astype(jnp.float32)).astype(jnp.float32) \
                .mean(axis=(2, 3)) / jnp.maximum(marea, 1e-9)
            acc = jnp.where(val, per, 0.0).sum(axis=1)                     # (bs,)
            # per-image mean over instances, summed over images (reference :89-95)
            cnt = jnp.maximum(val.sum(1).astype(jnp.float32), 1.0)
            lseg = lseg + (acc / cnt).sum()

        lbox = lbox * h.get("box", 0.05)
        lobj = lobj * h.get("obj", 1.0)
        lcls = lcls * h.get("cls", 0.5)
        lseg = lseg * h.get("box", 0.05) / bs
        loss = lbox + lobj + lcls + lseg
        return loss * bs, jnp.stack([lbox, lseg, lobj, lcls])


def encode_overlap_masks(instance_masks: np.ndarray, areas_sorted: bool = True):
    """Host helper: (n, h, w) binary instance masks -> ((h, w) overlap-indexed
    plane (value rank+1), area-sort order). Larger instances are written
    first so smaller ones win overlaps (reference
    utils/segment/dataloaders.py:309-331). The polygon pipeline uses
    data.augment.polygons2masks_overlap; this is the raw-bitmap variant for
    callers that already hold instance masks."""
    n, hgt, wid = instance_masks.shape
    out = np.zeros((hgt, wid), np.float32)
    order = np.argsort(-instance_masks.reshape(n, -1).sum(1)) if areas_sorted else np.arange(n)
    # reference builds index values AFTER area sorting: sorted mask i gets value i+1
    for rank, i in enumerate(order):
        out[instance_masks[i] > 0] = rank + 1
    return out, order
