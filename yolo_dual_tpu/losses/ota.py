"""SimOTA and AuxOTA detection losses, fixed-shape for XLA.

Capability parity with reference utils/loss_OTA.py:233-520 (ComputeLossOTA:
find_3_positive candidates, cost = cls + 3·(-log iou), dynamic-k from top-10
IoU sum, conflict resolution by min cost) and utils/loss_AuxOTA.py:238-758
(dual lead+aux heads: lead top-20 dynamic-k, aux candidates from
find_5_positive with grid bias 1.0 and 0.25 loss weight), re-designed for
static shapes:

- Candidates are the dense masked lattice from build_targets_level, compacted
  per image to a fixed capacity with a stable validity-first top-k.
- The (num_gt × num_cand × nc) classification-cost tensor is never
  materialized: sum_j BCE(z_j, onehot_y) decomposes into A[cand] +
  B[cand, y] with A = Σ_j softplus(z_j)-like terms, so the cost matrix stays
  (M, C).
- dynamic-k selection = top-k(10 or 20) by cost with a rank < k mask;
  conflicts resolved exactly like the reference (argmin cost per candidate).
- Everything vmapped over the batch; no per-image Python loops.
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
from yolo_dual_tpu.ops.boxes import bbox_iou, box_iou, xywh2xyxy


def _concat_assignments(asgns, levels):
    """Concatenate per-level assignments, tagging each candidate's level."""
    fields = {}
    for name in ("b", "a", "gj", "gi", "cls", "tidx"):
        fields[name] = jnp.concatenate([getattr(a, name) for a in asgns])
    tbox = jnp.concatenate([a.tbox for a in asgns])
    xywhn = jnp.concatenate([a.xywhn for a in asgns])
    anch = jnp.concatenate([a.anch for a in asgns])
    valid = jnp.concatenate([a.valid for a in asgns])
    lvl = jnp.concatenate([jnp.full((a.valid.shape[0],), i, jnp.int32)
                           for i, a in zip(levels, asgns)])
    return fields, tbox, xywhn, anch, valid, lvl


class ComputeLossOTA(ComputeLoss):
    """SimOTA loss (reference utils/loss_OTA.py). Call with raw per-level
    outputs, padded targets, and the input image size (pixels)."""

    def __init__(self, anchors, strides: Sequence[int], nc: int, hyp: Dict,
                 top_k: int = 10, cand_capacity: int = 0):
        super().__init__(anchors, strides, nc, hyp)
        self.strides = tuple(int(s) for s in strides)
        self.top_k = top_k
        self.cand_capacity = cand_capacity  # 0 -> auto

    # ------------------------------------------------------------------
    def _pixel_scale(self, p):
        """[W, H, W, H] xywh scale from the first level's grid (nx·stride,
        ny·stride) — per-axis so non-square inputs scale GT boxes into the
        same pixel space the candidate boxes decode in."""
        ny, nx = p[0].shape[2], p[0].shape[3]
        s = float(self.strides[0])
        return jnp.asarray([nx * s, ny * s, nx * s, ny * s], jnp.float32)

    def _simota_select(self, p, targets, tmask, imgsz, bias: float = 0.5,
                       levels=None, loss_rows_from=None):
        """Returns per-candidate matched assignment (compacted, per image):
        dict of (bs, C) arrays + fg mask + matched gt attributes.

        loss_rows_from: optional second pyramid (same shapes) to gather
        `loss_rows` from at the SAME candidate sites — the AuxOTA contract:
        assignment cost from the lead head, loss evaluated on the aux head
        (reference loss_AuxOTA.py:267 build_targets2(p[:nl], ...))."""
        levels = levels if levels is not None else list(range(len(p)))
        bs, M = tmask.shape
        asgns = []
        for li, pi in zip(levels, p):
            _, _, ny, nx, _ = pi.shape
            asgns.append(build_targets_level(targets, tmask, self.anchors_grid[li],
                                             ny, nx, self.hyp.get("anchor_t", 4.0),
                                             bias=bias))
        fields, tbox, xywhn, anch, valid, lvl = _concat_assignments(asgns, levels)

        K = valid.shape[0]
        per_img = K // bs
        # Exact-by-construction capacity: each gt can occupy at most 3 cells
        # (bias 0.5: center + one horizontal + one vertical neighbor) or 5
        # cells (bias 1.0 aux branch) × na anchors × nl levels, so no valid
        # candidate is ever dropped by the compaction (advisor finding r1).
        cells = 5 if bias >= 1.0 else 3
        C = self.cand_capacity or min(per_img, cells * self.na * len(levels) * M)

        # gather candidate rows once: (K, no)
        rows = jnp.concatenate([
            pi[a.b, a.a, a.gj, a.gi] for pi, a in zip(p, asgns)], axis=0)
        loss_rows = rows
        if loss_rows_from is not None:
            loss_rows = jnp.concatenate([
                pi[a.b, a.a, a.gj, a.gi] for pi, a in zip(loss_rows_from, asgns)],
                axis=0)

        strides_per_cand = jnp.asarray(self.strides, jnp.float32)[lvl]

        # decoded candidate boxes in pixels
        grid_xy = jnp.stack([fields["gi"].astype(jnp.float32),
                             fields["gj"].astype(jnp.float32)], 1)
        pxy = (jax.nn.sigmoid(rows[:, :2]) * 2.0 - 0.5 + grid_xy) * strides_per_cand[:, None]
        pwh = (jax.nn.sigmoid(rows[:, 2:4]) * 2.0) ** 2 * anch * strides_per_cand[:, None]
        pxyxy = jnp.asarray(xywh2xyxy(jnp.concatenate([pxy, pwh], 1)))

        p_obj = rows[:, 4]
        p_cls = rows[:, 5:5 + self.nc]

        # per-image compaction ------------------------------------------------
        def per_image(img_idx):
            # candidates of this image among the dense lattice
            mine = (fields["b"] == img_idx) & valid
            score = mine.astype(jnp.int32)
            _, idx = jax.lax.top_k(score, C)
            idx = jnp.sort(idx)
            cvalid = mine[idx]
            return idx, cvalid

        idxs, cvalids = jax.vmap(per_image)(jnp.arange(bs))

        def assign_one(img_idx, idx, cvalid):
            tgt = targets[img_idx]
            tval = tmask[img_idx]
            txywh = tgt[:, 1:5] * imgsz
            txyxy = jnp.asarray(xywh2xyxy(txywh))
            cand_box = pxyxy[idx]
            iou = jnp.asarray(box_iou(txyxy, cand_box))             # (M, C)
            pair_valid = tval[:, None] & cvalid[None, :]
            iou = jnp.where(pair_valid, iou, 0.0)
            iou_loss = -jnp.log(iou + 1e-8)

            kk = min(self.top_k, C)
            topk_iou, _ = jax.lax.top_k(iou, kk)
            dynamic_k = jnp.clip(topk_iou.sum(1).astype(jnp.int32), 1, None)  # (M,)

            # cls cost without (M, C, nc): z = logit(sqrt(sig(cls)*sig(obj)))
            y = jnp.sqrt(jax.nn.sigmoid(p_cls[idx]) * jax.nn.sigmoid(p_obj[idx])[:, None])
            y = jnp.clip(y, 1e-7, 1 - 1e-7)
            z = jnp.log(y / (1 - y))
            softplus_pos = jax.nn.softplus(-z)   # BCE when target=1
            softplus_neg = jax.nn.softplus(z)    # BCE when target=0
            A = softplus_neg.sum(1)                                  # (C,)
            Bmat = softplus_pos - softplus_neg                       # (C, nc)
            gt_cls = tgt[:, 0].astype(jnp.int32)
            cls_cost = A[None, :] + Bmat[:, gt_cls].T                # (M, C)

            cost = cls_cost + 3.0 * iou_loss
            BIG = 1e9
            cost = jnp.where(pair_valid, cost, BIG)

            # dynamic-k: per gt take its k lowest-cost candidates
            neg_cost, order = jax.lax.top_k(-cost, kk)               # (M, kk)
            ranks = jnp.arange(kk)[None, :]
            take = ranks < dynamic_k[:, None]
            matching = jnp.zeros((tgt.shape[0], C), bool)
            rows_idx = jnp.broadcast_to(jnp.arange(tgt.shape[0])[:, None], order.shape)
            matching = matching.at[rows_idx.reshape(-1), order.reshape(-1)].max(
                take.reshape(-1))
            matching = matching & pair_valid

            # conflicts: a candidate matched by >1 gt is REASSIGNED to the
            # global min-cost gt — even one whose own top-k didn't select it
            # (reference loss_OTA.py:427-431 zeroes the column then sets
            # matching[cost_argmin]=1 unconditionally; `matching & keep`
            # would silently drop such candidates, advisor r2)
            n_match = matching.sum(0)
            best_gt = jnp.argmin(cost, axis=0)                       # (C,)
            onehot_best = (jnp.arange(tgt.shape[0])[:, None] == best_gt[None, :])
            matching = jnp.where(n_match[None, :] > 1, onehot_best, matching)

            fg = matching.any(0)                                     # (C,)
            matched_gt = jnp.argmax(matching, axis=0)                # (C,)
            return matched_gt, fg

        matched_gts, fgs = jax.vmap(assign_one)(jnp.arange(bs), idxs, cvalids)
        return {
            "idxs": idxs, "fgs": fgs, "matched_gts": matched_gts,
            "fields": fields, "anch": anch, "lvl": lvl, "rows": rows,
            "loss_rows": loss_rows,
        }

    # ------------------------------------------------------------------
    def __call__(self, p, targets, tmask, imgsz=None):
        h = self.hyp
        bs, M = tmask.shape
        if imgsz is None:
            # derive the pixel space PER AXIS from the level shapes
            # (ny·stride, nx·stride) so callers that don't plumb imgsz
            # (Trainer._forward_loss) stay correct at any resolution,
            # including non-square inputs (advisor finding r1; xywh scale
            # order is [W, H, W, H])
            imgsz = self._pixel_scale(p)
        sel = self._simota_select(p, targets, tmask, imgsz)
        fields, anch, lvl, rows = sel["fields"], sel["anch"], sel["lvl"], sel["rows"]
        idxs, fgs, matched_gts = sel["idxs"], sel["fgs"], sel["matched_gts"]

        # flatten per-image selections back to one candidate list
        flat_idx = idxs.reshape(-1)
        fg = fgs.reshape(-1)
        mgt = matched_gts.reshape(-1)
        img_of = jnp.repeat(jnp.arange(bs), idxs.shape[1])

        cand_rows = rows[flat_idx]
        cand_b = fields["b"][flat_idx]
        cand_a = fields["a"][flat_idx]
        cand_gj = fields["gj"][flat_idx]
        cand_gi = fields["gi"][flat_idx]
        cand_anch = anch[flat_idx]
        cand_lvl = lvl[flat_idx]
        gt = targets[img_of, mgt]                       # (N,5) matched gt rows
        gt_cls = gt[:, 0].astype(jnp.int32)

        lbox = lobj = lcls = jnp.zeros(())
        for i, pi in enumerate(p):
            _, na, ny, nx, _ = pi.shape
            mine = fg & (cand_lvl == i)
            n_pos = jnp.maximum(mine.sum(), 1.0)

            pxy = jax.nn.sigmoid(cand_rows[:, :2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(cand_rows[:, 2:4]) * 2.0) ** 2 * cand_anch
            pbox = jnp.concatenate([pxy, pwh], 1)
            gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
            tb = gt[:, 1:5] * gain
            tb = tb.at[:, 0].add(-cand_gi.astype(jnp.float32))
            tb = tb.at[:, 1].add(-cand_gj.astype(jnp.float32))
            iou = bbox_iou(pbox, tb, xywh=True, CIoU=True)[:, 0]
            lbox = lbox + jnp.where(mine, 1.0 - iou, 0.0).sum() / n_pos

            iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            flat = ((cand_b * na + cand_a) * ny + cand_gj) * nx + cand_gi
            vals = jnp.where(mine, iou_d, -1.0).astype(pi.dtype)
            tobj = jnp.zeros((bs * na * ny * nx,), pi.dtype).at[flat].max(vals)
            tobj = jnp.clip(tobj, 0.0).reshape(bs, na, ny, nx)
            lobj = lobj + bce_with_logits(pi[..., 4], tobj, h.get("obj_pw", 1.0)).mean() * self.balance[i]

            if self.nc > 1:
                pcls = cand_rows[:, 5:5 + self.nc]
                t = jnp.full_like(pcls, self.cn)
                t = t.at[jnp.arange(t.shape[0]), gt_cls].set(self.cp)
                bce = bce_with_logits(pcls, t, h.get("cls_pw", 1.0))
                lcls = lcls + jnp.where(mine[:, None], bce, 0.0).sum() / (n_pos * self.nc)

        lbox = lbox * h.get("box", 0.05)
        lobj = lobj * h.get("obj", 1.0)
        lcls = lcls * h.get("cls", 0.5)
        loss = lbox + lobj + lcls
        return loss * bs, jnp.stack([lbox, lobj, lcls])


class ComputeLossAuxOTA(ComputeLossOTA):
    """Dual-head OTA loss (reference utils/loss_AuxOTA.py:238-758): the first
    nl outputs are the lead head (top-20 dynamic-k, bias 0.5), the next nl are
    the auxiliary head (bias 1.0 "find_5_positive" candidates, 0.25 weight)."""

    AUX_WEIGHT = 0.25

    def __init__(self, anchors, strides, nc, hyp, cand_capacity: int = 0):
        super().__init__(anchors, strides, nc, hyp, top_k=20,
                         cand_capacity=cand_capacity)

    def __call__(self, p, targets, tmask, imgsz=None):
        nl = self.nl
        if imgsz is None:
            imgsz = self._pixel_scale(p)
        lead, aux = list(p[:nl]), list(p[nl:])
        lead_loss, lead_items = ComputeLossOTA.__call__(self, lead, targets, tmask, imgsz)
        # aux branch: wider (bias-1.0) candidate set, assignment from the
        # LEAD head's predictions (reference build_targets2(p[:nl], ...)),
        # loss evaluated on the aux head at those sites (advisor r2)
        aux_loss, aux_items = self._aux_call(aux, lead, targets, tmask, imgsz)
        total = lead_loss + self.AUX_WEIGHT * aux_loss
        return total, lead_items + self.AUX_WEIGHT * aux_items

    def _aux_call(self, p, lead_p, targets, tmask, imgsz):
        # identical loss body but candidates built with bias=1.0; matching
        # cost comes from lead_p, loss rows from p (the aux head)
        h = self.hyp
        bs, M = tmask.shape
        sel = self._simota_select(lead_p, targets, tmask, imgsz, bias=1.0,
                                  loss_rows_from=p)
        fields, anch, lvl, rows = sel["fields"], sel["anch"], sel["lvl"], sel["loss_rows"]
        idxs, fgs, matched_gts = sel["idxs"], sel["fgs"], sel["matched_gts"]
        flat_idx = idxs.reshape(-1)
        fg = fgs.reshape(-1)
        mgt = matched_gts.reshape(-1)
        img_of = jnp.repeat(jnp.arange(bs), idxs.shape[1])
        cand_rows = rows[flat_idx]
        cand_b = fields["b"][flat_idx]
        cand_a = fields["a"][flat_idx]
        cand_gj = fields["gj"][flat_idx]
        cand_gi = fields["gi"][flat_idx]
        cand_anch = anch[flat_idx]
        cand_lvl = lvl[flat_idx]
        gt = targets[img_of, mgt]
        gt_cls = gt[:, 0].astype(jnp.int32)
        lbox = lobj = lcls = jnp.zeros(())
        for i, pi in enumerate(p):
            _, na, ny, nx, _ = pi.shape
            mine = fg & (cand_lvl == i)
            n_pos = jnp.maximum(mine.sum(), 1.0)
            pxy = jax.nn.sigmoid(cand_rows[:, :2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(cand_rows[:, 2:4]) * 2.0) ** 2 * cand_anch
            pbox = jnp.concatenate([pxy, pwh], 1)
            gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
            tb = gt[:, 1:5] * gain
            tb = tb.at[:, 0].add(-cand_gi.astype(jnp.float32))
            tb = tb.at[:, 1].add(-cand_gj.astype(jnp.float32))
            iou = bbox_iou(pbox, tb, xywh=True, CIoU=True)[:, 0]
            lbox = lbox + jnp.where(mine, 1.0 - iou, 0.0).sum() / n_pos
            iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            flat = ((cand_b * na + cand_a) * ny + cand_gj) * nx + cand_gi
            vals = jnp.where(mine, iou_d, -1.0).astype(pi.dtype)
            tobj = jnp.zeros((bs * na * ny * nx,), pi.dtype).at[flat].max(vals)
            tobj = jnp.clip(tobj, 0.0).reshape(bs, na, ny, nx)
            lobj = lobj + bce_with_logits(pi[..., 4], tobj, h.get("obj_pw", 1.0)).mean() * self.balance[i]
            if self.nc > 1:
                pcls = cand_rows[:, 5:5 + self.nc]
                t = jnp.full_like(pcls, self.cn)
                t = t.at[jnp.arange(t.shape[0]), gt_cls].set(self.cp)
                bce = bce_with_logits(pcls, t, h.get("cls_pw", 1.0))
                lcls = lcls + jnp.where(mine[:, None], bce, 0.0).sum() / (n_pos * self.nc)
        lbox = lbox * h.get("box", 0.05)
        lobj = lobj * h.get("obj", 1.0)
        lcls = lcls * h.get("cls", 0.5)
        return (lbox + lobj + lcls) * bs, jnp.stack([lbox, lobj, lcls])
