"""Anchor-assignment detection loss, fixed-shape for XLA.

Capability parity with reference utils/loss.py:91-234 (ComputeLoss +
build_targets) re-designed TPU-first:

- Targets arrive padded per image: (bs, M, 5) [cls, x, y, w, h] normalized,
  plus a validity mask — no dynamic shapes anywhere.
- build_targets produces the full dense candidate lattice (5 offsets × na ×
  bs·M) with a boolean mask instead of boolean-index compaction; every
  reduction is a masked mean, giving identical math to the reference's
  filtered tensors (same candidates, same weights).
- tobj writes use scatter-max instead of the reference's arbitrary-order
  overwrite of duplicate cells (utils/loss.py:160 leaves the winner among
  duplicates undefined unless sort_obj_iou; max is its deterministic upper
  envelope and equals the reference's result when sort_obj_iou=True).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.ops.boxes import bbox_iou


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """Positive/negative BCE targets for label smoothing (reference utils/loss.py:13)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(x, t, pos_weight: float = 1.0):
    """Elementwise torch BCEWithLogitsLoss with pos_weight."""
    return pos_weight * t * jax.nn.softplus(-x) + (1.0 - t) * jax.nn.softplus(x)


def focal_bce_with_logits(x, t, pos_weight: float = 1.0, gamma: float = 1.5,
                          alpha: float = 0.25):
    """FocalLoss wrapper around BCE (reference utils/loss.py:35-56)."""
    loss = bce_with_logits(x, t, pos_weight)
    p = jax.nn.sigmoid(x)
    p_t = t * p + (1 - t) * (1 - p)
    alpha_f = t * alpha + (1 - t) * (1 - alpha)
    return loss * alpha_f * (1.0 - p_t) ** gamma


_OFFSETS = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], np.float32) * 0.5


@dataclasses.dataclass
class Assignment:
    """Dense per-level target assignment: all arrays are (K,) or (K, ...) with
    K = 5 * na * bs * M and a validity mask."""
    b: jnp.ndarray        # image index
    a: jnp.ndarray        # anchor index
    gj: jnp.ndarray       # grid row
    gi: jnp.ndarray       # grid col
    tbox: jnp.ndarray     # (K,4) xywh in grid units (xy relative to cell)
    cls: jnp.ndarray      # class id
    tidx: jnp.ndarray     # per-image target index (for mask GT lookup)
    xywhn: jnp.ndarray    # (K,4) normalized xywh (for mask crop/area)
    anch: jnp.ndarray     # (K,2) anchor wh (grid units)
    valid: jnp.ndarray    # bool


def build_targets_level(targets: jnp.ndarray, tmask: jnp.ndarray,
                        anchors_l: jnp.ndarray, ny: int, nx: int,
                        anchor_t: float, bias: float = 0.5) -> Assignment:
    """Assignment for one level (reference utils/segment/loss.py:118-186 /
    utils/loss.py:171-234 without compaction).

    targets: (bs, M, 5) [cls,x,y,w,h] normalized; tmask: (bs, M) bool;
    anchors_l: (na, 2) grid units."""
    bs, M, _ = targets.shape
    na = anchors_l.shape[0]
    nt = bs * M

    tcls = targets[..., 0].reshape(nt)
    txy = targets[..., 1:3].reshape(nt, 2) * jnp.asarray([nx, ny], jnp.float32)
    twh = targets[..., 3:5].reshape(nt, 2) * jnp.asarray([nx, ny], jnp.float32)
    b_idx = jnp.repeat(jnp.arange(bs), M)
    t_idx = jnp.tile(jnp.arange(M), bs)
    valid0 = tmask.reshape(nt)

    # anchor-ratio compatibility (na, nt)
    r = twh[None, :, :] / anchors_l[:, None, :]
    compat = jnp.maximum(r, 1.0 / r).max(-1) < anchor_t
    base = valid0[None, :] & compat

    # neighbor-cell selection (reference g=0.5 bias; AuxOTA aux branch uses 1.0)
    g = bias
    gxy = txy
    gxi = jnp.asarray([nx, ny], jnp.float32) - gxy
    jj = (gxy[:, 0] % 1 < g) & (gxy[:, 0] > 1)
    kk = (gxy[:, 1] % 1 < g) & (gxy[:, 1] > 1)
    ll = (gxi[:, 0] % 1 < g) & (gxi[:, 0] > 1)
    mm = (gxi[:, 1] % 1 < g) & (gxi[:, 1] > 1)
    sel = jnp.stack([jnp.ones_like(jj), jj, kk, ll, mm])  # (5, nt)

    valid = (sel[:, None, :] & base[None, :, :]).reshape(-1)  # (5*na*nt,)

    off = jnp.asarray(_OFFSETS) * (g / 0.5)  # (5,2)
    gxy_off = gxy[None, :, :] - off[:, None, :]               # (5, nt, 2)
    gij = jnp.floor(gxy_off)
    gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)   # (5, nt)
    gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

    # broadcast to (5, na, nt) then flatten
    def bcast(x):
        if x.ndim == 1:      # per-target (nt,)
            x = jnp.broadcast_to(x[None, None, :], (5, na, nt))
        else:                # per-(offset, target) (5, nt)
            x = jnp.broadcast_to(x[:, None, :], (5, na, nt))
        return x.reshape(-1)

    tbox_xy = (gxy[None, :, :] - gij)                          # (5, nt, 2)
    tbox = jnp.concatenate([
        jnp.broadcast_to(tbox_xy[:, None], (5, na, nt, 2)).reshape(-1, 2),
        jnp.broadcast_to(twh[None, None], (5, na, nt, 2)).reshape(-1, 2),
    ], axis=1)
    xywhn = jnp.concatenate([
        jnp.broadcast_to(gxy[None, None], (5, na, nt, 2)).reshape(-1, 2) /
        jnp.asarray([nx, ny], jnp.float32),
        jnp.broadcast_to(twh[None, None], (5, na, nt, 2)).reshape(-1, 2) /
        jnp.asarray([nx, ny], jnp.float32),
    ], axis=1)
    a = jnp.broadcast_to(jnp.arange(na)[None, :, None], (5, na, nt)).reshape(-1)
    anch = anchors_l[a]

    return Assignment(
        b=bcast(b_idx), a=a, gj=bcast(gj), gi=bcast(gi), tbox=tbox,
        cls=bcast(tcls.astype(jnp.int32)), tidx=bcast(t_idx), xywhn=xywhn,
        anch=anch, valid=valid,
    )


class ComputeLoss:
    """Detection loss (reference utils/loss.py:91-168).

    Construct with head metadata; call with raw per-level outputs and padded
    targets. Jit-safe (all config static)."""

    def __init__(self, anchors, strides: Sequence[int], nc: int, hyp: Dict,
                 autobalance: bool = False):
        anchors = np.asarray(anchors, np.float32).reshape(len(strides), -1, 2)
        self.anchors_grid = jnp.asarray(anchors / np.asarray(strides, np.float32)[:, None, None])
        self.nc = int(nc)
        self.nl = len(strides)
        self.na = anchors.shape[1]
        self.hyp = dict(hyp)
        self.balance = {3: [4.0, 1.0, 0.4]}.get(self.nl, [4.0, 1.0, 0.25, 0.06, 0.02])
        self.cp, self.cn = smooth_bce(self.hyp.get("label_smoothing", 0.0))
        self.gr = 1.0
        if autobalance:
            raise NotImplementedError("autobalance requires cross-step state; use static balance")

    def _cls_obj_box(self, pi, asgn: Assignment):
        """Shared per-level box/cls losses + tobj map. Returns
        (lbox, lcls, tobj, iou, pred_rows, n_pos)."""
        h = self.hyp
        bs, na, ny, nx, no = pi.shape
        rows = pi[asgn.b, asgn.a, asgn.gj, asgn.gi]          # (K, no)
        valid_f = asgn.valid.astype(jnp.float32)
        n_pos = jnp.maximum(valid_f.sum(), 1.0)

        pxy = jax.nn.sigmoid(rows[:, 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(rows[:, 2:4]) * 2.0) ** 2 * asgn.anch
        pbox = jnp.concatenate([pxy, pwh], 1)
        iou = bbox_iou(pbox, asgn.tbox, xywh=True, CIoU=True)[:, 0]
        lbox = (jnp.where(asgn.valid, 1.0 - iou, 0.0).sum()) / n_pos

        iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        if self.gr < 1.0:
            iou_d = (1.0 - self.gr) + self.gr * iou_d
        flat = ((asgn.b * na + asgn.a) * ny + asgn.gj) * nx + asgn.gi
        vals = jnp.where(asgn.valid, iou_d, -1.0).astype(pi.dtype)
        tobj = jnp.zeros((bs * na * ny * nx,), pi.dtype).at[flat].max(vals)
        tobj = jnp.clip(tobj, 0.0).reshape(bs, na, ny, nx)

        lcls = jnp.zeros(())
        if self.nc > 1:
            pcls = rows[:, 5:5 + self.nc]
            t = jnp.full_like(pcls, self.cn)
            t = t.at[jnp.arange(t.shape[0]), asgn.cls].set(self.cp)
            g = h.get("fl_gamma", 0.0)
            if g > 0:
                bce = focal_bce_with_logits(pcls, t, h.get("cls_pw", 1.0), gamma=g)
            else:
                bce = bce_with_logits(pcls, t, h.get("cls_pw", 1.0))
            lcls = (jnp.where(asgn.valid[:, None], bce, 0.0).sum()) / (n_pos * self.nc)
        return lbox, lcls, tobj, iou, rows, n_pos

    def __call__(self, p: Sequence[jnp.ndarray], targets: jnp.ndarray, tmask: jnp.ndarray):
        """p: list of (bs,na,ny,nx,5+nc) raw; targets (bs,M,5); tmask (bs,M).

        Returns (loss*bs, components [lbox, lobj, lcls])."""
        h = self.hyp
        bs = p[0].shape[0]
        lbox = lobj = lcls = jnp.zeros(())
        for i, pi in enumerate(p):
            _, _, ny, nx, _ = pi.shape
            asgn = build_targets_level(targets, tmask, self.anchors_grid[i], ny, nx,
                                       h.get("anchor_t", 4.0))
            lb, lc, tobj, _, _, _ = self._cls_obj_box(pi, asgn)
            lbox = lbox + lb
            lcls = lcls + lc
            g = h.get("fl_gamma", 0.0)
            if g > 0:
                obj_bce = focal_bce_with_logits(pi[..., 4], tobj, h.get("obj_pw", 1.0), gamma=g)
            else:
                obj_bce = bce_with_logits(pi[..., 4], tobj, h.get("obj_pw", 1.0))
            lobj = lobj + obj_bce.mean() * self.balance[i]
        lbox = lbox * h.get("box", 0.05)
        lobj = lobj * h.get("obj", 1.0)
        lcls = lcls * h.get("cls", 0.5)
        loss = lbox + lobj + lcls
        return loss * bs, jnp.stack([lbox, lobj, lcls])
