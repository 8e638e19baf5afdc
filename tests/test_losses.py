"""Loss parity tests vs the reference implementations run live as oracles."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = Path("/root/reference")
torch = pytest.importorskip("torch")


def _stub_and_path():
    from test_torch_parity import _stub_torchvision
    _stub_torchvision()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


ANCHORS_PX = np.array([[[10, 13], [16, 30], [33, 23]],
                       [[30, 61], [62, 45], [59, 119]],
                       [[116, 90], [156, 198], [373, 326]]], np.float32)
STRIDES = [8, 16, 32]
HYP = dict(box=0.05, cls=0.5, cls_pw=1.0, obj=1.0, obj_pw=1.0, anchor_t=4.0,
           fl_gamma=0.0, label_smoothing=0.0)


def make_targets(rng, bs, max_m, nc):
    """Random padded targets; returns (padded (bs,M,5), mask, flat torch (nt,6))."""
    tgts = np.zeros((bs, max_m, 5), np.float32)
    mask = np.zeros((bs, max_m), bool)
    flat = []
    for b in range(bs):
        n = rng.integers(1, max_m)
        cls = rng.integers(0, nc, n)
        xy = rng.uniform(0.15, 0.85, (n, 2))
        wh = rng.uniform(0.05, 0.3, (n, 2))
        tgts[b, :n, 0] = cls
        tgts[b, :n, 1:3] = xy
        tgts[b, :n, 3:5] = wh
        mask[b, :n] = True
        for i in range(n):
            flat.append([b, cls[i], *xy[i], *wh[i]])
    return tgts, mask, np.array(flat, np.float32)


class _FakeDetect(torch.nn.Module):
    def __init__(self, nc, nm=0):
        super().__init__()
        self.na, self.nl, self.nc, self.nm = 3, 3, nc, nm
        self.register_buffer("anchors", torch.tensor(ANCHORS_PX / np.array(STRIDES, np.float32)[:, None, None]))
        self.stride = torch.tensor(STRIDES, dtype=torch.float32)


class _FakeModel(torch.nn.Module):
    def __init__(self, nc, hyp, nm=0):
        super().__init__()
        self.model = torch.nn.ModuleList([_FakeDetect(nc, nm)])
        self.hyp = hyp
        self._p = torch.nn.Parameter(torch.zeros(1))


def rand_preds(rng, bs, nc, nm, size=64):
    out = []
    for s in STRIDES:
        ny = nx = size // s
        out.append(rng.standard_normal((bs, 3, ny, nx, 5 + nc + nm)).astype(np.float32))
    return out


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_detect_loss_parity():
    _stub_and_path()
    from utils.loss import ComputeLoss as RefLoss

    rng = np.random.default_rng(3)
    bs, nc, M = 2, 5, 8
    preds = rand_preds(rng, bs, nc, 0)
    tgts, tmask, flat = make_targets(rng, bs, M, nc)

    ref = RefLoss(_FakeModel(nc, HYP))
    ref.sort_obj_iou = True  # makes duplicate-cell writes deterministic (max) == our scatter-max
    ref_loss, ref_items = ref([torch.tensor(p) for p in preds], torch.tensor(flat))

    from yolo_dual_tpu.losses import ComputeLoss
    ours = ComputeLoss(ANCHORS_PX, STRIDES, nc, HYP)
    loss, items = ours([jnp.asarray(p) for p in preds], jnp.asarray(tgts), jnp.asarray(tmask))

    # components ordering: ref [lbox, lobj, lcls]
    np.testing.assert_allclose(np.asarray(items), ref_items.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
@pytest.mark.parametrize("overlap", [True, False])
def test_segment_loss_parity(overlap):
    _stub_and_path()
    from utils.segment.loss import ComputeLoss as RefSegLoss

    rng = np.random.default_rng(4)
    bs, nc, nm, M = 2, 4, 6, 6
    size = 64
    preds = rand_preds(rng, bs, nc, nm, size)
    protos = rng.standard_normal((bs, nm, size // 4, size // 4)).astype(np.float32)
    tgts, tmask, flat = make_targets(rng, bs, M, nc)

    mh = mw = size // 4
    if overlap:
        masks_t = np.zeros((bs, mh, mw), np.float32)
        for b in range(bs):
            n = int(tmask[b].sum())
            for i in range(n):
                cx, cy, w, h = (tgts[b, i, 1:5] * np.array([mw, mh, mw, mh]))
                x1, y1 = int(max(cx - w / 2, 0)), int(max(cy - h / 2, 0))
                x2, y2 = int(min(cx + w / 2, mw)), int(min(cy + h / 2, mh))
                masks_t[b, y1:y2, x1:x2] = i + 1
        ref_masks = torch.tensor(masks_t)
        our_masks = jnp.asarray(masks_t)
    else:
        inst = np.zeros((bs, M, mh, mw), np.float32)
        for b in range(bs):
            n = int(tmask[b].sum())
            for i in range(n):
                cx, cy, w, h = (tgts[b, i, 1:5] * np.array([mw, mh, mw, mh]))
                x1, y1 = int(max(cx - w / 2, 0)), int(max(cy - h / 2, 0))
                x2, y2 = int(min(cx + w / 2, mw)), int(min(cy + h / 2, mh))
                inst[b, i, y1:y2, x1:x2] = 1.0
        # reference non-overlap mode indexes masks by GLOBAL target index
        ref_masks = torch.tensor(np.concatenate([inst[b, tmask[b]] for b in range(bs)]))
        our_masks = jnp.asarray(inst)

    # Two oracle runs: sort_obj_iou=True makes the reference's duplicate-cell
    # tobj writes deterministic (== our scatter-max) but scrambles its mask
    # pairing (reference bug: utils/segment/loss.py:71-73 reorders b without
    # reordering pmask/tidxs). So lobj comes from the sorted run, everything
    # else from the default run.
    ref = RefSegLoss(_FakeModel(nc, HYP, nm), overlap=overlap)
    _, ref_items = ref(
        ([torch.tensor(p) for p in preds], torch.tensor(protos)),
        torch.tensor(flat), ref_masks)
    ref_sorted = RefSegLoss(_FakeModel(nc, HYP, nm), overlap=overlap)
    ref_sorted.sort_obj_iou = True
    _, ref_items_sorted = ref_sorted(
        ([torch.tensor(p) for p in preds], torch.tensor(protos)),
        torch.tensor(flat), ref_masks)

    from yolo_dual_tpu.losses import ComputeSegmentLoss
    ours = ComputeSegmentLoss(ANCHORS_PX, STRIDES, nc, nm, HYP, overlap=overlap)
    loss, items = ours(
        ([jnp.asarray(p) for p in preds], jnp.asarray(protos.transpose(0, 2, 3, 1))),
        jnp.asarray(tgts), jnp.asarray(tmask), our_masks)

    items = np.asarray(items)  # [lbox, lseg, lobj, lcls]
    expected = ref_items.numpy()
    expected[2] = ref_items_sorted.numpy()[2]
    np.testing.assert_allclose(items, expected, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(float(loss), float(expected.sum()) * 2, rtol=3e-4)  # bs=2


def test_semantic_loss_vs_torch_oracle():
    rng = np.random.default_rng(5)
    bs, h, w, nc = 2, 16, 16, 5
    pred = rng.standard_normal((bs, h, w, nc)).astype(np.float32)
    target = rng.integers(0, nc, (bs, h, w))
    weights = rng.uniform(0.5, 3.0, nc).astype(np.float32)

    import torch.nn.functional as F
    tp = torch.tensor(pred.transpose(0, 3, 1, 2))
    tt = torch.tensor(target)
    tw = torch.tensor(weights)
    ce_ref = F.cross_entropy(tp, tt, weight=tw, label_smoothing=0.1)
    prob = tp.softmax(1)
    onehot = torch.zeros(bs, nc, h, w).scatter_(1, tt.unsqueeze(1), 1.0)
    wpred = prob * tw.view(1, -1, 1, 1)
    inter = (wpred * onehot).sum(dim=(2, 3))
    dice = (2 * inter + 1e-6) / (wpred.sum((2, 3)) + onehot.sum((2, 3)) + 1e-6)
    dice_ref = 1 - dice.mean()
    total_ref = ce_ref + 0.5 * dice_ref

    from yolo_dual_tpu.losses import SemanticSegLoss
    loss_fn = SemanticSegLoss(nc, label_smoothing=0.1, class_weights=weights, flavor="dice")
    total, (t, ce, dice_l) = loss_fn(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(ce), float(ce_ref), rtol=1e-5)
    np.testing.assert_allclose(float(dice_l), float(dice_ref), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)


def test_semantic_loss_jaccard_and_resize():
    rng = np.random.default_rng(6)
    pred = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    target = rng.integers(0, 3, (1, 32, 32))  # loss must nearest-downsample target
    from yolo_dual_tpu.losses import SemanticSegLoss
    loss_fn = SemanticSegLoss(3, flavor="jaccard")
    total, _ = loss_fn(jnp.asarray(pred), jnp.asarray(target))
    assert np.isfinite(float(total))
