"""Golden-metric integration tests (SURVEY §4 implication (c)): feed the
evaluators PERFECT predictions and require perfect scores — validates the
whole decode→NMS→matching→AP chain end to end without trained weights."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_dual_tpu.engine import evaluate_segment, evaluate_semantic


class _FakeSegModel:
    """Stands in for a SegmentationModel: apply() returns decoded predictions
    built from the ground truth (one perfect box+mask per target)."""

    def __init__(self, nc, nm, imgsz):
        self.nc, self.nm, self.imgsz = nc, nm, imgsz
        self.module = types.SimpleNamespace(apply=self._apply)

    def set_batch(self, targets, tmask, masks):
        self._targets, self._tmask, self._masks = targets, tmask, masks

    def _apply(self, variables, x, train=False):
        bs, h, w, _ = x.shape
        M = self._targets.shape[1]
        N = 64
        no = 5 + self.nc + self.nm
        pred = np.zeros((bs, N, no), np.float32)
        protos = np.zeros((bs, h // 4, w // 4, self.nm), np.float32)
        for b in range(bs):
            for i in range(M):
                if not self._tmask[b, i]:
                    continue
                cls, cx, cy, bw, bh = self._targets[b, i]
                pred[b, i, :4] = [cx * w, cy * h, bw * w, bh * h]
                pred[b, i, 4] = 0.99
                pred[b, i, 5 + int(cls)] = 0.99
                pred[b, i, 5 + self.nc + i] = 50.0  # coef: selects proto channel i
                protos[b, :, :, i] = np.where(self._masks[b] == i + 1, 8.0, -8.0)
        # this environment's CPU backend has a constant-folding miscompile for
        # jit-embedded constant predictions; tie outputs to x to stay a real
        # data-dependent computation
        eps = x.astype(jnp.float32).mean() * 0.0
        return jnp.asarray(pred) + eps, jnp.asarray(protos) + eps, None


def test_segment_evaluator_perfect_predictions():
    nc, nm, imgsz, bs, M = 3, 8, 64, 2, 4
    rng = np.random.default_rng(0)
    targets = np.zeros((bs, M, 5), np.float32)
    tmask = np.zeros((bs, M), bool)
    masks = np.zeros((bs, imgsz // 4, imgsz // 4), np.float32)
    mh = mw = imgsz // 4
    for b in range(bs):
        for i in range(2):
            # boxes aligned to the proto grid so crop_mask boundaries are exact
            x1, y1 = 2 + 7 * i, 2 + 7 * b
            x2, y2 = x1 + 5, y1 + 5
            cx, cy = (x1 + x2) / 2 / mw, (y1 + y2) / 2 / mh
            bw, bh = (x2 - x1) / mw, (y2 - y1) / mh
            targets[b, i] = [rng.integers(0, nc), cx, cy, bw, bh]
            tmask[b, i] = True
            masks[b, y1:y2, x1:x2] = i + 1

    model = _FakeSegModel(nc, nm, imgsz)
    model.set_batch(targets, tmask, masks)
    batch = {"image": np.zeros((bs, imgsz, imgsz, 3), np.uint8),
             "targets": targets, "tmask": tmask, "masks": masks,
             "n_valid": np.int32(bs)}
    mean, maps, t = evaluate_segment(model, {}, [batch], nc, nm=nm, conf_thres=0.5)
    # (mp, mr, map50, map, ...) for box then mask — all should be ~1
    assert mean[2] > 0.99 and mean[3] > 0.99, mean   # box mAP50, mAP50-95
    assert mean[6] > 0.99 and mean[7] > 0.99, mean   # mask mAP


class _FakeSemModel:
    def __init__(self, nc):
        self.nc = nc
        self.module = types.SimpleNamespace(apply=self._apply)

    def set_gt(self, gt):
        self._gt = gt

    def _apply(self, variables, x, train=False):
        import jax
        onehot = jax.nn.one_hot(jnp.asarray(self._gt), self.nc) * 10.0
        return onehot + x.astype(jnp.float32).mean() * 0.0


def test_semantic_evaluator_perfect_predictions(rng):
    nc, bs, hw = 5, 2, 32
    gt = rng.integers(0, nc, (bs, hw, hw)).astype(np.int32)
    model = _FakeSemModel(nc)
    model.set_gt(gt)
    batch = {"image": np.zeros((bs, hw, hw, 3), np.uint8), "mask": gt,
             "n_valid": np.int32(bs)}
    (miou, _, _, _), per_cls, _ = evaluate_semantic(model, {}, [batch], nc, ignore_index=None)
    assert miou > 0.999, miou
    assert np.nanmin(per_cls) > 0.999


def test_segment_evaluator_wrong_class_scores_zero():
    """Shifted class ids must score ~0 — the matcher is class-aware."""
    nc, nm, imgsz, bs, M = 3, 8, 64, 1, 4
    targets = np.zeros((bs, M, 5), np.float32)
    tmask = np.zeros((bs, M), bool)
    masks = np.zeros((bs, imgsz // 4, imgsz // 4), np.float32)
    targets[0, 0] = [0, 0.5, 0.5, 0.3, 0.3]
    tmask[0, 0] = True
    masks[0, 6:10, 6:10] = 1

    model = _FakeSegModel(nc, nm, imgsz)
    wrong = targets.copy()
    wrong[0, 0, 0] = 1  # predict class 1 for a class-0 gt
    model.set_batch(wrong, tmask, masks)
    batch = {"image": np.zeros((bs, imgsz, imgsz, 3), np.uint8),
             "targets": targets, "tmask": tmask, "masks": masks,
             "n_valid": np.int32(bs)}
    mean, _, _ = evaluate_segment(model, {}, [batch], nc, nm=nm, conf_thres=0.5)
    assert mean[3] < 0.01, mean
