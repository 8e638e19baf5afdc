"""Metric parity tests vs the reference metrics run live as oracles."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")


def _ref_path():
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


def fake_preds(rng, n=200, nc=6, niou=10):
    tp = rng.uniform(0, 1, (n, niou))
    tp = (tp > np.linspace(0.3, 0.8, niou)[None, :])
    # enforce monotone TP across IoU thresholds like real matching
    tp = np.sort(tp.astype(int), axis=1)[:, ::-1].astype(bool)
    conf = rng.uniform(0, 1, n)
    pred_cls = rng.integers(0, nc, n)
    target_cls = rng.integers(0, nc, n * 2)
    return tp, conf, pred_cls, target_cls


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_ap_per_class_parity(rng):
    _ref_path()
    from utils.metrics import ap_per_class as ref_ap
    from yolo_dual_tpu.metrics import ap_per_class

    tp, conf, pred_cls, target_cls = fake_preds(rng)
    r_tp, r_fp, r_p, r_r, r_f1, r_ap, r_cls = ref_ap(tp, conf, pred_cls, target_cls, names={})
    o_tp, o_fp, o_p, o_r, o_f1, o_ap, o_cls = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_array_equal(o_cls, r_cls)
    np.testing.assert_allclose(o_ap, r_ap, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(o_p, r_p, rtol=1e-6)
    np.testing.assert_allclose(o_r, r_r, rtol=1e-6)
    np.testing.assert_allclose(o_f1, r_f1, rtol=1e-6)
    np.testing.assert_array_equal(o_tp, r_tp)
    np.testing.assert_array_equal(o_fp, r_fp)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_box_and_mask_metrics_parity(rng):
    _ref_path()
    from utils.segment.metrics import ap_per_class_box_and_mask as ref_bm
    from yolo_dual_tpu.metrics import ap_per_class_box_and_mask, Metrics

    tp_b, conf, pred_cls, target_cls = fake_preds(rng)
    tp_m = fake_preds(rng)[0]
    ref = ref_bm(tp_m, tp_b, conf, pred_cls, target_cls, names={})  # ref arg order: (tp_m, tp_b)
    ours = ap_per_class_box_and_mask(tp_b, tp_m, conf, pred_cls, target_cls)
    # our signature is (box, mask); reference stores under the same keys
    np.testing.assert_allclose(ours["boxes"]["ap"], ref["boxes"]["ap"], rtol=1e-6)
    np.testing.assert_allclose(ours["masks"]["ap"], ref["masks"]["ap"], rtol=1e-6)

    m = Metrics()
    m.update(ours)
    res = m.mean_results()
    assert len(res) == 8 and all(np.isfinite(res))


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_fitness_parity(rng):
    _ref_path()
    from utils.metrics import fitness as ref_fitness
    from yolo_dual_tpu.metrics import fitness
    x = rng.uniform(0, 1, (3, 7))
    np.testing.assert_allclose(fitness(x), ref_fitness(x), rtol=1e-7)


def test_semantic_confusion_matrix_miou(rng):
    from yolo_dual_tpu.metrics import SegmentationConfusionMatrix
    nc = 4
    cm = SegmentationConfusionMatrix(nc, ignore_index=3)
    pred = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    tgt = np.array([0, 1, 1, 1, 2, 0, 3, 2])
    cm.update(pred, tgt)
    miou, iou = cm.compute_iou()
    # class0: tp=1 fp=1 fn=1 -> 1/3; class1: tp=2 fp=0 fn=1 -> 2/3;
    # class2: tp=1 fp=1 fn=1 -> 1/3; class3 ignored
    np.testing.assert_allclose(iou[:3], [1 / 3, 2 / 3, 1 / 3])
    np.testing.assert_allclose(miou, np.mean([1 / 3, 2 / 3, 1 / 3]))


def test_match_predictions_tp_matrix():
    from yolo_dual_tpu.metrics.seg import match_predictions
    iou = np.array([[0.9, 0.2], [0.3, 0.6]])  # gt x pred
    pred_cls = np.array([0, 1])
    gt_cls = np.array([0, 1])
    correct = match_predictions(pred_cls, gt_cls, iou, iouv=np.array([0.5, 0.7]))
    assert correct[0].tolist() == [True, True]    # pred0 matches gt0 at 0.9
    assert correct[1].tolist() == [True, False]   # pred1 matches gt1 at 0.6 only @0.5


def test_match_predictions_device_parity(rng):
    """Device matcher (metrics/seg.py match_predictions_device) must equal the
    numpy reference matcher on random class/IoU inputs with padding."""
    import jax.numpy as jnp
    from yolo_dual_tpu.metrics.seg import match_predictions, match_predictions_device
    for trial in range(5):
        M, D = 17, 40
        n_gt = int(rng.integers(0, M + 1))
        n_det = int(rng.integers(0, D + 1))
        gt_cls = rng.integers(0, 4, M).astype(np.float32)
        pred_cls = rng.integers(0, 4, D).astype(np.float32)
        iou = rng.uniform(0, 1, (M, D)).astype(np.float32)
        pair_ok = np.zeros((M, D), bool)
        pair_ok[:n_gt, :n_det] = True
        iou = np.where(pair_ok, iou, 0.0)
        ref = match_predictions(pred_cls[:n_det], gt_cls[:n_gt], iou[:n_gt, :n_det])
        dev = np.asarray(match_predictions_device(jnp.asarray(pred_cls),
                                                  jnp.asarray(gt_cls),
                                                  jnp.asarray(iou)))
        np.testing.assert_array_equal(dev[:n_det], ref, err_msg=f"trial {trial}")
        assert not dev[n_det:].any()
