"""Op parity tests (the double-implementation pattern of the reference's
ops_dcnv3/test.py): NMS vs a numpy greedy oracle, IoU vs the reference
implementation run live as an oracle (when /root/reference is present),
mask ops vs numpy oracles."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_dual_tpu.ops import (
    bbox_iou, box_iou, crop_mask, mask_iou, process_mask, xywh2xyxy, xyxy2xywh,
)
from yolo_dual_tpu.ops.nms import nms_padded, non_max_suppression, soft_nms_padded

REFERENCE = Path("/root/reference")


def random_boxes(rng, n, size=640):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(4, size / 4, (n, 2))
    return np.concatenate([xy, wh], 1).astype(np.float32)  # xywh


def np_iou_matrix(a, b, eps=1e-7):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = np.clip(br - tl, 0, None).prod(-1)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + ab[None] - inter + eps)


def np_greedy_nms(boxes, scores, iou_thres):
    """Canonical greedy NMS (torchvision.ops.nms semantics: suppress IoU > thres,
    stable descending-score order)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    iou = np_iou_matrix(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_thres
        suppressed[i] = True
    return np.array(keep, np.int64)


def test_xywh_roundtrip(rng):
    b = random_boxes(rng, 50)
    out = np.asarray(xyxy2xywh(xywh2xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-3)


def test_box_iou_vs_numpy(rng):
    a = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, 40))))
    b = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, 30))))
    ours = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, np_iou_matrix(a, b), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
@pytest.mark.parametrize("variant", ["plain", "GIoU", "DIoU", "CIoU"])
def test_bbox_iou_vs_reference_oracle(rng, variant):
    """Run the reference's bbox_iou (utils/metrics.py:225-263) as a live oracle."""
    torch = pytest.importorskip("torch")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from utils.metrics import bbox_iou as ref_bbox_iou  # noqa

    a = random_boxes(rng, 64)
    b = random_boxes(rng, 64)
    kw = {} if variant == "plain" else {variant: True}
    ours = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=True, **kw))[:, 0]
    ref = ref_bbox_iou(torch.tensor(a), torch.tensor(b), xywh=True, **kw).numpy()[:, 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_nms_matches_numpy_oracle(rng):
    n = 300
    boxes = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, n, 160))))
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    keep_ref = np_greedy_nms(boxes, scores, 0.45)
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.45, n))
    keep = keep[keep >= 0]
    np.testing.assert_array_equal(keep, keep_ref)


def test_nms_max_det_truncation(rng):
    n = 200
    boxes = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, n, 2000))))
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    keep_ref = np_greedy_nms(boxes, scores, 0.45)[:10]
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 10))
    keep = keep[keep >= 0]
    np.testing.assert_array_equal(keep, keep_ref)


def test_soft_nms_decays_duplicates(rng):
    # two near-identical high-score boxes + one distant: soft-NMS keeps the
    # distant one and the best duplicate, decays the other below threshold
    boxes = jnp.asarray([[0, 0, 50, 50], [1, 1, 51, 51], [200, 200, 260, 260]], jnp.float32)
    scores = jnp.asarray([0.9, 0.85, 0.6], jnp.float32)
    keep, kept_scores = soft_nms_padded(boxes, scores, 0.45, 3, sigma=0.5,
                                        score_threshold=0.25)
    keep, kept_scores = np.asarray(keep), np.asarray(kept_scores)
    kept = keep[keep >= 0]
    assert 0 in kept and 2 in kept
    assert 1 not in kept  # decayed: exp(-0.92²/0.5) * 0.85 ≈ 0.16 < 0.25
    # selection-time scores propagate: undecayed picks keep original conf
    np.testing.assert_allclose(kept_scores[keep >= 0], [0.9, 0.6], atol=1e-6)
    # decay applies only above iou_thres: a mid-overlap box (iou<=0.45)
    # keeps its full score (reference decays only iou > iou_thresh)
    boxes2 = jnp.asarray([[0, 0, 50, 50], [25, 0, 75, 50], [200, 200, 260, 260]], jnp.float32)
    scores2 = jnp.asarray([0.9, 0.5, 0.6], jnp.float32)
    k2, s2 = soft_nms_padded(boxes2, scores2, 0.45, 3, sigma=0.5, score_threshold=0.25)
    k2, s2 = np.asarray(k2), np.asarray(s2)
    assert set(k2[k2 >= 0]) == {0, 1, 2}
    np.testing.assert_allclose(sorted(s2[k2 >= 0]), [0.5, 0.6, 0.9], atol=1e-6)


def _reference_full_nms(pred, conf_thres, iou_thres, max_det, nm=0, multi_label=False, agnostic=False):
    """The reference non_max_suppression flow (utils/general.py:886-1001)
    transcribed as a numpy oracle."""
    outs = []
    nc = pred.shape[2] - nm - 5
    mi = 5 + nc
    for x in pred:
        x = x[x[:, 4] > conf_thres]
        if not x.shape[0]:
            outs.append(np.zeros((0, 6 + nm), np.float32))
            continue
        x[:, 5:] *= x[:, 4:5]
        box = np.asarray(xywh2xyxy(jnp.asarray(x[:, :4])))
        mask = x[:, mi:]
        if multi_label:
            i, j = (x[:, 5:mi] > conf_thres).nonzero()
            x = np.concatenate((box[i], x[i, 5 + j, None], j[:, None].astype(np.float32), mask[i]), 1)
        else:
            conf = x[:, 5:mi].max(1, keepdims=True)
            j = x[:, 5:mi].argmax(1, keepdims=True)
            x = np.concatenate((box, conf, j.astype(np.float32), mask), 1)[conf.ravel() > conf_thres]
        if not x.shape[0]:
            outs.append(np.zeros((0, 6 + nm), np.float32))
            continue
        x = x[np.argsort(-x[:, 4], kind="stable")]
        c = x[:, 5:6] * (0 if agnostic else 7680)
        keep = np_greedy_nms(x[:, :4] + c, x[:, 4], iou_thres)
        outs.append(x[keep[:max_det]])
    return outs


@pytest.mark.parametrize("multi_label", [False, True])
def test_full_nms_parity(rng, multi_label):
    bs, n, nc, nm = 2, 400, 7, 4
    pred = rng.uniform(0, 1, (bs, n, 5 + nc + nm)).astype(np.float32)
    pred[..., :2] = rng.uniform(50, 200, (bs, n, 2))
    pred[..., 2:4] = rng.uniform(10, 80, (bs, n, 2))
    ref = _reference_full_nms(pred.copy(), 0.4, 0.45, 50, nm=nm, multi_label=multi_label)
    ours = non_max_suppression(pred, 0.4, 0.45, max_det=50, nm=nm, multi_label=multi_label)
    for o, r in zip(ours, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(o[:, :6], r[:, :6], rtol=1e-4, atol=1e-4)


def test_crop_mask_oracle(rng):
    n, h, w = 3, 16, 16
    masks = rng.uniform(0, 1, (n, h, w)).astype(np.float32)
    boxes = np.array([[2, 3, 10, 12], [0, 0, 16, 16], [5, 5, 6, 6]], np.float32)
    out = np.asarray(crop_mask(jnp.asarray(masks), jnp.asarray(boxes)))
    for i in range(n):
        x1, y1, x2, y2 = boxes[i].astype(int)
        expect = np.zeros_like(masks[i])
        expect[y1:y2, x1:x2] = masks[i, y1:y2, x1:x2]
        np.testing.assert_allclose(out[i], expect)


def test_process_mask_shapes(rng):
    mh = mw = 16
    c = 8
    protos = rng.standard_normal((mh, mw, c)).astype(np.float32)
    coefs = rng.standard_normal((5, c)).astype(np.float32)
    boxes = np.tile(np.array([[8, 8, 50, 60]], np.float32), (5, 1))
    m = process_mask(jnp.asarray(protos), jnp.asarray(coefs), jnp.asarray(boxes), (64, 64))
    assert m.shape == (5, 16, 16) and m.dtype == jnp.bool_
    m2 = process_mask(jnp.asarray(protos), jnp.asarray(coefs), jnp.asarray(boxes), (64, 64), upsample=True)
    assert m2.shape == (5, 64, 64)


def test_mask_iou(rng):
    a = (rng.uniform(0, 1, (4, 100)) > 0.5).astype(np.float32)
    b = (rng.uniform(0, 1, (3, 100)) > 0.5).astype(np.float32)
    out = np.asarray(mask_iou(jnp.asarray(a), jnp.asarray(b)))
    inter = a @ b.T
    union = a.sum(1)[:, None] + b.sum(1)[None] - inter
    np.testing.assert_allclose(out, inter / (union + 1e-7), rtol=1e-5)


def test_nms_from_raw_matches_decode_then_nms(rng):
    """The fused raw->topk->decode->NMS path must be numerically equivalent to
    Detect decode + nms_batched (f32 model so both decode in f32)."""
    import jax.numpy as jnp
    from yolo_dual_tpu.ops.nms import nms_batched, nms_from_raw

    ANCH = ((10, 13, 16, 30, 33, 23), (30, 61, 62, 45, 59, 119))
    STRIDES = (8, 16)
    nc, nm, na = 3, 4, 3
    no = 5 + nc + nm
    bs = 2
    raw = []
    for (ny, nx) in ((16, 16), (8, 8)):
        r = rng.standard_normal((bs, na, ny, nx, no)).astype(np.float32)
        r[..., 4] += 1.0  # push some objectness above threshold
        raw.append(jnp.asarray(r))

    # reference decoded path (heads.py decode math, f32)
    zs = []
    for p, anchor, s in zip(raw, ANCH, STRIDES):
        _, _, ny, nx, _ = p.shape
        yv, xv = np.meshgrid(np.arange(ny, dtype=np.float32),
                             np.arange(nx, dtype=np.float32), indexing="ij")
        grid = jnp.asarray(np.stack([xv, yv], -1) - 0.5)[None, None]
        agrid = jnp.asarray(np.asarray(anchor, np.float32).reshape(na, 2))[None, :, None, None, :]
        import jax
        xy = (jax.nn.sigmoid(p[..., :2]) * 2 + grid) * s
        wh = (jax.nn.sigmoid(p[..., 2:4]) * 2) ** 2 * agrid
        y = jnp.concatenate([xy, wh, jax.nn.sigmoid(p[..., 4:5 + nc]), p[..., 5 + nc:]], -1)
        zs.append(y.reshape(bs, -1, no))
    pred = jnp.concatenate(zs, axis=1)

    for ml in (False, True):
        ref_out, ref_nv = nms_batched(pred, conf_thres=0.3, iou_thres=0.5,
                                      multi_label=ml, max_det=20, nm=nm,
                                      pre_nms_topk=256)
        out, nv = nms_from_raw(tuple(raw), ANCH, STRIDES, conf_thres=0.3,
                               iou_thres=0.5, multi_label=ml, max_det=20, nm=nm,
                               pre_nms_topk=256)
        np.testing.assert_array_equal(np.asarray(nv), np.asarray(ref_nv), err_msg=f"ml={ml}")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-5, atol=1e-5, err_msg=f"ml={ml}")


def test_cluster_nms_equals_greedy(rng):
    """Matrix-iteration cluster NMS (nms_padded_cluster) must equal the serial
    greedy while_loop EXACTLY — keep set, order, and padding — including on
    duplicate boxes, tied scores, and n < max_det."""
    import jax
    import jax.numpy as jnp
    import yolo_dual_tpu.ops.nms as N

    def greedy(boxes, scores, thr, max_det):
        def cond(c):
            s, out, k = c
            return jnp.logical_and(k < max_det, jnp.max(s) > 0)

        def body(c):
            s, out, k = c
            i = jnp.argmax(s)
            out = out.at[k].set(i.astype(jnp.int32))
            iou = N._iou_one_vs_many(boxes[i], boxes)
            kill = (iou > thr).at[i].set(True)
            return jnp.where(kill, -1.0, s), out, k + 1

        out0 = jnp.full((max_det,), -1, jnp.int32)
        _, out, _ = jax.lax.while_loop(cond, body, (scores, out0, jnp.int32(0)))
        return out

    for trial in range(8):
        n = int(rng.integers(4, 120))
        xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        wh = rng.uniform(2, 60, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], 1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        scores[rng.choice(n, int(rng.integers(0, n)), replace=False)] = 0.0
        if n > 10:
            boxes[1] = boxes[0]
            scores[1] = scores[0]
        order = np.argsort(-scores)
        boxes, scores = boxes[order], scores[order]
        for thr, md in ((0.3, 7), (0.5, 200)):
            a = np.asarray(greedy(jnp.asarray(boxes), jnp.asarray(scores), thr, md))
            b = np.asarray(N.nms_padded_cluster(jnp.asarray(boxes), jnp.asarray(scores), thr, md))
            np.testing.assert_array_equal(a, b, err_msg=f"trial {trial} thr {thr}")


def test_block_nms_equals_greedy(rng):
    """Block-greedy NMS (nms_padded_block) must equal the serial greedy loop
    EXACTLY — keep set, order, padding — across random inputs, tied scores,
    duplicate boxes, n < max_det, and block sizes that don't divide the keep
    count."""
    import jax.numpy as jnp
    import yolo_dual_tpu.ops.nms as N

    for trial in range(8):
        n = int(rng.integers(4, 160))
        xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        wh = rng.uniform(2, 60, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], 1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        scores[rng.choice(n, int(rng.integers(0, n)), replace=False)] = 0.0
        if n > 10:
            boxes[1] = boxes[0]
            scores[1] = scores[0]
        order = np.argsort(-scores)
        boxes, scores = boxes[order], scores[order]
        for thr, md in ((0.3, 7), (0.5, 200)):
            for blk in (4, 16):
                a = np.asarray(N.nms_padded_serial(jnp.asarray(boxes), jnp.asarray(scores), thr, md))
                b = np.asarray(N.nms_padded_block(jnp.asarray(boxes), jnp.asarray(scores),
                                                  thr, md, block=blk))
                np.testing.assert_array_equal(
                    a, b, err_msg=f"trial {trial} thr {thr} block {blk}")


REFERENCE = Path("/root/reference")


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_soft_nms_oracle_parity(rng):
    """soft_nms_padded vs the reference's soft_nms run LIVE (the drop-in
    utils/general-softnms.py:938-967). The module itself can't be imported
    (needs pkg_resources + a dashed filename), so the two relevant function
    defs are extracted by ast and exec'd with torch."""
    import ast

    torch = pytest.importorskip("torch")
    src = (REFERENCE / "utils" / "general-softnms.py").read_text()
    tree = ast.parse(src)
    wanted = {n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name in ("box_iou_for_nms", "soft_nms")}
    ns = {"torch": torch, "math": __import__("math"), "np": np}
    exec(compile(ast.Module(body=list(wanted), type_ignores=[]), "<ref>", "exec"), ns)
    ref_soft_nms = ns["soft_nms"]

    from yolo_dual_tpu.ops.nms import soft_nms_padded
    for trial in range(5):
        n = 40
        xy = rng.uniform(0, 80, (n, 2)).astype(np.float32)
        wh = rng.uniform(10, 40, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], 1)
        scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
        # the reference's NMS entry pre-sorts by confidence (general-softnms
        # :1047), which masks its keep-index-0-first quirk — match that
        order = np.argsort(-scores)
        boxes, scores = boxes[order], scores[order]

        ref_keep = [int(i) for i in ref_soft_nms(
            torch.tensor(boxes), torch.tensor(scores.copy()),
            iou_thresh=0.5, sigma=0.5, score_threshold=0.25)]

        keep, kept_scores = soft_nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                            0.5, n, sigma=0.5, score_threshold=0.25)
        ours = [int(k) for k, s in zip(np.asarray(keep), np.asarray(kept_scores))
                if s > 0]
        # exact keep ORDER parity; the reference's `while order.numel() > 1`
        # drops the final lone survivor, so we may keep at most one more
        assert ours[:len(ref_keep)] == ref_keep, (trial, ref_keep[:8], ours[:8])
        assert len(ours) - len(ref_keep) <= 1, (trial, len(ours), len(ref_keep))
