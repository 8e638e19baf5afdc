"""Data-parallel evaluation: sharding the val batch over the 8-device mesh
must reproduce single-device metrics exactly (the eval analog of the DP
training-trajectory test; reference val loops are single-GPU, so this is the
TPU-native scale-out surface of segment/val.py / unet-lite val_diceloss.py)."""

import numpy as np

import jax

from yolo_dual_tpu.engine import evaluate_segment, evaluate_semantic
from yolo_dual_tpu.losses import SemanticSegLoss
from yolo_dual_tpu.models.model import SegmentationModel, SemanticSegModel

TINY_SEG = dict(
    nc=3, depth_multiple=1.0, width_multiple=1.0,
    anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
    backbone=[
        [-1, 1, "Conv", [8, 6, 2, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [-1, 1, "Conv", [24, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    head=[[[3, 4], 1, "Segment", ["nc", "anchors", 4, 8]]],
)

TINY_SEM = dict(
    nc=3, compiler="semantic", activation="relu",
    backbone=[[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
    head=[[-1, 1, "Upsample", [None, 4, "nearest"]], [-1, 1, "Conv", [3, 1, 1]]],
)


def _cpu_mesh(n):
    from jax.sharding import Mesh
    devs = jax.devices("cpu")
    assert len(devs) >= n
    return Mesh(np.asarray(devs[:n]), ("data",))


def _seg_batches(rng, n_batches=2, bs=8, imgsz=64, M=4):
    batches = []
    for _ in range(n_batches):
        targets = np.zeros((bs, M, 5), np.float32)
        tmask = np.zeros((bs, M), bool)
        masks = np.zeros((bs, imgsz // 4, imgsz // 4), np.float32)
        for b in range(bs):
            for i in range(2):
                cx, cy = rng.uniform(0.3, 0.7, 2)
                bw, bh = rng.uniform(0.2, 0.3, 2)
                targets[b, i] = [rng.integers(0, 3), cx, cy, bw, bh]
                tmask[b, i] = True
                y0, x0 = int(cy * 16) - 2, int(cx * 16) - 2
                masks[b, max(y0, 0):y0 + 4, max(x0, 0):x0 + 4] = i + 1
        batches.append({
            "image": rng.uniform(0, 255, (bs, imgsz, imgsz, 3)).astype(np.uint8),
            "targets": targets, "tmask": tmask, "masks": masks,
            "n_valid": np.int32(bs),
        })
    return batches


def test_segment_eval_data_parallel_matches_single(rng):
    model = SegmentationModel(TINY_SEG)
    variables = model.init(imgsz=64)
    batches = _seg_batches(np.random.default_rng(3))
    # conf_thres low so random-weight predictions produce nonempty stats
    single = evaluate_segment(model, variables, batches, 3, nm=4,
                              conf_thres=0.001, fuse=True)
    dp = evaluate_segment(model, variables, batches, 3, nm=4,
                          conf_thres=0.001, fuse=True, mesh=_cpu_mesh(8))
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(dp[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(single[1], dp[1], rtol=1e-5, atol=1e-7)


def test_semantic_eval_data_parallel_matches_single(rng):
    model = SemanticSegModel(TINY_SEM)
    variables = model.init(imgsz=32)
    g = np.random.default_rng(5)
    batches = []
    for _ in range(2):
        img = g.uniform(0, 255, (8, 32, 32, 3)).astype(np.uint8)
        mask = (img[..., 0].astype(np.int32)) % 3
        batches.append({"image": img, "mask": mask, "n_valid": np.int32(8)})
    loss_fn = SemanticSegLoss(3)
    single = evaluate_semantic(model, variables, batches, 3, ignore_index=None,
                               loss_fn=loss_fn)
    dp = evaluate_semantic(model, variables, batches, 3, ignore_index=None,
                           loss_fn=loss_fn, mesh=_cpu_mesh(8))
    np.testing.assert_allclose(single[0][0], dp[0][0], rtol=1e-6)
    np.testing.assert_allclose(single[0][1], dp[0][1], rtol=1e-5)
    np.testing.assert_allclose(single[1], dp[1], rtol=1e-6)
