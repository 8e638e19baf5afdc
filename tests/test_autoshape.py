"""Hub-style AutoShape/Detections API (reference models/common.py:627-835):
mixed input kinds (path / numpy / PIL), native-space box rescale, and every
Detections export surface."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
           [116, 90, 156, 198, 373, 326]]


def _tiny_seg():
    from yolo_dual_tpu.models.model import SegmentationModel
    cfg = dict(
        nc=2, depth_multiple=0.33, width_multiple=0.125,
        anchors=[list(a) for a in ANCHORS],
        backbone=[
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]], [-1, 1, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]], [-1, 1, "C3", [512]],
            [-1, 1, "Conv", [1024, 3, 2]], [-1, 1, "C3", [1024]], [-1, 1, "SPPF", [1024, 5]],
        ],
        head=[
            [-1, 1, "Conv", [512, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [256, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [-1, 1, "Conv", [256, 3, 2]], [[-1, 14], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [512, 3, 2]], [[-1, 10], 1, "Concat", [1]], [-1, 1, "C3", [1024, False]],
            [[17, 20, 23], 1, "Segment", ["nc", "anchors", 8, 32]],
        ],
    )
    model = SegmentationModel(cfg)
    return model, model.init(imgsz=64)


def test_autoshape_mixed_inputs_and_exports(tmp_path):
    from yolo_dual_tpu.engine.autoshape import AutoShape

    model, variables = _tiny_seg()
    api = AutoShape(model, variables, imgsz=64, conf=0.001, max_det=10,
                    names={0: "a", 1: "b"})

    rng = np.random.default_rng(0)
    im_np = rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)  # non-square
    cv2.rectangle(im_np, (20, 10), (60, 40), (255, 255, 255), -1)
    im_pil = Image.fromarray(im_np)
    p = tmp_path / "im.jpg"
    cv2.imwrite(str(p), im_np[..., ::-1])

    res = api([im_np, im_pil, str(p)])
    assert len(res) == 3
    # boxes are rescaled to each image's NATIVE space
    for det in res.dets:
        if len(det):
            assert det[:, [0, 2]].max() <= 80 + 1e-3
            assert det[:, [1, 3]].max() <= 48 + 1e-3
            assert det[:, 4].min() > 0  # confidences positive
    rows = res.to_dicts()
    assert len(rows) == 3
    for r in sum(rows, []):
        assert set(r) == {"xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"}
        assert r["name"] in ("a", "b")
    rendered = res.render()
    assert all(r.shape == (48, 80, 3) for r in rendered)
    out = res.save(save_dir=tmp_path / "saved")
    assert len(list(Path(out).glob("image*.jpg"))) == 3
    crop_dir = res.crop(save_dir=tmp_path / "crops")
    n_det = sum(len(d) for d in res.dets)
    assert len(list(Path(crop_dir).rglob("*.jpg"))) == n_det
    res.print()
