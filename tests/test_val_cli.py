"""segment/val.py CLI end-to-end: run() on a tiny dataset with random-init
weights, exercising save_txt / save_json / plots / run-dir creation in one
pass (reference segment/val.py:128-400 surface)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))

from test_train_cli import _load_script, _mini_cfg, _mini_dataset  # noqa: E402


def test_val_cli_outputs(tmp_path):
    seg_val = _load_script(ROOT / "segment/val.py", "seg_val_mod")
    cfg = _mini_cfg(tmp_path / "mini-seg.yaml")
    data_yaml = _mini_dataset(tmp_path / "ds", n=4)

    mean, maps, t = seg_val.run(
        data=str(data_yaml), cfg=str(cfg), weights="", batch_size=2, imgsz=64,
        conf_thres=1e-6, iou_thres=0.6, max_det=50, plots=True, save_txt=True,
        save_conf=True, save_json=True, project=str(tmp_path / "runs"), name="exp")

    # 8 metrics (box P/R/mAP50/mAP + mask P/R/mAP50/mAP), per-class maps, 3 times
    assert len(mean) == 8 and all(np.isfinite(v) for v in mean)
    assert len(t) == 3
    assert maps.shape == (2,)

    run_dir = tmp_path / "runs" / "exp"
    txts = list((run_dir / "labels").glob("*.txt"))
    assert txts, "save_txt produced no label files"
    # save_conf: rows are cls x y w h conf (6 cols) + mask polygon coords
    first = txts[0].read_text().strip().splitlines()
    assert first and len(first[0].split()) >= 6

    pred_json = run_dir / "predictions.json"
    assert pred_json.exists(), "save_json produced no predictions.json"
    preds = json.loads(pred_json.read_text())
    assert isinstance(preds, list)
    if preds:  # random weights at conf 1e-6 produce detections
        row = preds[0]
        assert {"image_id", "category_id", "bbox", "score", "segmentation"} <= set(row)
        assert "counts" in row["segmentation"]  # RLE-encoded mask

    assert list(run_dir.glob("*.png")) or list(run_dir.glob("*.jpg")), \
        "plots=True produced no image panels"


def test_val_device_preprocess_matches_host(tmp_path):
    """--device-preprocess evaluates through the TPU letterbox kernel
    (kernels/preprocess.py, the serving path). With raw size == imgsz the
    kernel is pad-only => metrics EXACTLY equal the host-letterbox run; mixed
    shapes are rejected with a clear error."""
    import importlib.util
    import cv2
    import numpy as np
    import yaml
    spec = importlib.util.spec_from_file_location("seg_val_devpp", ROOT / "segment/val.py")
    val = importlib.util.module_from_spec(spec)
    sys.modules["seg_val_devpp"] = val
    spec.loader.exec_module(val)

    root = tmp_path / "ds"
    (root / "images/val").mkdir(parents=True)
    (root / "labels/val").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.rectangle(img, (16, 16), (48, 48), (255, 255, 255), -1)
        cv2.imwrite(str(root / "images/val" / f"{i}.png"), img)
        (root / "labels/val" / f"{i}.txt").write_text(
            "0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    dy = root / "data.yaml"
    dy.write_text(yaml.safe_dump(dict(path=str(root), train=str(root / "images/val"),
                                      val=str(root / "images/val"), names=["a"])))

    kw = dict(data=str(dy), cfg="yolov5n-seg.yaml", imgsz=64, batch_size=2,
              conf_thres=0.1, plots=False)
    host, _, _ = val.run(**kw)
    dev, _, _ = val.run(device_preprocess=True, **kw)
    np.testing.assert_allclose(np.asarray(dev, float), np.asarray(host, float),
                               atol=1e-7)

    # mixed raw shapes must be rejected up front
    cv2.imwrite(str(root / "images/val" / "odd.png"),
                rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    (root / "labels/val" / "odd.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    # invalidate the label cache (file set changed)
    with pytest.raises(ValueError, match="uniform raw image shape"):
        val.run(device_preprocess=True, **kw)
