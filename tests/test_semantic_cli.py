"""semantic/train.py CLI end-to-end: the BASELINE config flows (ResNet dice
training, yolov8 jaccard) driven through the real CLI on a tiny CamVid-style
JSON dataset — train, checkpoint best-by-mIoU, bare --resume append.

Reference flow: unet-lite/Resnet50/seg_diceloss_Resnet50.py:875-1215 and
yolov8/seg_jaccardloss_yolov8.py (collapsed here into one trainer)."""

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

pytest.importorskip("PIL")
from PIL import Image

ROOT = Path(__file__).parents[1]


def _load_script(path, name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _mini_cfg(path: Path):
    """A reduced-width ResNet18-style semantic net (stem + 2 stages + head)."""
    cfg = dict(
        nc=4, depth_multiple=1.0, width_multiple=1.0, compiler="semantic",
        activation="relu",
        backbone=[
            [-1, 1, "ResNetStem", [8]],
            [-1, 1, "ResNet18Layer", [8, 1, 1]],
            [-1, 1, "ResNet18Layer", [16, 1, 2]],
            [-1, 1, "ResNet18Layer", [32, 1, 2]],
        ],
        head=[[[1, 2, 3], 1, "SegmentHead", [4, 8]]],
    )
    path.write_text(yaml.safe_dump(cfg))
    return path


def _mini_dataset(root: Path, n: int = 6, nc: int = 4, size: int = 64):
    """Images whose quadrant colors deterministically encode the class mask —
    learnable by a tiny net in a couple of epochs."""
    from yolo_dual_tpu.data import mask_to_json

    img_dir, json_dir = root / "imgs", root / "jsons"
    img_dir.mkdir(parents=True)
    json_dir.mkdir()
    rng = np.random.default_rng(0)
    h = size // 2
    colors = np.array([[200, 30, 30], [30, 200, 30], [30, 30, 200], [200, 200, 30]], np.uint8)
    for i in range(n):
        mask = np.zeros((size, size), np.uint8)
        mask[:h, :h], mask[:h, h:], mask[h:, :h], mask[h:, h:] = 0, 1, 2, 3
        img = colors[mask].astype(np.int16) + rng.integers(-12, 12, (size, size, 3))
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(img_dir / f"f{i}.png")
        mpath = root / f"m{i}.png"
        Image.fromarray(mask).save(mpath)
        mask_to_json(mpath, json_dir / f"f{i}.json", class_names=["a", "b", "c", "d"])
    return img_dir, json_dir


def test_semantic_train_cli_then_bare_resume(tmp_path):
    sem_train = _load_script(ROOT / "semantic/train.py", "sem_train_mod")
    cfg = _mini_cfg(tmp_path / "mini-sem.yaml")
    img_dir, json_dir = _mini_dataset(tmp_path / "ds")
    common = ["--cfg", str(cfg), "--img-dir", str(img_dir), "--json-dir", str(json_dir),
              "--nc", "4", "--ignore-index", "-1", "--imgsz", "64", "--batch-size", "3",
              "--loss", "dice", "--auto-weights",
              "--project", str(tmp_path / "runs"), "--name", "exp", "--seed", "1"]
    best1 = sem_train.train(sem_train.parse_opt(common + ["--epochs", "2"]))
    run_dir = tmp_path / "runs" / "exp"
    assert (run_dir / "last").exists() and (run_dir / "best").exists()
    csv1 = (run_dir / "results.csv").read_text().strip().splitlines()
    assert len(csv1) == 3  # header + 2 epochs
    assert 0.0 <= best1 <= 1.0

    # bare --resume: the run's opt.yaml restores cfg/dirs; epochs extends
    opt2 = sem_train.parse_opt(["--project", str(tmp_path / "runs"), "--name", "exp",
                                "--epochs", "3", "--resume"])
    best2 = sem_train.train(opt2)
    assert opt2.cfg == str(cfg) and opt2.img_dir == str(img_dir)
    assert opt2.nc == 4 and opt2.imgsz == 64
    assert not (tmp_path / "runs" / "exp2").exists(), "bare --resume created a new run dir"
    csv2 = (run_dir / "results.csv").read_text().strip().splitlines()
    assert csv2[:3] == csv1, "resume truncated prior history"
    assert len(csv2) == 4  # header + 3 epochs total
    assert [int(float(r.split(",")[0])) for r in csv2[1:]] == [0, 1, 2]
    assert best2 >= best1 - 1e-6  # best fitness is monotone across resume


def test_semantic_train_cli_jaccard_flavor(tmp_path):
    """The yolov8 jaccard flow (BASELINE config #4) through the same CLI."""
    sem_train = _load_script(ROOT / "semantic/train.py", "sem_train_mod2")
    cfg = _mini_cfg(tmp_path / "mini-sem.yaml")
    img_dir, json_dir = _mini_dataset(tmp_path / "ds", n=3)
    opt = sem_train.parse_opt(
        ["--cfg", str(cfg), "--img-dir", str(img_dir), "--json-dir", str(json_dir),
         "--nc", "4", "--ignore-index", "-1", "--imgsz", "64", "--batch-size", "3",
         "--loss", "jaccard", "--epochs", "1",
         "--project", str(tmp_path / "runs"), "--name", "exp", "--seed", "0"])
    best = sem_train.train(opt)
    assert np.isfinite(best)
    csv = (tmp_path / "runs" / "exp" / "results.csv").read_text().splitlines()
    assert csv[0].split(",")[3] == "jaccard_loss"
