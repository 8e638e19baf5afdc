"""segment/train.py CLI behavior: bare --resume reuses the latest run dir and
appends to results.csv (advisor r1 medium finding), checkpoints round-trip."""

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT / "segment"))

def _load_script(path, name):
    """Load a CLI script under a unique module name — segment/ and classify/
    both ship train.py/val.py, so a bare `import train` is order-dependent
    across the test session."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
           [116, 90, 156, 198, 373, 326]]


def _mini_cfg(path: Path):
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
    path.write_text(yaml.safe_dump(cfg))
    return path


def _mini_dataset(root: Path, n: int = 6):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            cv2.rectangle(img, (16, 16), (48, 48), (255, 255, 255), -1)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text(
                f"{i % 2} 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    data = dict(path=str(root), train=str(root / "images" / "train"),
                val=str(root / "images" / "val"), nc=2, names={0: "a", 1: "b"})
    dy = root / "data.yaml"
    dy.write_text(yaml.safe_dump(data))
    return dy


def test_train_then_bare_resume(tmp_path):
    seg_train = _load_script(ROOT / "segment/train.py", "seg_train_mod")
    cfg = _mini_cfg(tmp_path / "mini-seg.yaml")
    data_yaml = _mini_dataset(tmp_path / "ds")
    hyp = ROOT / "yolo_dual_tpu" / "configs" / "hyps" / "hyp.scratch-low.yaml"
    common = ["--cfg", str(cfg), "--data", str(data_yaml), "--hyp", str(hyp),
              "--batch-size", "4", "--imgsz", "64",
              "--project", str(tmp_path / "runs"), "--name", "exp", "--seed", "1"]
    opt1 = seg_train.parse_opt(common + ["--epochs", "2"])
    seg_train.train(opt1)
    run_dir = tmp_path / "runs" / "exp"
    assert (run_dir / "last").exists()
    csv1 = (run_dir / "results.csv").read_text().strip().splitlines()
    assert len(csv1) == 3  # header + 2 epochs

    # bare --resume WITHOUT --cfg/--data/--hyp/--imgsz: the run's opt.yaml
    # must supply them (advisor r2: defaults silently replaced the run's
    # settings); explicitly-typed --epochs extends the run
    opt2 = seg_train.parse_opt(["--project", str(tmp_path / "runs"), "--name", "exp",
                                "--epochs", "4", "--resume"])
    seg_train.train(opt2)
    assert opt2.cfg == str(cfg) and opt2.data == str(data_yaml), \
        "resume did not restore cfg/data from the run's opt.yaml"
    assert opt2.imgsz == 64 and opt2.batch_size == 4
    assert opt2.epochs == 4, "explicit --epochs was overridden by restored opt"
    assert not (tmp_path / "runs" / "exp2").exists(), "bare --resume created a new run dir"
    csv2 = (run_dir / "results.csv").read_text().strip().splitlines()
    assert csv2[:3] == csv1, "resume truncated prior history"
    assert len(csv2) == 5  # header + 4 epochs total
    epochs = [int(float(r.split(",")[0])) for r in csv2[1:]]
    assert epochs == [0, 1, 2, 3]


def test_train_device_aug_e2e(tmp_path):
    """--device-aug trains end-to-end: host ships mosaic tiles + geometry,
    the TPU kernel (kernels/augment.py) does composite/warp/HSV/flip, the
    compiled train step consumes its output; losses stay finite and
    checkpoints land."""
    seg_train = _load_script(ROOT / "segment/train.py", "seg_train_devaug_mod")
    cfg = _mini_cfg(tmp_path / "mini-seg.yaml")
    data_yaml = _mini_dataset(tmp_path / "ds")
    hyp = ROOT / "yolo_dual_tpu" / "configs" / "hyps" / "hyp.scratch-low.yaml"
    opt = seg_train.parse_opt(
        ["--cfg", str(cfg), "--data", str(data_yaml), "--hyp", str(hyp),
         "--batch-size", "4", "--imgsz", "64", "--epochs", "1",
         "--project", str(tmp_path / "runs"), "--name", "exp", "--seed", "1",
         "--device-aug"])
    seg_train.train(opt)
    run_dir = tmp_path / "runs" / "exp"
    assert (run_dir / "last").exists()
    rows = (run_dir / "results.csv").read_text().strip().splitlines()
    losses = [float(v) for v in rows[1].split(",")[1:5]]
    assert all(np.isfinite(losses)), losses
