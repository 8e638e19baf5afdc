"""Generate the tutorial notebooks (segment/tutorial.ipynb, classify/tutorial.ipynb).

The reference ships tutorial notebooks at segment/tutorial.ipynb and
classify/tutorial.ipynb (SURVEY.md §2.3). Ours mirror their walkthrough
structure (Setup -> Predict -> Validate -> Train -> Visualize -> Appendix)
but are TPU-native and egress-free: every cell runs on a plain CPU JAX
install against a synthetic mini-dataset generated in the notebook itself,
so the tutorials double as an executable smoke of the CLI surface.

Run:  python tools/gen_notebooks.py
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src.splitlines(keepends=True)}


def code(src, skip=False):
    """skip=True tags the cell `skip-execution` (nbclient honors it): used for
    cells that need network access, so `nbconvert --execute` stays egress-free."""
    meta = {"tags": ["skip-execution"]} if skip else {}
    return {"cell_type": "code", "metadata": meta, "execution_count": None,
            "outputs": [], "source": src.splitlines(keepends=True)}


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
            "accelerator": "TPU",
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


SETUP = '''import os, sys, subprocess
from pathlib import Path

ROOT = Path.cwd().resolve()
while not (ROOT / "yolo_dual_tpu").is_dir():  # notebook lives in <repo>/segment
    ROOT = ROOT.parent
sys.path.insert(0, str(ROOT))

# Keep the tutorial runnable anywhere: a CPU backend is enough. DEVICE feeds
# every CLI's --device flag; set it to "" on a TPU VM to use the chips.
DEVICE = "cpu"
from yolo_dual_tpu.utils.general import select_device
select_device(DEVICE)  # pins jax_platforms; wins over accelerator site hooks

import jax
print("jax", jax.__version__, "devices:", jax.devices())

def run(*args):
    """Drive a CLI exactly as you would from a shell."""
    cmd = [sys.executable, *map(str, args), "--device", DEVICE]
    print("$", " ".join(cmd[1:]))
    subprocess.run(cmd, check=True, cwd=ROOT, env={**os.environ})
'''


def segment_cells():
    c = []
    c.append(md("""# YOLO-Dual TPU — instance segmentation tutorial

A walkthrough of the instance-segmentation pipeline (train → validate →
predict), mirroring the reference's `segment/tutorial.ipynb` but TPU-native:
the model is a Flax/JAX graph compiled by XLA, NMS and mask post-processing
run on-device with static shapes, and multi-chip scaling is a
`jax.sharding.Mesh` flag away (`--data-parallel`).

Every cell below runs without network access: we synthesize a tiny
COCO-format dataset in-place. With real data, point `--data` at your
`coco128-seg.yaml` instead — the CLI surface matches the reference flag for
flag (see `docs/MIGRATION.md`)."""))
    c.append(md("# Setup"))
    c.append(code(SETUP))
    c.append(md("""## A toy dataset + a small model config

YOLO-txt polygon labels, two classes. The model is the yolov5-seg graph at
width 0.125 so the whole tutorial runs in seconds on CPU; swap in
`yolo_dual_tpu/configs/segment/yolov5s-seg.yaml` (and `--imgsz 640`) for the
real thing."""))
    c.append(code('''import numpy as np, cv2, yaml

DS = ROOT / "runs" / "tutorial-seg" / "dataset"
rng = np.random.default_rng(0)
for split in ("train", "val"):
    (DS / "images" / split).mkdir(parents=True, exist_ok=True)
    (DS / "labels" / split).mkdir(parents=True, exist_ok=True)
    for i in range(8):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.rectangle(img, (16, 16), (48, 48), (255, 255, 255), -1)
        cv2.imwrite(str(DS / "images" / split / f"{i}.jpg"), img)
        (DS / "labels" / split / f"{i}.txt").write_text(
            f"{i % 2} 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\\n")
data_yaml = DS / "data.yaml"
data_yaml.write_text(yaml.safe_dump(dict(
    path=str(DS), train=str(DS / "images" / "train"),
    val=str(DS / "images" / "val"), nc=2, names={0: "square", 1: "blob"})))

cfg = yaml.safe_load((ROOT / "yolo_dual_tpu/configs/segment/yolov5s-seg.yaml").read_text())
cfg["width_multiple"], cfg["depth_multiple"] = 0.125, 0.33
mini_cfg = DS.parent / "mini-seg.yaml"
mini_cfg.write_text(yaml.safe_dump(cfg))
print("dataset:", data_yaml, "\\nconfig:", mini_cfg)'''))
    c.append(md("""# 1. Train

One engine, one compiled train step (forward + loss + backward + optimizer
under a single `jit`). On multi-chip hardware add `--data-parallel` to shard
the batch over the device mesh — gradients sync via XLA collectives, no DDP
wrapper."""))
    c.append(code('''run("segment/train.py",
    "--cfg", mini_cfg, "--data", data_yaml,
    "--hyp", ROOT / "yolo_dual_tpu/configs/hyps/hyp.scratch-low.yaml",
    "--imgsz", 64, "--batch-size", 4, "--epochs", 1,
    "--project", ROOT / "runs" / "tutorial-seg", "--name", "train", "--exist-ok")'''))
    c.append(md("""# 2. Validate

Box + mask mAP50-95 with the reference's matching semantics (verified against
the live reference evaluator in `tests/test_eval_parity_full.py`). TP
matching and mask-IoU run batched on-device. Useful extras: `--task study`
(resolution sweep), `--rect` (aspect-bucket batching), `--augment` (TTA),
`--save-json` (COCO RLE + pycocotools COCOeval when installed)."""))
    c.append(code('''run("segment/val.py",
    "--weights", ROOT / "runs/tutorial-seg/train/best", "--cfg", mini_cfg,
    "--data", data_yaml, "--imgsz", 64, "--batch-size", 4,
    "--project", ROOT / "runs" / "tutorial-seg", "--name", "val", "--exist-ok", "--plots")'''))
    c.append(md("""# 3. Predict

Streaming prediction over images / videos / webcam / RTSP with annotated
output, `--save-txt` labels, `--save-crop` crops, `--visualize` feature maps,
`--augment` TTA. Sources and the video writer mirror the reference
(`segment/predict.py`)."""))
    c.append(code('''run("segment/predict.py",
    "--weights", ROOT / "runs/tutorial-seg/train/best", "--cfg", mini_cfg,
    "--data", data_yaml,
    "--source", DS / "images" / "val", "--imgsz", 64, "--conf-thres", 0.1,
    "--project", ROOT / "runs" / "tutorial-seg", "--name", "predict", "--exist-ok",
    "--save-txt")
import itertools
out = ROOT / "runs/tutorial-seg/predict"
print("outputs:", [p.name for p in itertools.islice(sorted(out.rglob("*")), 12)])'''))
    c.append(md("""# 4. Visualize

Local logging is on by default: `results.csv`, TensorBoard event files, and
plots land in the run directory. Remote sinks (W&B / ClearML / Comet,
including artifact upload and HPO bridges) activate automatically when their
SDK is installed — see `yolo_dual_tpu/utils/remote_loggers.py` and
`tools/hpo.py`."""))
    c.append(code('''for p in sorted((ROOT / "runs/tutorial-seg/train").rglob("*")):
    if p.is_file():
        print(p.relative_to(ROOT))'''))
    c.append(md("""# Appendix — Python API (hub-style)

`AutoShape` wraps preprocessing + forward + NMS + rescale behind one call,
like `torch.hub.load(..., 'custom')` in the reference."""))
    c.append(code('''from yolo_dual_tpu.engine.autoshape import AutoShape
from yolo_dual_tpu.models.model import SegmentationModel
from yolo_dual_tpu.train.checkpoint import partial_load

model = SegmentationModel(mini_cfg, nc=2)
variables = partial_load(model.init(imgsz=64),
                         ROOT / "runs/tutorial-seg/train/best")
api = AutoShape(model, variables, imgsz=64, conf=0.1,
                names={0: "square", 1: "blob"})
dets = api([str(DS / "images/val/0.jpg")])
print(dets.to_dicts())'''))
    c.append(md("""# Appendix — real data & reference weights (needs network)

The same commands at full scale: fetch coco128-seg, train yolov5n-seg, and
evaluate imported reference PyTorch weights (`.pt` checkpoints load directly
— BN-folded into the Flax graph by `io/torch_import.py`)."""))
    c.append(code('''!bash data/scripts/get_coco128.sh
run("segment/train.py", "--cfg", "yolov5n-seg.yaml", "--data", "coco128-seg.yaml",
    "--hyp", "hyp.scratch-low.yaml", "--imgsz", 640, "--batch-size", 16, "--epochs", 3)
run("segment/val.py", "--weights", "yolov5s-seg.pt", "--cfg", "yolov5s-seg.yaml",
    "--data", "coco128-seg.yaml", "--save-json")''', skip=True))
    c.append(md("""# Appendix — multi-chip

Training and evaluation shard over every visible device with
`--data-parallel`; multi-host runs initialize `jax.distributed` (see
`tools/multihost_dryrun.py` for the 2-process × 4-device emulation used in
CI). The driver-facing dry run `__graft_entry__.dryrun_multichip(n)` compiles
the full train step over an n-device mesh — the same code path this tutorial
just ran on one device."""))
    return c


def classify_cells():
    c = []
    c.append(md("""# YOLO-Dual TPU — classification tutorial

The classification sub-pipeline (`classify/{train,val,predict}.py`),
mirroring the reference's `classify/tutorial.ipynb`. Models are either a
YOLO backbone cut off at `--cutoff` with a `Classify` head, or any of the 12
native torchvision-equivalent backbones (`--model resnet18`, etc.).
Runs end-to-end on CPU with a synthetic 3-class imagefolder; with real data,
point `--data-dir` at an ImageNet-style tree."""))
    c.append(md("# Setup"))
    c.append(code(SETUP))
    c.append(md("## A toy imagefolder (3 classes, solid colors + noise)"))
    c.append(code('''import numpy as np, cv2

DS = ROOT / "runs" / "tutorial-cls" / "dataset"
rng = np.random.default_rng(0)
colors = {"red": (0, 0, 200), "green": (0, 200, 0), "blue": (200, 0, 0)}
for split, n in (("train", 12), ("val", 6), ("test", 6)):
    for cls, bgr in colors.items():
        d = DS / split / cls
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((64, 64, 3), bgr, np.uint8)
            img = np.clip(img.astype(np.int16) +
                          rng.integers(-40, 40, img.shape), 0, 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)
print("imagefolder at", DS)'''))
    c.append(md("""# 1. Train

`classify_transforms` (resize + center-crop + normalize) for eval,
flip/jitter augmentation for train, label smoothing, cosine LR, EMA — the
reference's recipe, one compiled step. `--dropout 0.2` inserts a real
dropout head; `--data-parallel` shards over the mesh (the reference's only
fully-wired DDP path is classification — ours is a flag)."""))
    c.append(code('''run("classify/train.py",
    "--model", "yolov5n.yaml", "--data-dir", DS,
    "--imgsz", 64, "--batch-size", 8, "--epochs", 3, "--verbose",
    "--project", ROOT / "runs" / "tutorial-cls", "--name", "train", "--exist-ok")'''))
    c.append(md("# 2. Validate\n\ntop-1 / top-5 accuracy, per-class with `--verbose`."))
    c.append(code('''run("classify/val.py",
    "--weights", ROOT / "runs/tutorial-cls/train/best", "--model", "yolov5n.yaml",
    "--data-dir", DS, "--imgsz", 64, "--batch-size", 8, "--verbose")'''))
    c.append(md("""# 3. Predict

Images, videos, webcam or RTSP streams — same source dispatch as the
detection predictor, annotated with top-5 class probabilities."""))
    c.append(code('''run("classify/predict.py",
    "--weights", ROOT / "runs/tutorial-cls/train/best", "--model", "yolov5n.yaml",
    "--source", DS / "test" / "red", "--imgsz", 64,
    "--project", ROOT / "runs" / "tutorial-cls", "--name", "predict", "--exist-ok")'''))
    c.append(md("""# Appendix — torchvision-equivalent backbones

`--model resnet18|resnet34|resnet50|mobilenet_v2|...` builds the native Flax
re-implementation of the corresponding torchvision backbone
(`yolo_dual_tpu/nn/torchvision_backbones.py`) with a `Classify` head — the
TPU analog of the reference's `--model resnet18` torchvision path."""))
    c.append(code('''run("classify/train.py",
    "--model", "resnet18", "--data-dir", DS,
    "--imgsz", 64, "--batch-size", 8, "--epochs", 1,
    "--project", ROOT / "runs" / "tutorial-cls", "--name", "train-r18", "--exist-ok")'''))
    c.append(md("# Appendix — real data (needs network)"))
    c.append(code('''!bash data/scripts/get_imagenet.sh --val   # or any imagefolder tree
run("classify/train.py", "--model", "yolov5s.yaml", "--data-dir", "datasets/imagenette160",
    "--imgsz", 160, "--batch-size", 64, "--epochs", 5)''', skip=True))
    return c


def main(merge: bool = False):
    for path, cells in ((ROOT / "segment" / "tutorial.ipynb", segment_cells()),
                        (ROOT / "classify" / "tutorial.ipynb", classify_cells())):
        if merge and path.exists():
            # keep executed outputs for cells whose source is unchanged
            old = {"".join(c["source"]): c for c in json.loads(path.read_text())["cells"]
                   if c["cell_type"] == "code"}
            for c in cells:
                prev = old.get("".join(c["source"])) if c["cell_type"] == "code" else None
                if prev is not None:
                    c["outputs"] = prev.get("outputs", [])
                    c["execution_count"] = prev.get("execution_count")
        path.write_text(json.dumps(notebook(cells), indent=1) + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main(merge="--merge" in sys.argv)
