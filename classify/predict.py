"""Classification prediction CLI (reference classify/predict.py:1-224)."""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.data.loader import normalize_image
from yolo_dual_tpu.models.model import ClassificationModel
from yolo_dual_tpu.train import load_checkpoint
from yolo_dual_tpu.utils.general import LOGGER

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


def run(weights="", model="yolov5n.yaml", source="", imgsz=224, cutoff=10, topk=5,
        device="", **kw):
    from yolo_dual_tpu.utils.general import select_device
    select_device(device)
    import cv2
    sys.path.insert(0, str(ROOT / "classify"))
    from train import build_classifier
    classes = None
    nc = 1000
    variables = None
    if weights:
        ckpt = load_checkpoint(weights)
        classes = list(ckpt.get("classes", [])) or None
        if classes:
            nc = len(classes)
        variables = ckpt.get("variables")
        if ckpt.get("ema"):
            variables = ckpt["ema"].get("ema", variables)
    m = build_classifier(model, nc, cutoff=cutoff)
    if variables is None:
        variables = m.module.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=False)

    @jax.jit
    def fwd(v, x):
        return jax.nn.softmax(m.module.apply(v, normalize_image(x), train=False), -1)

    src = Path(source)
    files = sorted(src.rglob("*.*")) if src.is_dir() else [src]
    results = []
    for f in files:
        if f.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp", ".webp"):
            continue
        im = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        # eval transform parity with training (reference classify_transforms)
        from yolo_dual_tpu.data.classify import classify_transforms
        im = classify_transforms(im, imgsz)
        prob = np.asarray(fwd(variables, jnp.asarray(im[None])))[0]
        order = np.argsort(-prob)[:topk]
        names = [classes[i] if classes else str(i) for i in order]
        LOGGER.info(f"{f.name}: " + ", ".join(f"{n} {prob[i]:.3f}" for n, i in zip(names, order)))
        results.append((str(f), order, prob[order]))
    return results


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--model", type=str, default="yolov5n.yaml")
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--imgsz", type=int, default=224)
    p.add_argument("--cutoff", type=int, default=10)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(**vars(parse_opt()))
