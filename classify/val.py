"""Classification validation CLI: top1/top5 accuracy
(reference classify/val.py:1-170)."""

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

from yolo_dual_tpu.data.loader import Loader, normalize_image
from yolo_dual_tpu.models.model import ClassificationModel
from yolo_dual_tpu.train import load_checkpoint
from yolo_dual_tpu.utils.general import LOGGER

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


def run(weights="", model="yolov5n.yaml", data_dir="", imgsz=224, batch_size=64,
        cutoff=10, device="", verbose=False, plots=False, save_dir=".", **kw):
    from yolo_dual_tpu.utils.general import select_device
    select_device(device)
    sys.path.insert(0, str(ROOT / "classify"))
    from train import build_classifier
    from yolo_dual_tpu.data.classify import ClassificationDataset
    val_dir = Path(data_dir) / ("val" if (Path(data_dir) / "val").exists() else "test")
    ds = ClassificationDataset(val_dir, imgsz, augment=False)
    loader = Loader(ds, batch_size, drop_last=False)
    m = build_classifier(model, len(ds.classes), cutoff=cutoff)
    variables = m.module.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=False)
    if weights:
        from yolo_dual_tpu.io.weights import resolve_variables
        variables = resolve_variables(m, weights, variables)

    @jax.jit
    def fwd(v, x):
        return m.module.apply(v, normalize_image(x), train=False)

    nc = len(ds.classes)
    top1 = top5 = n = 0
    c_top1 = np.zeros(nc)
    c_n = np.zeros(nc)
    first = None  # (images, labels, logits) captured for --plots
    for batch in loader:
        logits = np.asarray(fwd(variables, jnp.asarray(batch["image"])))
        if first is None:
            first = (np.asarray(batch["image"]), np.asarray(batch["label"]), logits)
        bsz = int(batch.get("n_valid", len(logits)))
        lab = np.asarray(batch["label"][:bsz])
        order = np.argsort(-logits[:bsz], axis=1)
        hit1 = order[:, 0] == lab
        top1 += hit1.sum()
        top5 += (order[:, :5] == lab[:, None]).any(1).sum()
        n += bsz
        np.add.at(c_top1, lab, hit1)
        np.add.at(c_n, lab, 1)
    top1, top5 = top1 / max(n, 1), top5 / max(n, 1)
    LOGGER.info(f"top1 {top1:.4f} top5 {top5:.4f} over {n} images")
    if plots and first is not None:
        # first-batch mosaic with true/pred captions (reference imshow_cls,
        # utils/plots.py:447-474); reuses the eval loop's first batch/logits
        # (a fresh next(iter(loader)) would leak the prefetch worker thread).
        # The dataset emits ImageNet-normalized floats — undo for display.
        from yolo_dual_tpu.data.classify import denormalize_imagenet
        from yolo_dual_tpu.utils.plots import imshow_cls
        ims, labs, lgt = first
        f = imshow_cls(denormalize_imagenet(ims), labels=labs,
                       pred=np.argsort(-lgt, axis=1)[:, 0], names=ds.classes,
                       f=Path(save_dir) / "val_images.jpg")
        LOGGER.info(f"mosaic saved to {f}")
    if verbose:
        # per-class accuracy table (reference classify/val.py --verbose)
        for i, cname in enumerate(ds.classes):
            acc = c_top1[i] / max(c_n[i], 1)
            LOGGER.info(f"  {cname:>20s}: {int(c_n[i]):4d} imgs  top1 {acc:.4f}")
    return top1, top5


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--model", type=str, default="yolov5n.yaml")
    p.add_argument("--data-dir", "--data", type=str, required=True)
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=224)
    p.add_argument("--verbose", action="store_true", help="per-class accuracy")
    p.add_argument("--plots", action="store_true", help="save val_images.jpg mosaic")
    p.add_argument("--save-dir", type=str, default=".")
    p.add_argument("--half", action="store_true", help="parity flag")
    p.add_argument("--dnn", action="store_true", help="parity flag")
    p.add_argument("--workers", type=int, default=0, help="parity flag")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--cutoff", type=int, default=10)
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(**vars(parse_opt()))
