"""Semantic-segmentation prediction CLI: raw images -> colorized class masks,
alpha-blended overlays, and (with --gt-json-dir) reference-test.py-style
[input | GT | pred | diff | legend] panels plus mIoU / pixel-accuracy metrics.

Equivalent of reference unet-lite/Resnet50/test.py:468+ (test-set eval +
legend visualization) restricted to its inference/visualization half; the
eval half lives in semantic/val.py.

Usage:
    python semantic/predict.py --weights runs/train-semantic/exp/best \
        --cfg resnet50.yaml --source data/test_imgs [--gt-json-dir data/test_jsons]
"""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import numpy as np

from yolo_dual_tpu.models.model import SemanticSegModel
from yolo_dual_tpu.utils.general import LOGGER, increment_path

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"
CLASS_NAMES = ["sky", "building", "pole", "road", "pavement", "tree", "signsymbol",
               "fence", "car", "pedestrian", "bicyclist", "unlabelled"]
IMG_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}


def run(weights="", cfg="resnet50.yaml", source="", imgsz=640, nc=12,
        gt_json_dir="", alpha=0.5, names=None, project="runs/predict-semantic",
        name="exp", exist_ok=False, device="", **kw):
    import cv2
    import jax.numpy as jnp

    from yolo_dual_tpu.data.json_dataset import _load_json_mask, resize_and_pad
    from yolo_dual_tpu.data.loader import normalize_image
    from yolo_dual_tpu.metrics.seg import SegmentationConfusionMatrix
    from yolo_dual_tpu.utils.general import select_device
    from yolo_dual_tpu.utils.plots import CAMVID_PALETTE, colorize_semantic, semantic_panel

    select_device(device)
    names = list(names) if names else CLASS_NAMES[:nc]
    cfg_path = Path(cfg) if Path(cfg).exists() else CONFIGS / "semantic" / cfg
    model = SemanticSegModel(cfg_path, nc=nc)
    variables = model.init(imgsz=imgsz)
    if weights:
        from yolo_dual_tpu.io.weights import resolve_variables
        variables = resolve_variables(model, weights, variables)

    src = Path(source)
    files = sorted(p for p in (src.iterdir() if src.is_dir() else [src])
                   if p.suffix.lower() in IMG_SUFFIXES)
    if not files:
        raise FileNotFoundError(f"no images under {source}")
    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)

    import jax

    @jax.jit
    def forward(variables, image):
        return model.apply(variables, normalize_image(image), train=False).argmax(-1)

    cm = SegmentationConfusionMatrix(nc, ignore_index=nc - 1) if gt_json_dir else None
    for f in files:
        img = cv2.imread(str(f))[..., ::-1]  # BGR -> RGB
        padded, _, _ = resize_and_pad(img, None, imgsz)
        pred = np.asarray(forward(variables, jnp.asarray(padded[None])))[0]
        pred_rgb = colorize_semantic(pred, CAMVID_PALETTE)
        overlay = (padded.astype(np.float32) * (1 - alpha)
                   + pred_rgb.astype(np.float32) * alpha).astype(np.uint8)
        cv2.imwrite(str(save_dir / f"{f.stem}_mask.png"), pred_rgb[..., ::-1])
        cv2.imwrite(str(save_dir / f"{f.stem}_overlay.png"), overlay[..., ::-1])
        if gt_json_dir:
            gt = _load_json_mask(Path(gt_json_dir) / f"{f.stem}.json")
            _, gt_p, _ = resize_and_pad(
                np.zeros((*gt.shape, 3), np.uint8), gt, imgsz, mask_fill=nc - 1)
            cm.update(pred, gt_p)
            panel = semantic_panel(padded, gt_p, pred, names=names)
            cv2.imwrite(str(save_dir / f"{f.stem}_panel.png"), panel[..., ::-1])
    LOGGER.info(f"{len(files)} images -> {save_dir}")
    if cm is not None:
        m = cm.get_metrics()
        LOGGER.info(f"mIoU {m['mIoU']:.4f}  pixel-acc {m['Accuracy']:.4f}")
        for i, n in enumerate(names):
            LOGGER.info(f"  {n:>12s}: IoU {m['IoU'][i]:.4f}  acc {m['Class_Accuracy'][i]:.4f}")
        return m, save_dir
    return None, save_dir


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="resnet50.yaml")
    p.add_argument("--source", type=str, required=True, help="image file or directory")
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--nc", type=int, default=12)
    p.add_argument("--gt-json-dir", type=str, default="",
                   help="JSON masks for test.py-style panels + metrics")
    p.add_argument("--alpha", type=float, default=0.5, help="overlay blend weight")
    p.add_argument("--project", default=str(ROOT / "runs" / "predict-semantic"))
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    opt = parse_opt()
    run(**vars(opt))
