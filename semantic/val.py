"""Semantic-segmentation validation CLI: confusion-matrix mIoU with
ignore_index + optional 4-panel visualizations.

Equivalent of reference unet-lite/*/val_diceloss.py:148-293 and test.py.

Usage:
    python semantic/val.py --weights runs/train-semantic/exp/best \
        --cfg resnet50.yaml --img-dir data/val_imgs --json-dir data/val_jsons
"""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import numpy as np

from yolo_dual_tpu.data import create_json_segment_dataloader
from yolo_dual_tpu.engine import evaluate_semantic
from yolo_dual_tpu.losses import SemanticSegLoss
from yolo_dual_tpu.models.model import SemanticSegModel
from yolo_dual_tpu.utils.general import LOGGER, increment_path

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"
CLASS_NAMES = ["sky", "building", "pole", "road", "pavement", "tree", "signsymbol",
               "fence", "car", "pedestrian", "bicyclist", "unlabelled"]


def run(weights="", cfg="resnet50.yaml", img_dir="", json_dir="", imgsz=640,
        batch_size=16, nc=12, ignore_index=11, loss="dice", visualize=False,
        project="runs/val-semantic", name="exp", device="", data_parallel=False,
        device_preprocess=False, **kw):
    import jax
    from yolo_dual_tpu.utils.general import select_device
    select_device(device)
    mesh = None
    if data_parallel and jax.device_count() > 1:
        from yolo_dual_tpu.parallel import make_mesh
        mesh = make_mesh()
        if batch_size % mesh.devices.size:
            batch_size = -(-batch_size // mesh.devices.size) * mesh.devices.size
    cfg_path = Path(cfg) if Path(cfg).exists() else CONFIGS / "semantic" / cfg
    model = SemanticSegModel(cfg_path, nc=nc)
    variables = model.init(imgsz=imgsz)
    if weights:
        from yolo_dual_tpu.io.weights import resolve_variables
        variables = resolve_variables(model, weights, variables)
    loader, ds = create_json_segment_dataloader(img_dir, json_dir, imgsz, batch_size,
                                                augment=False, num_classes=nc,
                                                drop_last=False,
                                                device_preprocess=device_preprocess)
    loss_fn = SemanticSegLoss(nc, flavor=loss)
    (miou, vloss, _, _), per_cls, t = evaluate_semantic(
        model, variables, loader, nc, ignore_index=ignore_index, loss_fn=loss_fn,
        verbose=True, names=dict(enumerate(CLASS_NAMES)), mesh=mesh)
    if visualize:
        import jax.numpy as jnp
        import cv2
        from yolo_dual_tpu.data.loader import normalize_image
        from yolo_dual_tpu.utils.plots import semantic_panel
        save_dir = increment_path(Path(project) / name, mkdir=True)
        batch = next(iter(loader))
        if "image_raw" in batch:
            from yolo_dual_tpu.kernels import semantic_preprocess
            im, mk = semantic_preprocess(
                jnp.asarray(batch["image_raw"]), jnp.asarray(batch["mask_raw"]),
                out_size=imgsz, interpret=jax.default_backend() not in ("tpu", "axon"))
            batch = {"image": (np.asarray(im) * 255).astype(np.uint8),
                     "mask": np.asarray(mk)}
        out = model.apply(variables, normalize_image(jnp.asarray(batch["image"])), train=False)
        pred = np.asarray(out.argmax(-1))
        for i in range(min(4, len(pred))):
            panel = semantic_panel(batch["image"][i], batch["mask"][i], pred[i],
                                   names=CLASS_NAMES[:nc])
            cv2.imwrite(str(save_dir / f"panel_{i}.png"), panel[..., ::-1])
        LOGGER.info(f"panels saved to {save_dir}")
    return (miou, vloss, 0.0, 0.0), per_cls, t


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="resnet50.yaml")
    p.add_argument("--img-dir", type=str, required=True)
    p.add_argument("--json-dir", type=str, required=True)
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--nc", type=int, default=12)
    p.add_argument("--ignore-index", type=int, default=11)
    p.add_argument("--loss", choices=["dice", "jaccard", "ce"], default="dice")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--device-preprocess", action="store_true",
                   help="resize-pad on device (kernels semantic_preprocess)")
    p.add_argument("--project", default=str(ROOT / "runs" / "val-semantic"))
    p.add_argument("--name", default="exp")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard eval batches over all devices (SPMD data-parallel val)")
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(**vars(parse_opt()))
