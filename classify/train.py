"""Classification training CLI.

Equivalent of reference classify/train.py:46-333: YOLO-cls model (detection
backbone cutoff + Classify head), smooth cross-entropy, cosine LR, EMA,
top1/top5 validation. The reference's fully-wired DDP (its only real
multi-process path) maps to the data mesh (--data-parallel).

Usage:
    python classify/train.py --model yolov5n.yaml --data-dir datasets/imagenette --epochs 10
"""

import argparse
import csv
import sys
import time
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.models.model import ClassificationModel
from yolo_dual_tpu.train import EarlyStopping, ModelEMA, Trainer, save_checkpoint, smart_optimizer
from yolo_dual_tpu.train.trainer import classify_loss
from yolo_dual_tpu.utils.general import LOGGER, increment_path, init_seeds

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


# Back-compat alias: the full dataset now lives in the data layer
from yolo_dual_tpu.data.classify import ClassificationDataset as FolderClassificationDataset  # noqa: E402,F401

TORCHVISION_ARCHS = ("resnet18", "resnet34", "resnet50", "wide_resnet50_2",
                     "MobileNetV3s", "mobilenet_v2", "efficientnet_b0",
                     "efficientnet_b1", "efficientnet_v2_s", "RegNety400",
                     "vgg11_bn", "convnext_tiny")


def build_classifier(model_name: str, nc: int, cutoff: int = 10, dropout: float = 0.0):
    """YOLO-cls (detection cfg + cutoff) or a native torchvision-family
    backbone + Classify head (reference classify/train.py's
    torchvision-or-YOLO model option)."""
    if model_name in TORCHVISION_ARCHS:
        cfg = dict(nc=nc, depth_multiple=1.0, width_multiple=1.0,
                   backbone=[[-1, 1, f"{model_name}{i}", [0]] for i in (1, 2, 3)],
                   head=[])
        return ClassificationModel(cfg, nc=nc, cutoff=3, dropout=dropout)
    cfg = Path(model_name) if Path(model_name).exists() else CONFIGS / "models" / model_name
    return ClassificationModel(cfg, nc=nc, cutoff=cutoff, dropout=dropout)


def train(opt):
    from yolo_dual_tpu.utils.general import select_device
    select_device(opt.device)
    from yolo_dual_tpu.data.classify import create_classification_dataloader
    init_seeds(opt.seed)
    save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok, mkdir=True)
    train_loader, train_ds = create_classification_dataloader(
        Path(opt.data_dir) / "train", imgsz=opt.imgsz, batch_size=opt.batch_size,
        augment=not opt.no_augment, cache=opt.cache, shuffle=True, seed=opt.seed)
    val_dir = Path(opt.data_dir) / ("val" if (Path(opt.data_dir) / "val").exists() else "test")
    val_loader, val_ds = create_classification_dataloader(
        val_dir, imgsz=opt.imgsz, batch_size=opt.batch_size, augment=False,
        cache=opt.cache, shuffle=False)
    nc = len(train_ds.classes)

    model = build_classifier(opt.model, nc, cutoff=opt.cutoff,
                             dropout=opt.dropout or 0.0)
    variables = model.module.init(jax.random.PRNGKey(opt.seed),
                                  jnp.zeros((1, opt.imgsz, opt.imgsz, 3)), train=True)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    if opt.pretrained:
        if Path(opt.pretrained).exists():
            # fine-tune from a local checkpoint: shape-matching leaves only
            # (the classify head differs when nc changes)
            from yolo_dual_tpu.train.checkpoint import partial_load
            variables = partial_load(variables, opt.pretrained)
        else:
            LOGGER.info("--pretrained: no local weights file given; torchvision "
                        "release downloads need egress (utils/downloads.py has "
                        "the URL table) - training from scratch")

    hyp = dict(lr0=opt.lr0, lrf=opt.lrf, momentum=0.9, weight_decay=opt.decay,
               warmup_epochs=0.0)
    nb = len(train_loader)
    tx = smart_optimizer(variables["params"], opt.optimizer, hyp, epochs=opt.epochs,
                         steps_per_epoch=nb, cos_lr=True)
    loss_fn = lambda logits, labels: classify_loss(logits, labels, opt.label_smoothing)
    mesh = None
    if opt.data_parallel and jax.device_count() > 1:
        from yolo_dual_tpu.parallel import make_mesh
        mesh = make_mesh()
    trainer = Trainer(model, loss_fn, tx, ema=ModelEMA(decay=hyp.get("ema_decay", 0.9999),
                                   tau=hyp.get("ema_tau", 2000.0)), task="classify", mesh=mesh,
                      dropout=bool(opt.dropout))
    state = trainer.init_state(dict(variables))
    step_fn = trainer.make_train_step()
    eval_fn = trainer.make_eval_step()
    stopper = EarlyStopping(opt.patience)
    best = 0.0

    csv_path = save_dir / "results.csv"
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerow(["epoch", "train_loss", "top1", "top5"])
    t0 = time.time()
    for epoch in range(opt.epochs):
        train_loader.set_epoch(epoch)
        mloss = 0.0
        for i, batch in enumerate(train_loader):
            b = {"image": jnp.asarray(batch["image"]), "label": jnp.asarray(batch["label"])}
            if mesh is not None:
                from yolo_dual_tpu.parallel import shard_batch
                b = shard_batch(b, mesh)
            state, m = step_fn(state, b)
            mloss = (mloss * i + float(m["loss"])) / (i + 1)
        top1 = top5 = n = 0
        for batch in val_loader:
            logits = np.asarray(eval_fn(state, {"image": jnp.asarray(batch["image"])}))
            bsz = int(batch.get("n_valid", len(logits)))
            lab = batch["label"][:bsz]
            order = np.argsort(-logits[:bsz], axis=1)
            top1 += (order[:, 0] == lab).sum()
            top5 += (order[:, :5] == lab[:, None]).any(1).sum()
            n += bsz
        top1, top5 = top1 / max(n, 1), top5 / max(n, 1)
        LOGGER.info(f"epoch {epoch}: loss {mloss:.4f} top1 {top1:.4f} top5 {top5:.4f} "
                    f"({(time.time() - t0) / (epoch + 1):.1f}s/epoch)")
        with open(csv_path, "a", newline="") as f:
            csv.writer(f).writerow([epoch, mloss, top1, top5])
        final_epoch = epoch == opt.epochs - 1
        if not opt.nosave or final_epoch:
            ckpt = {"variables": {"params": state.params, "batch_stats": state.batch_stats},
                    "ema": state.ema, "epoch": epoch, "classes": train_ds.classes}
            save_checkpoint(save_dir / "last", ckpt)
            if top1 >= best:
                save_checkpoint(save_dir / "best", ckpt)
        best = max(best, top1)
        if stopper(epoch, top1):
            break
    LOGGER.info(f"Done; best top1 {best:.4f}; results in {save_dir}")
    return best


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="yolov5n.yaml",
                   help="detection cfg for backbone, or a torchvision arch "
                        "name (resnet18, efficientnet_b0, ...)")
    p.add_argument("--data-dir", "--data", type=str, required=True,
                   help="root with train/ and val|test/")
    p.add_argument("--cutoff", type=int, default=10)
    p.add_argument("--cache", type=str, default=False, nargs="?", const="ram",
                   help="image cache: ram or disk (reference --cache)")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=224)
    p.add_argument("--dropout", type=float, default=None, help="classifier-head dropout fraction")
    p.add_argument("--pretrained", type=str, default="", nargs="?", const="download",
                   help="accepted for parity (torchvision downloads need egress)")
    p.add_argument("--nosave", action="store_true", help="checkpoint final epoch only")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--workers", type=int, default=0, help="parity flag (thread prefetch)")
    p.add_argument("--optimizer", default="Adam")
    p.add_argument("--lr0", type=float, default=0.001)
    p.add_argument("--lrf", type=float, default=0.01)
    p.add_argument("--decay", type=float, default=5e-5)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--project", default=str(ROOT / "runs" / "train-cls"))
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    train(parse_opt())
