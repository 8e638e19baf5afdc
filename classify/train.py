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


class FolderClassificationDataset:
    """ImageFolder-style dataset: root/<class>/<img> (reference
    utils/dataloaders.py:1162 ClassificationDataset)."""

    def __init__(self, root, imgsz=224, augment=False, seed=0):
        import random
        self.root = Path(root)
        self.classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.items = []
        for ci, c in enumerate(self.classes):
            for f in sorted((self.root / c).rglob("*.*")):
                if f.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp", ".webp"):
                    self.items.append((f, ci))
        self.imgsz = imgsz
        self.augment = augment
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        import cv2
        f, ci = self.items[i]
        im = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        if self.augment:  # RandomResizedCrop-style (reference classify_transforms)
            h, w = im.shape[:2]
            s = self.rng.uniform(0.5, 1.0)
            ch, cw = int(h * s), int(w * s)
            y0, x0 = self.rng.randint(0, h - ch), self.rng.randint(0, w - cw)
            im = im[y0:y0 + ch, x0:x0 + cw]
            if self.rng.random() < 0.5:
                im = np.fliplr(im).copy()
        im = cv2.resize(im, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        return {"image": im, "label": np.int32(ci)}


def train(opt):
    from yolo_dual_tpu.data.loader import Loader
    init_seeds(opt.seed)
    save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok, mkdir=True)
    train_ds = FolderClassificationDataset(Path(opt.data_dir) / "train", opt.imgsz, augment=True)
    val_dir = Path(opt.data_dir) / ("val" if (Path(opt.data_dir) / "val").exists() else "test")
    val_ds = FolderClassificationDataset(val_dir, opt.imgsz)
    nc = len(train_ds.classes)
    train_loader = Loader(train_ds, opt.batch_size, shuffle=True, seed=opt.seed, drop_last=True)
    val_loader = Loader(val_ds, opt.batch_size, drop_last=False)

    cfg = Path(opt.model) if Path(opt.model).exists() else CONFIGS / "models" / opt.model
    model = ClassificationModel(cfg, nc=nc, cutoff=opt.cutoff)
    variables = model.module.init(jax.random.PRNGKey(opt.seed),
                                  jnp.zeros((1, opt.imgsz, opt.imgsz, 3)), train=True)
    variables = jax.tree_util.tree_map(np.asarray, variables)

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
    trainer = Trainer(model, loss_fn, tx, ema=ModelEMA(), task="classify", mesh=mesh)
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
        ckpt = {"variables": {"params": state.params, "batch_stats": state.batch_stats},
                "ema": state.ema, "epoch": epoch, "classes": train_ds.classes}
        save_checkpoint(save_dir / "last", ckpt)
        if top1 >= best:
            best = top1
            save_checkpoint(save_dir / "best", ckpt)
        if stopper(epoch, top1):
            break
    LOGGER.info(f"Done; best top1 {best:.4f}; results in {save_dir}")
    return best


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="yolov5n.yaml", help="detection cfg for backbone")
    p.add_argument("--data-dir", type=str, required=True, help="root with train/ and val|test/")
    p.add_argument("--cutoff", type=int, default=10)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--imgsz", type=int, default=224)
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
