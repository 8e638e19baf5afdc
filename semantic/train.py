"""Semantic-segmentation training CLI — ONE trainer for every backbone family.

Replaces the reference's ~10 copy-pasted standalone trainers
(reference unet-lite/{Resnet18,Resnet34,Resnet50,Vgg16,yolo5-seg,yolo8-seg,
yolo9-seg}/seg_*.py, yolov5/seg.py, yolov8/seg*.py, yolov9/seg.py): pick the
backbone with --cfg (resnet18/34/50, vgg16, yolov5_seg, yolov8_seg,
yolov9_seg) and the loss with --loss {dice, jaccard, ce}. JSON dense-mask
dataset, class weights (data-driven or weight.yaml), AMP-analog bf16, EMA,
TensorBoard-style CSV logging, mIoU validation with ignore_index.

Usage:
    python semantic/train.py --cfg resnet50.yaml --img-dir data/imgs \
        --json-dir data/jsons --loss dice --epochs 100
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

from yolo_dual_tpu.data import create_json_segment_dataloader, verify_json_masks, batch_convert_masks_to_json
from yolo_dual_tpu.engine import evaluate_semantic
from yolo_dual_tpu.losses import SemanticSegLoss, parse_class_weights
from yolo_dual_tpu.metrics import fitness
from yolo_dual_tpu.models.model import SemanticSegModel
from yolo_dual_tpu.train import (
    EarlyStopping, ModelEMA, Trainer, save_checkpoint, smart_optimizer, strip_optimizer,
)
from yolo_dual_tpu.utils.general import LOGGER, increment_path, init_seeds, yaml_load, yaml_save

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"
CLASS_NAMES = ["sky", "building", "pole", "road", "pavement", "tree", "signsymbol",
               "fence", "car", "pedestrian", "bicyclist", "unlabelled"]


def find_cfg(name, d="semantic"):
    p = Path(name)
    return p if p.exists() else CONFIGS / d / name


def _log_train_panels(loggers, model, state, batch, step):
    """Per-100-step input/GT/pred/diff panel row (reference
    unet-lite/Resnet50/seg_diceloss_Resnet50.py:1114-1138: 4-panel grids of
    the live model's prediction every 100 steps)."""
    try:
        from yolo_dual_tpu.utils.plots import colorize_semantic
        img = np.asarray(batch["image"][0])
        gt = np.asarray(batch["mask"][0]).astype(np.int64)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, jnp.asarray(img[None], jnp.float32) / 255.0,
                          train=False)
        pred = np.asarray(jnp.argmax(out[0], axis=-1)).astype(np.int64)
        if pred.shape != gt.shape:
            import cv2
            pred = cv2.resize(pred.astype(np.uint8), gt.shape[::-1],
                              interpolation=cv2.INTER_NEAREST).astype(np.int64)
        diff = np.where(pred != gt, 255, 0).astype(np.uint8)
        panels = np.concatenate([
            img.astype(np.uint8), colorize_semantic(gt), colorize_semantic(pred),
            np.stack([diff] * 3, -1)], axis=1)
        loggers.log_images("Train/input_gt_pred_diff", panels, step)
    except Exception as e:  # panels must never kill a training run
        LOGGER.info(f"train panel logging skipped: {e}")


def train(opt):
    from yolo_dual_tpu.utils.general import select_device
    select_device(opt.device)
    init_seeds(opt.seed)
    resume_ckpt = None
    if opt.resume:
        # smart-resume run-dir resolution + opt/hyp reinstatement (reference
        # utils/torch_utils.py:361-378; same semantics as segment/train.py:
        # the run's opt.yaml wins over defaults, explicitly-typed flags win
        # over the run)
        if isinstance(opt.resume, str) and Path(opt.resume).exists():
            resume_ckpt = Path(opt.resume)
            save_dir = resume_ckpt.parent
        else:
            runs = sorted((p for p in Path(opt.project).glob(f"{opt.name}*")
                           if (p / "last").exists()),
                          key=lambda p: (p / "last").stat().st_mtime)
            if not runs:
                raise FileNotFoundError(
                    f"--resume: no run with a 'last' checkpoint under "
                    f"{opt.project}/{opt.name}*")
            save_dir = runs[-1]
            resume_ckpt = save_dir / "last"
        explicit = set(getattr(opt, "explicit", []) or [])
        opt_yaml = save_dir / "opt.yaml"
        if opt_yaml.exists():
            for k, v in yaml_load(opt_yaml).items():
                if (k not in ("resume", "device", "workers", "project", "name",
                              "exist_ok", "explicit")
                        and k not in explicit and hasattr(opt, k)):
                    setattr(opt, k, v)
        hyp_yaml = save_dir / "hyp.yaml"
        if hyp_yaml.exists() and "hyp" not in explicit:
            hyp = yaml_load(hyp_yaml)
        else:
            hyp = yaml_load(find_cfg(opt.hyp, "hyps"))
    else:
        save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok, mkdir=True)
        hyp = yaml_load(find_cfg(opt.hyp, "hyps")) if opt.hyp else dict(
            lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=3.0,
            warmup_momentum=0.8, warmup_bias_lr=0.1)
    yaml_save(save_dir / "hyp.yaml", hyp)
    yaml_save(save_dir / "opt.yaml", vars(opt))

    if not opt.img_dir or not opt.json_dir:
        raise SystemExit("--img-dir/--json-dir are required (or restorable via --resume)")
    ok, missing = verify_json_masks(opt.img_dir, opt.json_dir)
    if not ok and opt.mask_dir:
        LOGGER.info(f"{len(missing)} JSON masks missing; converting from {opt.mask_dir}")
        batch_convert_masks_to_json(opt.mask_dir, opt.json_dir, CLASS_NAMES)
    model = SemanticSegModel(find_cfg(opt.cfg), nc=opt.nc,
                             fused_bn=getattr(opt, "fused_bn", True))
    variables = model.init(imgsz=opt.imgsz)
    if opt.weights and resume_ckpt is None:
        # partial pretrained load: keep shape-matching leaves (reference
        # intersect_dicts, seg_diceloss_Resnet50.py:978-984)
        from yolo_dual_tpu.train.checkpoint import partial_load
        variables = partial_load(variables, opt.weights)

    train_loader, dataset = create_json_segment_dataloader(
        opt.img_dir, opt.json_dir, opt.imgsz, opt.batch_size,
        augment=opt.augment, num_classes=opt.nc, seed=opt.seed,
        device_preprocess=opt.device_preprocess)
    if opt.device_preprocess:
        # host ships raw frames; resize-pad(+hflip/brightness/contrast) run on
        # device (kernels/preprocess.py semantic_preprocess) — the segment
        # --device-aug treatment for the semantic task
        from yolo_dual_tpu.kernels import semantic_preprocess as _sem_pre
        _pre_interp = jax.default_backend() not in ("tpu", "axon")
    val_loader, _ = create_json_segment_dataloader(
        opt.val_img_dir or opt.img_dir, opt.val_json_dir or opt.json_dir, opt.imgsz,
        opt.batch_size, augment=False, num_classes=opt.nc, drop_last=False)

    if opt.class_weights:
        cw = parse_class_weights(opt.class_weights, opt.nc, CLASS_NAMES)
    elif opt.auto_weights:
        cw = dataset.class_weights()
        LOGGER.info(f"data-driven class weights: {np.round(cw, 3)}")
    else:
        cw = None
    loss_fn = SemanticSegLoss(opt.nc, label_smoothing=opt.label_smoothing,
                              class_weights=cw, flavor=opt.loss)

    nb = len(train_loader)
    accumulate = max(round(opt.nbs / opt.batch_size), 1)
    tx = smart_optimizer(variables["params"], opt.optimizer, hyp, epochs=opt.epochs,
                         steps_per_epoch=nb, cos_lr=opt.cos_lr, accumulate=accumulate,
                         total_batch_size=opt.batch_size)
    if opt.freeze and (len(opt.freeze) > 1 or opt.freeze[0] > 0):
        from yolo_dual_tpu.train import freeze_layers
        tx = freeze_layers(tx, variables["params"], opt.freeze)
    mesh = None
    if opt.data_parallel and jax.device_count() > 1:
        from yolo_dual_tpu.parallel import make_mesh
        mesh = make_mesh()
    ema = (ModelEMA(decay=hyp.get("ema_decay", 0.9999), tau=hyp.get("ema_tau", 2000.0))
           if opt.ema else None)
    trainer = Trainer(model, loss_fn, tx, ema=ema, task="semantic", mesh=mesh,
                      accumulate=accumulate)
    state = trainer.init_state(variables)
    start_epoch = 0
    best_fitness = -1.0
    if resume_ckpt is not None:
        from yolo_dual_tpu.train import load_checkpoint
        template = {"variables": {"params": state.params, "batch_stats": state.batch_stats},
                    "ema": state.ema, "epoch": 0, "best_fitness": 0.0,
                    "opt_state": state.opt_state}
        try:
            ckpt = load_checkpoint(resume_ckpt, target=template)
        except Exception:
            ckpt = load_checkpoint(resume_ckpt)
        state = state.replace(
            params=ckpt["variables"]["params"],
            batch_stats=ckpt["variables"].get("batch_stats", state.batch_stats),
            ema=ckpt.get("ema") or state.ema,
            opt_state=(ckpt.get("opt_state") if ckpt.get("opt_state") is not None
                       else state.opt_state))
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        best_fitness = float(ckpt.get("best_fitness", -1.0))
        LOGGER.info(f"resumed from epoch {start_epoch} (best mIoU {best_fitness:.4f})")
    step_fn = trainer.make_train_step()
    stopper = EarlyStopping(patience=opt.patience)
    stopper.best_fitness = max(best_fitness, 0.0)

    csv_path = save_dir / "results.csv"
    if resume_ckpt is None or not csv_path.exists():
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerow(["epoch", "total_loss", "ce_loss", f"{opt.loss}_loss",
                                    "mIoU", "val_loss", "fitness"])

    # TB sinks: per-10-step scalars + per-100-step input/GT/pred/diff panels,
    # the standalone reference trainers' cadence
    # (reference unet-lite/Resnet50/seg_diceloss_Resnet50.py:1114-1138);
    # CSV history is written by this loop itself, so only 'tb' is included.
    from yolo_dual_tpu.train.optim import build_lr_schedule
    from yolo_dual_tpu.utils.loggers import Loggers
    loggers = Loggers(save_dir, opt=vars(opt), hyp=hyp, include=("tb",))
    lr_fn = build_lr_schedule(hyp, opt.epochs, nb, opt.cos_lr, "g0", accumulate)

    t0 = time.time()
    for epoch in range(start_epoch, opt.epochs):
        train_loader.set_epoch(epoch)
        mloss = np.zeros(3)
        for i, batch in enumerate(train_loader):
            if opt.device_preprocess:
                im, mk = _sem_pre(jnp.asarray(batch["image_raw"]),
                                  jnp.asarray(batch["mask_raw"]),
                                  out_size=opt.imgsz, interpret=_pre_interp,
                                  flip=jnp.asarray(batch["flip"]),
                                  bright=jnp.asarray(batch["bright"]),
                                  contr=jnp.asarray(batch["contr"]))
                # panels want host uint8 copies at the training resolution
                batch = {"image": (np.asarray(im) * 255).astype(np.uint8),
                         "mask": np.asarray(mk)}
                b = {"image": im, "mask": mk}
            else:
                b = {"image": jnp.asarray(batch["image"]), "mask": jnp.asarray(batch["mask"])}
            if mesh is not None:
                from yolo_dual_tpu.parallel import shard_batch
                b = shard_batch(b, mesh)
            state, metrics = step_fn(state, b)
            mloss = (mloss * i + np.asarray(metrics["items"])) / (i + 1)
            gstep = epoch * nb + i
            if gstep % 10 == 0:
                items = np.asarray(metrics["items"])
                loggers.log_metrics({
                    "Train/Total_Loss": float(items[0]),
                    "Train/CE_Loss": float(items[1]),
                    f"Train/{opt.loss.capitalize()}_Loss": float(items[2]),
                    "Train/Learning_Rate": float(lr_fn(gstep))}, gstep)
            if gstep % 100 == 0:
                _log_train_panels(loggers, model, state, batch, gstep)
        variables_eval = state.ema["ema"] if state.ema is not None else \
            {"params": state.params, "batch_stats": state.batch_stats}
        (miou, vloss, _, _), per_cls_iou, _ = evaluate_semantic(
            model, variables_eval, val_loader, opt.nc, ignore_index=opt.ignore_index,
            loss_fn=loss_fn, names=dict(enumerate(CLASS_NAMES)))
        # Reference quirk, knowingly fixed: it fed (mIoU, dice, 0, 0) through the
        # DETECTION fitness (w=[0,0,.1,.9]) which is identically zero, so best.pt
        # was overwritten every epoch (SURVEY §2.2). We use mIoU as fitness.
        fi = float(miou)
        LOGGER.info(f"epoch {epoch}: train {mloss.round(4)} mIoU {miou:.4f} "
                    f"({(time.time() - t0) / (epoch + 1):.1f}s/epoch)")
        with open(csv_path, "a", newline="") as f:
            csv.writer(f).writerow([epoch, *mloss, miou, vloss, fi])
        ckpt = {"variables": {"params": state.params, "batch_stats": state.batch_stats},
                "ema": state.ema, "epoch": epoch, "best_fitness": float(max(fi, best_fitness)),
                "opt_state": state.opt_state}
        save_checkpoint(save_dir / "last", ckpt)
        if fi >= best_fitness:
            best_fitness = fi
            save_checkpoint(save_dir / "best", ckpt)
        if stopper(epoch, fi):
            break
    strip_optimizer(save_dir / "best")
    try:
        from yolo_dual_tpu.utils.plots import plot_results
        plot_results(csv_path, save_dir)
    except Exception as e:
        LOGGER.info(f"results plot skipped: {e}")
    LOGGER.info(f"Done; best mIoU {best_fitness:.4f}; results in {save_dir}")
    return best_fitness


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="",
                   help="pretrained checkpoint (partial, shape-matched load)")
    p.add_argument("--resume", nargs="?", const=True, default="",
                   help="resume from last checkpoint (optionally a path)")
    p.add_argument("--freeze", nargs="+", type=int, default=[0],
                   help="freeze layers: single N = layers 0..N-1, list = indices")
    p.add_argument("--cfg", type=str, default="resnet50.yaml",
                   help="semantic model config (resnet18/34/50, vgg16, yolov5_seg, yolov8_seg, yolov9_seg)")
    p.add_argument("--img-dir", type=str, default="", help="required unless --resume")
    p.add_argument("--json-dir", type=str, default="", help="required unless --resume")
    p.add_argument("--mask-dir", type=str, default="", help="PNG masks to auto-convert to JSON")
    p.add_argument("--val-img-dir", type=str, default="")
    p.add_argument("--val-json-dir", type=str, default="")
    p.add_argument("--hyp", type=str, default="hyp.scratch-seg.yaml")
    p.add_argument("--loss", choices=["dice", "jaccard", "ce"], default="dice")
    p.add_argument("--nc", type=int, default=12)
    p.add_argument("--ignore-index", type=int, default=11)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--optimizer", choices=["SGD", "Adam", "AdamW"], default="SGD")
    p.add_argument("--cos-lr", action="store_true")
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--class-weights", type=str, default="", help="weight.yaml / CSV string")
    p.add_argument("--auto-weights", action="store_true", help="data-driven class weights")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--project", default=str(ROOT / "runs" / "train-semantic"))
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--no-fused-bn", dest="fused_bn", action="store_false",
                   help="disable the custom-VJP train BatchNorm")
    p.add_argument("--no-augment", dest="augment", action="store_false",
                   help="disable train-time PIL augmentation (reference "
                        "create_json_segment_dataloader augment flag)")
    p.add_argument("--no-ema", dest="ema", action="store_false",
                   help="train and evaluate raw weights (no EMA shadow)")
    p.add_argument("--nbs", type=int, default=64,
                   help="nominal batch size for gradient accumulation "
                        "(reference nbs=64; accumulate=round(nbs/bs) — at "
                        "bs=4 that is 16x fewer optimizer steps, see the "
                        "golden-floor analysis in docs/PARITY.md)")
    p.add_argument("--device-preprocess", action="store_true",
                   help="host ships raw frames; resize-pad(+hflip/brightness/"
                        "contrast) run on device (kernels semantic_preprocess)")
    p.add_argument("--device", default="", help="parity flag")
    p.add_argument("--workers", type=int, default=0, help="parity flag")
    args = p.parse_args(argv)
    # which flags the user actually typed: on --resume, other values come
    # from the run's opt.yaml (same contract as segment/train.py)
    tokens = {t.split("=", 1)[0] for t in (argv if argv is not None else sys.argv[1:])}
    args.explicit = sorted(a.dest for a in p._actions
                           if any(s in tokens for s in a.option_strings))
    return args


if __name__ == "__main__":
    train(parse_opt())
