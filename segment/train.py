"""Instance-segmentation training CLI.

The working equivalent of reference segment/train.py:348-622 (whose own
dataloader/loss contract is inconsistent — SURVEY §2.2): YOLO-seg dataset with
mosaic, ComputeSegmentLoss, EMA, warmup schedules, per-epoch val with box+mask
mAP fitness, last/best checkpoints, CSV logging, early stopping.

Usage:
    python segment/train.py --cfg yolov5n-seg.yaml --data coco128-seg.yaml \
        --hyp hyp.scratch-low.yaml --epochs 100 --batch-size 16 --imgsz 640
"""

import argparse
import csv
import math
import os
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

from yolo_dual_tpu.data import create_dataloader
from yolo_dual_tpu.engine import evaluate_segment
from yolo_dual_tpu.losses import ComputeSegmentLoss
from yolo_dual_tpu.metrics.seg import fitness_seg
from yolo_dual_tpu.models.model import SegmentationModel
from yolo_dual_tpu.train import (
    EarlyStopping, ModelEMA, Trainer, load_checkpoint, save_checkpoint,
    smart_optimizer, strip_optimizer,
)
from yolo_dual_tpu.utils.general import (
    LOGGER, check_dataset, check_img_size, colorstr, increment_path, init_seeds,
    select_device, yaml_load, yaml_save,
)

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


def find_cfg(name, *dirs):
    p = Path(name)
    if p.exists():
        return p
    for d in dirs:
        c = CONFIGS / d / name
        if c.exists():
            return c
    raise FileNotFoundError(f"config {name} not found in {dirs}")


def train(opt):
    select_device(opt.device)
    init_seeds(opt.seed)
    resume_ckpt = None
    if opt.resume:
        # smart_resume run-dir resolution (reference utils/torch_utils.py:361-378
        # + get_latest_run, utils/general.py): bare --resume reuses the MOST
        # RECENT existing run dir instead of allocating a fresh one
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
    else:
        save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok, mkdir=True)
    if resume_ckpt is not None:
        # reference smart-resume reinstates the RUN's opt.yaml/hyp.yaml
        # (reference segment/train.py:648-660): the current invocation's flag
        # DEFAULTS must not silently replace the interrupted run's settings.
        # Divergence from the reference (which discards the new argv wholesale):
        # flags the user explicitly typed win over the restored values, so
        # `--resume --epochs 300` extends a run.
        explicit = set(getattr(opt, "explicit", []) or [])
        opt_yaml = save_dir / "opt.yaml"
        if opt_yaml.exists():
            saved_opt = yaml_load(opt_yaml)
            for k, v in saved_opt.items():
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
        hyp = yaml_load(find_cfg(opt.hyp, "hyps"))
    data = check_dataset(find_cfg(opt.data, "data"), autodownload=not getattr(opt, "no_download", False))
    yaml_save(save_dir / "hyp.yaml", hyp)
    yaml_save(save_dir / "opt.yaml", vars(opt))
    imgsz = check_img_size(opt.imgsz, 32)

    import jax.numpy as jnp
    dtype = {"bf16": jnp.bfloat16, "f32": None}[opt.dtype]
    model = SegmentationModel(find_cfg(opt.cfg, "segment", "models"), nc=int(data["nc"]),
                              dtype=dtype, blocked_stem=not opt.no_blocked_stem,
                              fused_bn=getattr(opt, "fused_bn", True),
                              fused_bn_act=getattr(opt, "fused_bn", True)
                              and getattr(opt, "fused_bn_act", True))
    variables = model.init(imgsz=imgsz)
    if opt.weights:
        from yolo_dual_tpu.io import import_torch_state_dict, load_torch_checkpoint
        if str(opt.weights).endswith(".pt"):
            sd = load_torch_checkpoint(opt.weights)
            variables = import_torch_state_dict(variables, sd, spec=model.spec, strict=False)
        else:
            ckpt = load_checkpoint(opt.weights)
            variables = ckpt["variables"]
    model.names = data.get("names", model.names)
    model.hyp = hyp

    if opt.label_smoothing:
        hyp["label_smoothing"] = opt.label_smoothing
    train_loader, dataset = create_dataloader(
        data["train"], imgsz, opt.batch_size, hyp=hyp, augment=True, shuffle=True,
        mask_downsample_ratio=opt.mask_ratio, overlap_mask=not opt.no_overlap,
        task="segment", seed=opt.seed, prefix=colorstr("train: "), single_cls=opt.single_cls,
        rect=opt.rect, cache_images=opt.cache,
        device_aug=getattr(opt, "device_aug", False))
    if not opt.noplots:
        try:  # label-distribution panels (reference on_pretrain_routine_end)
            from yolo_dual_tpu.utils.plots import plot_labels
            all_lbl = [l for l in dataset.labels if len(l)]
            if all_lbl:
                plot_labels(np.concatenate(all_lbl), data.get("names", {}), save_dir)
        except Exception as e:
            LOGGER.info(f"labels plot skipped: {e}")
    if opt.quad:
        # the reference's seg collate_fn4 resolves to the DETECTION quad
        # collate (drops masks) — unusable for segment training there too;
        # accepted for CLI parity, ignored with a note
        LOGGER.info("--quad: quad collate is detection-only (matches the "
                    "reference's broken seg quad path); ignored for segment")
    if opt.sync_bn:
        LOGGER.info("--sync-bn: batch stats over a mesh-sharded batch are "
                    "globally reduced under jit — SyncBN is implicit")
    val_loader, _ = create_dataloader(
        data["val"], imgsz, opt.batch_size, hyp=hyp, augment=False,
        mask_downsample_ratio=opt.mask_ratio, overlap_mask=not opt.no_overlap,
        task="segment", prefix=colorstr("val: "), single_cls=opt.single_cls)

    nb = len(train_loader)
    accumulate = max(round(opt.nbs / opt.batch_size), 1)
    head_kw = model.spec.layers[-1].kw()
    nm = head_kw.get("nm", 32)
    loss_fn = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], int(data["nc"]),
                                 nm, hyp, overlap=not opt.no_overlap)
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
    trainer = Trainer(model, loss_fn, tx, ema=ModelEMA(decay=hyp.get("ema_decay", 0.9999),
                                   tau=hyp.get("ema_tau", 2000.0)), task="segment", mesh=mesh,
                      remat=opt.remat, accumulate=accumulate)
    state = trainer.init_state(variables)
    start_epoch = 0
    best_fitness = 0.0
    if resume_ckpt is not None:
        # smart_resume equivalent (reference utils/torch_utils.py:361-378):
        # restore params/BN stats/EMA/optimizer state/epoch/best fitness
        template = {"variables": {"params": state.params, "batch_stats": state.batch_stats},
                    "ema": state.ema, "epoch": 0, "best_fitness": 0.0,
                    "opt_state": state.opt_state}
        try:
            # typed restore: optax/EMA containers keep their classes
            ckpt = load_checkpoint(resume_ckpt, target=template)
        except Exception:
            # stripped/partial checkpoint (e.g. --nosave-optimizer) — fall back
            ckpt = load_checkpoint(resume_ckpt)
        state = state.replace(
            params=ckpt["variables"]["params"],
            batch_stats=ckpt["variables"].get("batch_stats", state.batch_stats),
            ema=ckpt.get("ema") or state.ema,
            opt_state=(ckpt.get("opt_state") if ckpt.get("opt_state") is not None
                       else state.opt_state))
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        best_fitness = float(ckpt.get("best_fitness", 0.0))
        LOGGER.info(f"resumed from epoch {start_epoch} (best fitness {best_fitness:.4f})")
    step_fn = trainer.make_train_step()
    stopper = EarlyStopping(patience=opt.patience)
    stopper.best_fitness = best_fitness

    csv_path = save_dir / "results.csv"
    if resume_ckpt is None or not csv_path.exists():
        # header only on fresh runs: resuming must append, not truncate history
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerow(["epoch", "box_loss", "seg_loss", "obj_loss", "cls_loss",
                                    "mAP50_B", "mAP_B", "mAP50_M", "mAP_M", "fitness"])
    # TB + optional remote sinks (CSV handled above to keep the resume-append
    # semantics); reference Loggers facade, utils/loggers/__init__.py
    from yolo_dual_tpu.utils.loggers import Loggers
    # the trainer owns results.csv (resume-append semantics above) — a "csv"
    # sink here would adopt its header and interleave NaN rows (advisor r2)
    extra_sinks = tuple(s for s in (opt.loggers or ()) if s != "csv")
    loggers = Loggers(save_dir, opt=vars(opt), hyp=hyp,
                      include=("tb",) + extra_sinks, run_name=opt.name)

    LOGGER.info(f"Training {opt.cfg} on {data.get('train')} for {opt.epochs} epochs "
                f"(batch {opt.batch_size}, imgsz {imgsz}, accumulate {accumulate})...")
    t0 = time.time()
    if opt.image_weights:
        from yolo_dual_tpu.utils.general import (labels_to_class_weights,
                                                 labels_to_image_weights)
        class_weights = labels_to_class_weights(dataset.labels, int(data["nc"]))
    maps = np.zeros(int(data["nc"]))
    mean = np.zeros(8)
    for epoch in range(start_epoch, opt.epochs):
        final_epoch = epoch == opt.epochs - 1
        if opt.image_weights:
            # bias sampling toward rare / low-mAP classes
            # (reference segment/train.py:496-500)
            cw = class_weights * (1 - maps) ** 2 / int(data["nc"])
            train_loader.sample_weights = labels_to_image_weights(
                dataset.labels, int(data["nc"]), cw)
        train_loader.set_epoch(epoch)
        mloss = np.zeros(4)
        for i, batch in enumerate(train_loader):
            if "aug_tiles" in batch:
                # device-side augmentation: host shipped raw tiles + geometry;
                # composite/warp/HSV/flips/normalize run on the TPU
                # (kernels/augment.py; north-star device-side preprocessing)
                from yolo_dual_tpu.kernels.augment import mosaic_warp_hsv
                image = mosaic_warp_hsv(
                    jnp.asarray(batch["aug_tiles"]), jnp.asarray(batch["aug_dst"]),
                    jnp.asarray(batch["aug_off"]), jnp.asarray(batch["aug_invm"]),
                    jnp.asarray(batch["aug_hsv"]), jnp.asarray(batch["aug_flips"]),
                    out_size=imgsz)
                b = {"image": image, **{k: jnp.asarray(batch[k])
                                        for k in ("targets", "tmask", "masks")}}
            else:
                b = {k: jnp.asarray(batch[k]) for k in ("image", "targets", "tmask", "masks")}
            if mesh is not None:
                from yolo_dual_tpu.parallel import shard_batch
                b = shard_batch(b, mesh)
            state, metrics = step_fn(state, b)
            mloss = (mloss * i + np.asarray(metrics["items"])) / (i + 1)
        variables_eval = state.ema["ema"] if state.ema is not None else \
            {"params": state.params, "batch_stats": state.batch_stats}
        if not opt.noval or final_epoch:  # --noval: validate final epoch only
            mean, maps, _ = evaluate_segment(model, variables_eval, val_loader,
                                             int(data["nc"]), nm=nm,
                                             mask_ratio=opt.mask_ratio,
                                             names=data.get("names"))
        fi = fitness_seg(np.asarray(mean))
        LOGGER.info(f"epoch {epoch}: loss {mloss.round(4)} fitness {fi:.4f} "
                    f"({(time.time() - t0) / (epoch + 1):.1f}s/epoch)")
        with open(csv_path, "a", newline="") as f:
            csv.writer(f).writerow([epoch, *mloss, mean[2], mean[3], mean[6], mean[7], fi])
        loggers.log_metrics({
            "train/box_loss": mloss[0], "train/seg_loss": mloss[1],
            "train/obj_loss": mloss[2], "train/cls_loss": mloss[3],
            "metrics/precision(B)": mean[0], "metrics/recall(B)": mean[1],
            "metrics/mAP_0.5(B)": mean[2], "metrics/mAP_0.5:0.95(B)": mean[3],
            "metrics/precision(M)": mean[4], "metrics/recall(M)": mean[5],
            "metrics/mAP_0.5(M)": mean[6], "metrics/mAP_0.5:0.95(M)": mean[7],
            "fitness": fi}, epoch)
        if not opt.nosave or final_epoch:  # --nosave: checkpoint final epoch only
            ckpt = {"variables": {"params": state.params, "batch_stats": state.batch_stats},
                    "ema": state.ema, "epoch": epoch, "best_fitness": float(max(fi, best_fitness)),
                    "opt_state": None if opt.nosave_optimizer else state.opt_state}
            save_checkpoint(save_dir / "last", ckpt)
            loggers.on_model_save(save_dir / "last", epoch, best_fitness, fi)
            if fi >= best_fitness:
                save_checkpoint(save_dir / "best", ckpt)
        best_fitness = max(best_fitness, fi)
        if stopper(epoch, fi):
            break
    if (save_dir / "best").exists():
        strip_optimizer(save_dir / "best")
    if not opt.noplots:
        try:
            from yolo_dual_tpu.utils.plots import plot_results
            plot_results(csv_path, save_dir)
        except Exception as e:
            LOGGER.info(f"results plot skipped: {e}")
    loggers.on_train_end(save_dir / "results.png")
    LOGGER.info(f"Done in {(time.time() - t0) / 3600:.2f}h; results in {save_dir}")
    return best_fitness


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="", help="initial weights (.pt or orbax dir)")
    p.add_argument("--resume", nargs="?", const=True, default="", help="resume from last checkpoint (optionally a path)")
    p.add_argument("--cfg", type=str, default="yolov5n-seg.yaml", help="model config")
    p.add_argument("--data", type=str, default="coco128-seg.yaml", help="dataset config")
    p.add_argument("--hyp", type=str, default="hyp.scratch-low.yaml", help="hyperparameters")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    p.add_argument("--rect", action="store_true",
                   help="aspect-bucket batching (rect analog; static shapes)")
    p.add_argument("--cache", type=str, default=False, nargs="?", const="ram",
                   help="image cache: ram or disk")
    p.add_argument("--quad", action="store_true", help="quad collate (detection-only)")
    p.add_argument("--image-weights", action="store_true",
                   help="weighted image resampling by class rarity x (1-mAP)^2")
    p.add_argument("--freeze", nargs="+", type=int, default=[0],
                   help="freeze layers: single N = layers 0..N-1, list = those indices")
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--sync-bn", action="store_true",
                   help="accepted for parity (SyncBN is implicit under a sharded mesh)")
    p.add_argument("--noval", action="store_true", help="validate final epoch only")
    p.add_argument("--nosave", action="store_true", help="checkpoint final epoch only")
    p.add_argument("--noplots", action="store_true", help="skip results plots")
    p.add_argument("--optimizer", choices=["SGD", "Adam", "AdamW"], default="SGD")
    p.add_argument("--cos-lr", action="store_true")
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--mask-ratio", type=int, default=4)
    p.add_argument("--no-overlap", action="store_true")
    p.add_argument("--project", default=str(ROOT / "runs" / "train-seg"))
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true", help="shard batch over all devices")
    p.add_argument("--nosave-optimizer", action="store_true")
    p.add_argument("--evolve", type=int, default=0, help="generations of hyperparameter evolution")
    p.add_argument("--remat", action="store_true", help="rematerialize forward (saves HBM)")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                   help="compute dtype (params stay f32; bf16 feeds the MXU at full rate)")
    p.add_argument("--no-blocked-stem", action="store_true",
                   help="disable the s2d blocked-stem train schedule (nn/blocked_train.py)")
    p.add_argument("--loggers", nargs="*", default=[],
                   help="extra sinks: wandb clearml comet (no-ops if not installed)")
    p.add_argument("--device", default="", help="accepted for reference-CLI parity (JAX selects devices)")
    p.add_argument("--workers", type=int, default=0, help="accepted for parity (thread prefetch is used)")
    p.add_argument("--no-download", action="store_true",
                   help="refuse to execute the data yaml's download: hook")
    p.add_argument("--nbs", type=int, default=64,
                   help="nominal batch size for gradient accumulation "
                        "(reference segment/train.py nbs=64)")
    p.add_argument("--no-fused-bn-act", dest="fused_bn_act", action="store_false",
                   help="disable the BN+act folded VJP (recompute-in-backward "
                        "residual lever; +4.3%% train on v5e, tools/bench_bn_act.py)")
    p.add_argument("--no-fused-bn", dest="fused_bn", action="store_false",
                   help="disable the custom-VJP BatchNorm in the train step "
                        "(nn/common.py FusedBatchNorm; measured +14%% train "
                        "throughput on v5e, tools/bench_fused_bn.py: 32.2 -> "
                        "28.2 ms/iter bs16@640)")
    p.add_argument("--device-aug", dest="device_aug", action="store_true",
                   default=True,
                   help="run mosaic composite + warp + HSV + flips on the TPU "
                        "(host does decode + label geometry only). DEFAULT ON "
                        "since r4: measured 97.3 vs 60.4 img/s/core host-side "
                        "with the RAM cache (tools/bench_loader.py) — the "
                        "north-star 'never input-bound' lever. Auto-falls back "
                        "to the host pipeline when the hyp needs mixup/"
                        "copy_paste or mosaic<1 (data/dataset.py:141-148)")
    p.add_argument("--no-device-aug", dest="device_aug", action="store_false",
                   help="force the host-side mosaic/warp/HSV pipeline")
    args = p.parse_args(argv)
    # record which flags the user actually typed: on --resume, flags NOT
    # explicitly passed are restored from the run's opt.yaml (see train())
    tokens = {t.split("=", 1)[0] for t in (argv if argv is not None else sys.argv[1:])}
    args.explicit = sorted(a.dest for a in p._actions
                           if any(s in tokens for s in a.option_strings))
    return args


def evolve(opt):
    """Hyperparameter evolution loop (reference --evolve, segment/train.py
    evolve meta + utils/general.py print_mutation)."""
    from yolo_dual_tpu.utils.evolve import mutate, print_mutation
    base_hyp = yaml_load(find_cfg(opt.hyp, "hyps"))
    save_dir = increment_path(Path(opt.project) / f"{opt.name}-evolve", mkdir=True)
    evolve_csv = save_dir / "evolve.csv"
    for gen in range(opt.evolve):
        hyp = mutate(base_hyp, evolve_csv, seed=gen)
        hyp_file = save_dir / f"hyp_gen{gen}.yaml"
        yaml_save(hyp_file, hyp)
        o = argparse.Namespace(**vars(opt))
        o.hyp = str(hyp_file)
        o.name = f"{opt.name}-gen{gen}"
        o.evolve = 0
        fi = train(o)
        print_mutation([], [], hyp, save_dir, float(fi))
    try:
        from yolo_dual_tpu.utils.plots import plot_evolve
        plot_evolve(evolve_csv)
    except Exception as e:  # plotting must never fail the evolution run
        LOGGER.warning(f"plot_evolve failed: {e}")
    LOGGER.info(f"evolution complete; log at {evolve_csv}")


if __name__ == "__main__":
    _opt = parse_opt()
    if _opt.evolve:
        evolve(_opt)
    else:
        train(_opt)
