"""Semantic TRAINING-DYNAMICS parity vs the LIVE reference trainer.

The semantic golden floors (tests/test_semantic_golden.py: 0.11-0.23 for the
five softmax configs) are justified by a claim about the reference's behavior:
its models end in nn.Softmax (reference unet-lite/Resnet50/resnet50.yaml:44)
and its SegmentationLoss applies CrossEntropyLoss (= log-softmax AGAIN) on
those probabilities plus dice on a THIRD softmax (reference
unet-lite/Resnet50/seg_diceloss_Resnet50.py:755-770), squashing gradients.
This tool OBSERVES that claim instead of asserting it: it imports the
reference's actual trainer module (model classes + SegmentationLoss, live
torch on CPU) and trains it head-to-head against our SemanticSegModel on the
same deterministic synthetic CamVid scene with identical lr schedule, batch
order, optimizer (SGD momentum 0.9, wd 0), and mIoU metric.

Controls (identical on both sides):
  - data: yolo_dual_tpu.data.tools.synthetic_camvid_arrays (the golden-test
    scene), augment OFF, fixed per-epoch permutation from one shared rng
  - lr: linear warmup 1 epoch -> cosine to lr0*lrf, same closed form
  - no EMA, no weight decay; eval on raw weights with running BN stats
  - metric: one shared numpy confusion-matrix mIoU (12 classes, nanmean over
    classes that appear)
Reference-side control: model.img_size is set to the run size (the class
hardcodes [640,640] and would otherwise bilinear-resize every output to 640,
reference seg_diceloss_Resnet50.py:556,707-708).

Families: resnet18 (logits-path control), resnet50, vgg16, yolov9.
yolov5/yolov8 are excluded because their backbones need
torchvision.ops.DeformConv2d and torchvision is not in this image (the
reference cannot run them here either).

MEASURED OUTCOME (2026-08-21, docs/PARITY.md): the two families whose
reference trainers can actually run track ours per-epoch — resnet50 final
mIoU gap 0.0002, resnet18 gap 0.0007. The other two CANNOT run because of
defects in the reference itself (ours-only trajectories recorded):
 - vgg16: beyond the val_diceloss import (stubbed below), its yaml's
   backbone rows use vgg16_bn1..5 (the torchvision-split wrappers from
   models/common.py) which seg_diceloss_vgg16.py's own parser does not
   implement -> NotImplementedError at build (seg_diceloss_vgg16.py:608).
 - yolov9: the yaml row `[-1, 1, GAM, [512]]` is parsed as `GAM(c1, *args)`
   = GAM(512, k=512) (seg_diceloss_yolov9.py:633, GAM signature :477), i.e.
   the channel count lands in the KERNEL-SIZE slot -> Conv(512,128,k=512)
   tries to allocate a 68.7 GB weight and the build OOMs. The reference's
   yolov9 trainer cannot construct its own config.

Run (one family; ~10-30 min each on 1 CPU core):
    python tools/parity_semantic_dynamics.py --family resnet50 --epochs 60
All three, merged report:
    python tools/parity_semantic_dynamics.py --family all --epochs 60
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time
import types
from pathlib import Path

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(ROOT))

import numpy as np

FAMILIES = {
    # resnet18 is the LOGITS-path control: its reference script ignores the
    # yaml's decoder rows entirely and hardcodes ResNet18()+SegmentHead with
    # no softmax (reference seg_diceloss_resnet18.py:352-380) — so it should
    # learn fast, certifying the HIGH golden tier, while the softmax families
    # below certify the low one.
    "resnet18": dict(script="unet-lite/Resnet18/seg_diceloss_resnet18.py",
                     yaml="unet-lite/Resnet18/resnet18.yaml",
                     cls="ResNet18Seg", ours="resnet18.yaml"),
    "resnet50": dict(script="unet-lite/Resnet50/seg_diceloss_Resnet50.py",
                     yaml="unet-lite/Resnet50/resnet50.yaml",
                     cls="ResNet50Seg", ours="resnet50.yaml"),
    "vgg16": dict(script="unet-lite/Vgg16/seg_diceloss_vgg16.py",
                  yaml="unet-lite/Vgg16/vgg16.yaml",
                  cls="VGG16Seg", ours="vgg16.yaml"),
    "yolov9": dict(script="unet-lite/yolo9-seg/seg_diceloss_yolov9.py",
                   yaml="unet-lite/yolo9-seg/yolov9_seg.yaml",
                   cls="YOLOv9Seg", ours="yolov9_seg.yaml"),
}
NC = 12
LR0, LRF, MOMENTUM = 0.05, 0.2, 0.9  # the golden-recipe lr (hyp_golden.yaml)
ORDER_SEED = 123


def _stub_reference_deps():
    """thop/torchvision/pkg_resources stubs (same approach as
    tests/test_torch_parity.py; none of the stubbed paths execute)."""
    if "thop" not in sys.modules:
        m = types.ModuleType("thop")
        m.profile = lambda *a, **k: (0.0, 0.0)
        sys.modules["thop"] = m
    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")
        from packaging.version import parse as _parse
        pr.parse_version = _parse
        sys.modules["pkg_resources"] = pr
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.0.0-stub"
        for sub in ("models", "ops", "transforms", "transforms.functional",
                    "ops.boxes", "datasets"):
            m = types.ModuleType(f"torchvision.{sub}")
            parent, _, child = sub.rpartition(".")
            setattr(sys.modules.get(f"torchvision.{parent}", tv) if parent else tv,
                    child, m)
            sys.modules[f"torchvision.{sub}"] = m
        tv.datasets.ImageFolder = type("ImageFolder", (),
                                       {"__init__": lambda self, *a, **k: None})
        sys.modules["torchvision"] = tv


def load_reference_module(family: str):
    _stub_reference_deps()
    import importlib.util
    info = FAMILIES[family]
    script = REFERENCE / info["script"]
    for p in (str(REFERENCE), str(script.parent)):
        if p not in sys.path:
            sys.path.insert(0, p)
    # Reference defect, worked around: seg_diceloss_vgg16.py:39 imports a
    # sibling `val_diceloss` that does not exist in its directory (the Vgg16
    # dir ships val.py only) — the script cannot run as checked in. The
    # validator module is used only inside its train(), which this tool never
    # calls, so an empty stub suffices; families whose sibling exists import
    # the real one.
    for sib in ("val_diceloss", "val"):
        if not (script.parent / f"{sib}.py").exists() and sib not in sys.modules:
            sys.modules[sib] = types.ModuleType(sib)
    spec = importlib.util.spec_from_file_location(f"ref_sem_{family}", script)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def lr_at(step: int, total: int, warmup: int) -> float:
    """Shared closed-form schedule: linear warmup then cosine to LR0*LRF."""
    if step < warmup:
        return LR0 * (step + 1) / warmup
    t = (step - warmup) / max(total - warmup, 1)
    return LR0 * LRF + 0.5 * LR0 * (1 - LRF) * (1 + math.cos(math.pi * t))


def miou_of(preds: np.ndarray, gts: np.ndarray) -> float:
    """Shared metric: 12-class confusion, nanmean IoU over appearing classes."""
    cm = np.zeros((NC, NC), np.int64)
    idx = gts.astype(np.int64) * NC + preds.astype(np.int64)
    cm += np.bincount(idx.ravel(), minlength=NC * NC).reshape(NC, NC)
    tp = np.diag(cm).astype(np.float64)
    denom = cm.sum(0) + cm.sum(1) - tp
    iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
    return float(np.nanmean(iou)) if np.isfinite(iou).any() else 0.0


def batch_orders(n: int, bs: int, epochs: int):
    rng = np.random.default_rng(ORDER_SEED)
    return [rng.permutation(n).reshape(-1, bs)[: n // bs] for _ in range(epochs)]


def run_reference(family, imgs, masks, epochs, bs, eval_every):
    import resource

    import torch
    # cap the address space: the yolov9 reference build tries a 68.7 GB conv
    # weight (GAM kernel-size defect, module docstring) — without a cap the
    # kernel OOM-kills the process instead of raising a catchable error
    resource.setrlimit(resource.RLIMIT_AS,
                       (32 * 1024 ** 3, resource.RLIM_INFINITY))
    torch.manual_seed(0)
    torch.set_num_threads(max(os.cpu_count() or 1, 1))
    mod = load_reference_module(family)
    size = imgs.shape[1]
    model = getattr(mod, FAMILIES[family]["cls"])(str(REFERENCE / FAMILIES[family]["yaml"]))
    model.img_size = [size, size]  # control: avoid the hardcoded 640 resize
    loss_fn = mod.SegmentationLoss(num_classes=NC)
    opt = torch.optim.SGD(model.parameters(), lr=lr_at(0, 1, 1), momentum=MOMENTUM)
    x_all = torch.tensor(imgs.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    y_all = torch.tensor(masks.astype(np.int64))
    orders = batch_orders(len(imgs), bs, epochs)
    total_steps = epochs * len(orders[0])
    warmup = len(orders[0])  # 1 epoch
    losses, mious = [], {}
    step = 0
    model.train()
    for ep in range(epochs):
        ep_loss = []
        for sel in orders[ep]:
            for g in opt.param_groups:
                g["lr"] = lr_at(step, total_steps, warmup)
            opt.zero_grad()
            pred = model(x_all[sel])
            loss, items = loss_fn(pred, y_all[sel])
            loss.backward()
            opt.step()
            ep_loss.append(float(items[0]))
            step += 1
        losses.append(float(np.mean(ep_loss)))
        if (ep + 1) % eval_every == 0 or ep == epochs - 1:
            model.eval()
            with torch.no_grad():
                preds = np.concatenate([
                    model(x_all[i:i + bs]).argmax(1).numpy()
                    for i in range(0, len(imgs), bs)])
            model.train()
            mious[ep + 1] = miou_of(preds, masks)
            print(f"  [ref {family}] epoch {ep + 1}: loss {losses[-1]:.4f} "
                  f"mIoU {mious[ep + 1]:.4f}", flush=True)
    return {"loss": losses, "miou": mious}


def run_ours(family, imgs, masks, epochs, bs, eval_every):
    import jax.numpy as jnp
    import optax
    from yolo_dual_tpu.losses import SemanticSegLoss
    from yolo_dual_tpu.models.model import SemanticSegModel
    from yolo_dual_tpu.train import Trainer
    size = imgs.shape[1]
    cfg = ROOT / "yolo_dual_tpu" / "configs" / "semantic" / FAMILIES[family]["ours"]
    model = SemanticSegModel(cfg)
    variables = model.init(imgsz=size)
    orders = batch_orders(len(imgs), bs, epochs)
    total_steps = epochs * len(orders[0])
    warmup = len(orders[0])

    def schedule(count):
        t = (count - warmup) / max(total_steps - warmup, 1)
        cos = LR0 * LRF + 0.5 * LR0 * (1 - LRF) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(count < warmup, LR0 * (count + 1) / warmup, cos)

    tx = optax.sgd(learning_rate=schedule, momentum=MOMENTUM)
    tr = Trainer(model, SemanticSegLoss(NC, flavor="dice"), tx, ema=None,
                 task="semantic")
    state = tr.init_state(variables)
    step_fn = tr.make_train_step(donate=False)
    eval_fn = tr.make_eval_step()
    losses, mious = [], {}
    for ep in range(epochs):
        ep_loss = []
        for sel in orders[ep]:
            state, m = step_fn(state, {"image": jnp.asarray(imgs[sel]),
                                       "mask": jnp.asarray(masks[sel].astype(np.int32))})
            ep_loss.append(float(np.asarray(m["items"])[0]))
        losses.append(float(np.mean(ep_loss)))
        if (ep + 1) % eval_every == 0 or ep == epochs - 1:
            preds = np.concatenate([
                np.asarray(eval_fn(state, {"image": jnp.asarray(imgs[i:i + bs])})).argmax(-1)
                for i in range(0, len(imgs), bs)])
            mious[ep + 1] = miou_of(preds, masks)
            print(f"  [ours {family}] epoch {ep + 1}: loss {losses[-1]:.4f} "
                  f"mIoU {mious[ep + 1]:.4f}", flush=True)
    return {"loss": losses, "miou": mious}


def run_family(family, epochs, bs, size, n, eval_every):
    from yolo_dual_tpu.data.tools import synthetic_camvid_arrays
    imgs, masks = synthetic_camvid_arrays(n=n, size=size)
    t0 = time.time()
    ours = run_ours(family, imgs, masks, epochs, bs, eval_every)
    t_ours = time.time() - t0
    t0 = time.time()
    try:
        ref = run_reference(family, imgs, masks, epochs, bs, eval_every)
        ref_error = None
    except (NotImplementedError, RuntimeError, MemoryError) as e:
        # reference-defect family (vgg16 / yolov9, see module docstring):
        # record ours-only + the defect instead of dying
        ref = {"loss": [], "miou": {}}
        ref_error = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"  [ref {family}] CANNOT RUN (reference defect): {ref_error}",
              flush=True)
    t_ref = time.time() - t0
    final_ep = epochs
    final = {"our_miou": ours["miou"][final_ep]}
    if ref_error is None:
        final.update(ref_miou=ref["miou"][final_ep],
                     gap=ours["miou"][final_ep] - ref["miou"][final_ep])
    res = {
        "family": family, "epochs": epochs, "imgsz": size, "bs": bs,
        "ref": ref, "ours": ours, "ref_error": ref_error, "final": final,
        "wall_s": {"ref": round(t_ref, 1), "ours": round(t_ours, 1)},
    }
    return res


def table(results):
    lines = ["| family | epoch | ref loss | our loss | ref mIoU | our mIoU |",
             "|---|---|---|---|---|---|"]
    for r in results:
        rm, om = r["ref"]["miou"], r["ours"]["miou"]
        for ep in sorted(int(k) for k in (rm or om)):
            rv = rm.get(ep, rm.get(str(ep)))
            ov = om.get(ep, om.get(str(ep)))
            rl = f"{r['ref']['loss'][ep - 1]:.4f}" if r["ref"]["loss"] else "—"
            rv_s = f"{rv:.4f}" if rv is not None else "—"
            lines.append(
                f"| {r['family']} | {ep} | {rl} "
                f"| {r['ours']['loss'][ep - 1]:.4f} "
                f"| {rv_s} | {ov:.4f} |")
        if r.get("ref_error"):
            lines.append(f"| {r['family']} | — | REFERENCE DEFECT: "
                         f"{r['ref_error']} | | | |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="resnet50",
                    help="resnet50|vgg16|yolov9|all")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--imgsz", type=int, default=96)
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--json", type=str, default="")
    opt = ap.parse_args()

    if opt.family == "all":
        # one subprocess per family: the reference scripts shadow each other's
        # module names (each dir has its own val_diceloss/utils siblings)
        results = []
        for fam in FAMILIES:
            out = Path(f"/tmp/parity_sem_{fam}.json")
            cmd = [sys.executable, __file__, "--family", fam,
                   "--epochs", str(opt.epochs), "--batch-size", str(opt.batch_size),
                   "--imgsz", str(opt.imgsz), "--n", str(opt.n),
                   "--eval-every", str(opt.eval_every), "--json", str(out)]
            print(f"=== {fam} ===", flush=True)
            proc = subprocess.run(cmd)
            if proc.returncode != 0:
                print(f"!!! {fam} failed rc={proc.returncode}; continuing", flush=True)
                continue
            results.append(json.loads(out.read_text()))
        print(table(results))
        if opt.json:
            Path(opt.json).write_text(json.dumps(results, indent=1))
        return

    res = run_family(opt.family, opt.epochs, opt.batch_size, opt.imgsz, opt.n,
                     opt.eval_every)
    print(table([res]))
    print(json.dumps(res["final"]))
    if opt.json:
        res["ref"]["miou"] = {str(k): v for k, v in res["ref"]["miou"].items()}
        res["ours"]["miou"] = {str(k): v for k, v in res["ours"]["miou"].items()}
        Path(opt.json).write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
