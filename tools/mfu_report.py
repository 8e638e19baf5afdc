"""Roofline accounting for the compiled train/inference steps (VERDICT r2 #2:
"kernel-level analysis proving the conv MFU wall").

Uses XLA's own cost analysis of the lowered executables (flops + bytes
accessed) together with the measured loop-slope step times (docs/ROADMAP.md)
to place each step on the v5e roofline: achieved TFLOP/s vs 197 peak bf16,
achieved GB/s vs 819 peak HBM, arithmetic intensity vs the ridge point
(197e12/819e9 = 241 FLOP/byte), and the speed-of-light time each roof alone
would allow.

Run: python tools/mfu_report.py [--measured-train-ms 28.15]
     [--measured-infer-ms 13.99]
(defaults = the 2026-08-19 v5e measurements: tools/bench_fused_bn.py bs16
fused_bn=True 28.15 ms; bench.py bs32 fused inference 2288 img/s -> 13.99 ms)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

V5E_PEAK_TFLOPS = 197.0    # bf16
V5E_PEAK_GBS = 819.0       # HBM


def report(name, cost, measured_ms, batch):
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    t = measured_ms / 1e3
    tflops = flops / t / 1e12
    gbs = bytes_ / t / 1e9
    ai = flops / max(bytes_, 1.0)
    ridge = V5E_PEAK_TFLOPS * 1e12 / (V5E_PEAK_GBS * 1e9)
    t_c = flops / (V5E_PEAK_TFLOPS * 1e12)
    t_b = bytes_ / (V5E_PEAK_GBS * 1e9)
    print(f"\n== {name} (bs={batch}, measured {measured_ms:.2f} ms/iter) ==")
    print(f"  XLA cost analysis: {flops/1e9:.1f} GFLOP, {bytes_/1e9:.2f} GB accessed")
    print(f"  achieved: {tflops:.1f} TFLOP/s = {100*tflops/V5E_PEAK_TFLOPS:.1f}% of bf16 peak")
    print(f"  achieved: {gbs:.0f} GB/s = {100*gbs/V5E_PEAK_GBS:.1f}% of HBM peak")
    print(f"  arithmetic intensity {ai:.0f} FLOP/byte (ridge {ridge:.0f})"
          f" -> {'compute' if ai > ridge else 'bandwidth'}-side of roofline")
    print(f"  speed-of-light: compute-only {t_c*1e3:.2f} ms, bandwidth-only "
          f"{t_b*1e3:.2f} ms, max {max(t_c, t_b)*1e3:.2f} ms "
          f"-> measured = {measured_ms/(max(t_c, t_b)*1e3):.2f}x SoL")


def _cost(lowered_compiled):
    c = lowered_compiled.cost_analysis()
    return c[0] if isinstance(c, (list, tuple)) else c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured-train-ms", type=float, default=28.15)
    ap.add_argument("--measured-infer-ms", type=float, default=13.99)
    ap.add_argument("--train-bs", type=int, default=16)
    ap.add_argument("--infer-bs", type=int, default=32)
    a = ap.parse_args()

    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4,
               warmup_epochs=0.0, box=0.05, cls=0.5, obj=1.0, anchor_t=4.0,
               cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    cfg = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
    rng = np.random.default_rng(0)
    bs, imgsz = a.train_bs, 640

    # --- train step (exact setup of tools/bench_fused_bn.py fused_bn=True) ---
    model = SegmentationModel(cfg, dtype=jnp.bfloat16, blocked_stem=True,
                              fused_bn=True)
    variables = model.init(imgsz=imgsz)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 80, 32,
                              hyp, overlap=True, pos_capacity=128)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1,
                         steps_per_epoch=100)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment")
    state = tr.init_state(variables)
    M = 32
    targets = np.zeros((bs, M, 5), np.float32)
    tmask = np.zeros((bs, M), bool)
    targets[:, :6, 0] = rng.integers(0, 80, (bs, 6))
    targets[:, :6, 1:3] = rng.uniform(0.2, 0.8, (bs, 6, 2))
    targets[:, :6, 3:5] = rng.uniform(0.05, 0.3, (bs, 6, 2))
    tmask[:, :6] = True
    batch = {"image": jnp.asarray(rng.uniform(0, 255, (bs, imgsz, imgsz, 3)).astype(np.float32)),
             "targets": jnp.asarray(targets), "tmask": jnp.asarray(tmask),
             "masks": jnp.asarray(rng.integers(0, 7, (bs, imgsz // 4, imgsz // 4)).astype(np.float32))}
    step = tr.make_train_step()
    report("train step (fwd+loss+bwd+SGD+EMA, fused BN)",
           _cost(step.lower(state, batch).compile()),
           a.measured_train_ms, bs)

    # --- fused inference forward (mirrors bench.py bench_infer) ---
    mi = SegmentationModel(cfg, dtype=jnp.bfloat16, blocked_stem=True)
    vi = mi.init(imgsz=imgsz)
    fused, vf = mi.fuse(vi)
    x = jnp.asarray(rng.uniform(0, 1, (a.infer_bs, imgsz, imgsz, 3)).astype(np.float32))

    def fwd(xx):
        return fused.apply(vf, xx, train=False, decode=False)

    report("fused inference forward (raw heads)",
           _cost(jax.jit(fwd).lower(x).compile()),
           a.measured_infer_ms, a.infer_bs)


if __name__ == "__main__":
    main()
