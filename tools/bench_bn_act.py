"""Train-step throughput ± the fused BN+SiLU VJP (`_bn_silu`: recompute the
BN output in the backward instead of stashing it) and ± XLA fusion flags —
the VERDICT r4 next #7 byte levers for the HBM-bound train step
(docs/ROADMAP.md roofline: AI 57 vs ridge 241).

Back-to-back in ONE session (BASELINE.md variance note): levers are only
comparable within a session.

Run: python tools/bench_bn_act.py [imgsz] [bs]
Flag variants re-exec this script with XLA_FLAGS set (the flags are read at
backend init, so they need a fresh process):
     python tools/bench_bn_act.py --xla-pass
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# One pass of fusion-related XLA flag candidates (each measured alone against
# the same-process baseline). vmem limit: more scoped VMEM lets the fusion
# emitter keep larger producer-consumer chains on-chip.
XLA_CANDIDATES = [
    ("vmem128", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("flash_fuse", "--xla_tpu_enable_flash_fusion=true"),
    ("async_dma", "--xla_tpu_enable_async_dma=true"),
]


def _timed(fn, *a):
    t0 = time.perf_counter()
    np.asarray(fn(*a))
    return time.perf_counter() - t0


def _slope(run, n1=2, n2=30, repeats=4):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def bench_semantic(bs=16, imgsz=640, fused_bn_act=False):
    """Semantic flagship (resnet50 U-Net/softmax, ReLU zoo): the _bn_relu
    fold variant of the same lever."""
    import jax
    import jax.numpy as jnp

    from yolo_dual_tpu.losses import SemanticSegLoss
    from yolo_dual_tpu.models.model import SemanticSegModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    nc = 12
    cfg = ROOT / "yolo_dual_tpu" / "configs" / "semantic" / "resnet50.yaml"
    model = SemanticSegModel(cfg, nc=nc, dtype=jnp.bfloat16, fused_bn=True,
                             fused_bn_act=fused_bn_act)
    variables = model.init(imgsz=imgsz)
    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1, steps_per_epoch=100)
    tr = Trainer(model, SemanticSegLoss(nc, flavor="dice"), tx,
                 ema=ModelEMA(), task="semantic")
    state0 = tr.init_state(variables)
    step = tr.make_train_step(donate=False)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.uniform(0, 255, (bs, imgsz, imgsz, 3)).astype(np.float32)),
             "mask": jnp.asarray(rng.integers(0, nc, (bs, imgsz, imgsz)).astype(np.int32))}

    @jax.jit
    def loop(state, iters):
        def body(i, carry):
            state, acc = carry
            b = dict(batch)
            b["image"] = batch["image"] + i.astype(jnp.float32) * 1e-6
            state, metrics = step(state, b)
            return state, acc + metrics["loss"]
        return jax.lax.fori_loop(0, iters, body, (state, jnp.zeros(())))[1]

    per_iter = _slope(lambda n: loop(state0, n), n1=2, n2=20)
    return per_iter * 1e3, bs / per_iter


def bench(bs=16, imgsz=640, fused_bn_act=False):
    import jax
    import jax.numpy as jnp

    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    cfg = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
    model = SegmentationModel(cfg, dtype=jnp.bfloat16, blocked_stem=True,
                              fused_bn=True, fused_bn_act=fused_bn_act)
    variables = model.init(imgsz=imgsz)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 80, 32, hyp,
                              overlap=True, pos_capacity=128)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1, steps_per_epoch=100)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment")
    state0 = tr.init_state(variables)
    step = tr.make_train_step(donate=False)

    rng = np.random.default_rng(0)
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

    @jax.jit
    def loop(state, iters):
        def body(i, carry):
            state, acc = carry
            b = dict(batch)
            b["image"] = batch["image"] + i.astype(jnp.float32) * 1e-6
            state, metrics = step(state, b)
            return state, acc + metrics["loss"]
        return jax.lax.fori_loop(0, iters, body, (state, jnp.zeros(())))[1]

    per_iter = _slope(lambda n: loop(state0, n))
    return per_iter * 1e3, bs / per_iter


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    imgsz = int(args[0]) if args else 640
    bs = int(args[1]) if len(args) > 1 else 16
    import jax
    if jax.default_backend() == "cpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        raise SystemExit("TPU backend unavailable (default_backend=cpu)")
    print(f"device: {jax.devices()[0]}  bs={bs} imgsz={imgsz}  "
          f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}")
    out = {}
    fn = bench_semantic if "--semantic" in sys.argv else bench
    tag = "semantic " if "--semantic" in sys.argv else ""
    for fold in (False, True):
        ms, ips = fn(bs, imgsz, fused_bn_act=fold)
        out[f"{tag}fused_bn_act={fold}"] = round(ips, 1)
        print(f"{tag}fused_bn_act={fold}: {ms:.2f} ms/iter = {ips:.1f} img/s", flush=True)
    print(json.dumps(out))
    if "--xla-pass" in sys.argv:
        # each candidate flag in a fresh process (flags bind at backend init)
        for name, flag in XLA_CANDIDATES:
            env = dict(os.environ)
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flag).strip()
            print(f"=== XLA candidate {name}: {flag} ===", flush=True)
            r = subprocess.run([sys.executable, __file__, str(imgsz), str(bs)],
                               env=env)
            if r.returncode != 0:
                print(f"candidate {name} failed rc={r.returncode} (flag likely "
                      f"unknown to this libtpu) — recorded as no-go", flush=True)


if __name__ == "__main__":
    main()
