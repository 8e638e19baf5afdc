"""Measure the train-path blocked stem (nn/blocked_train.py): model-only
fwd+bwd and the full train step, native vs blocked, bs16@640 bf16.
Loop-slope methodology (see bench.py docstring)."""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

CFG = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
BS, IMGSZ = 16, 640


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def slope(run, n1=2, n2=30, repeats=3):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def build(blocked: bool):
    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    model = SegmentationModel(CFG, dtype=jnp.bfloat16, blocked_stem=blocked)
    variables = model.init(imgsz=IMGSZ)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 80, 32, hyp,
                              overlap=True, pos_capacity=128)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1, steps_per_epoch=100)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment")
    return model, variables, tr


def batch():
    rng = np.random.default_rng(0)
    M = 32
    targets = np.zeros((BS, M, 5), np.float32)
    tmask = np.zeros((BS, M), bool)
    for b in range(BS):
        targets[b, :6, 0] = rng.integers(0, 80, 6)
        targets[b, :6, 1:3] = rng.uniform(0.2, 0.8, (6, 2))
        targets[b, :6, 3:5] = rng.uniform(0.05, 0.3, (6, 2))
        tmask[b, :6] = True
    masks = (rng.uniform(size=(BS, IMGSZ // 4, IMGSZ // 4)) < 0.05).astype(np.float32)
    imgs = rng.uniform(size=(BS, IMGSZ, IMGSZ, 3)).astype(np.float32)
    return {"img": jnp.asarray(imgs), "targets": jnp.asarray(targets),
            "tmask": jnp.asarray(tmask), "masks": jnp.asarray(masks)}


def main():
    b = batch()
    for blocked in (False, True):
        model, variables, tr = build(blocked)
        tag = "blocked" if blocked else "native "

        # model-only fwd+bwd: grad of sum of raw outputs
        def fb(params, x):
            def f(p):
                (levels, protos), _ = model.module.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]}, x,
                    train=True, mutable=["batch_stats"])
                return sum(jnp.sum(l.astype(jnp.float32)) for l in levels) + \
                    jnp.sum(protos.astype(jnp.float32))
            g = jax.grad(f)(params)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

        @jax.jit
        def loop_fb(n, params, x):
            def body(i, acc):
                return acc + fb(params, x + i * 1e-6)
            return jax.lax.fori_loop(0, n, body, 0.0)

        s = slope(lambda n: loop_fb(n, variables["params"], b["img"]))
        print(f"{tag} model fwd+bwd   {s*1000:8.2f} ms/iter  {BS/s:8.1f} img/s", flush=True)

        # full train step
        state = tr.init_state(variables)
        step = tr.make_train_step()

        @jax.jit
        def loop_step(n, state, bb):
            def body(i, st):
                st2, _ = step(st, bb)
                return st2
            return jax.lax.fori_loop(0, n, body, state).step

        s2 = slope(lambda n: loop_step(n, state, b))
        print(f"{tag} full train step {s2*1000:8.2f} ms/iter  {BS/s2:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
