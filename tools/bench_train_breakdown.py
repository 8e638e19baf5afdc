"""Stage-by-stage throughput breakdown of the TRAIN hot path on the current
default device: forward(train) → +loss → +grad → full step (+optimizer/EMA).
Loop-slope methodology (see bench.py docstring). Isolates where the train
img/s gap vs 3×-forward-FLOPs sits: BN train mode, the loss lattice, the
backward, or the optimizer/EMA tree traffic."""

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


def main():
    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    import os
    blocked = os.environ.get("BLOCKED_STEM", "1") == "1"
    model = SegmentationModel(CFG, dtype=jnp.bfloat16, blocked_stem=blocked)
    variables = model.init(imgsz=IMGSZ)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 80, 32, hyp,
                              overlap=True, pos_capacity=128)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1, steps_per_epoch=100)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment")
    state0 = tr.init_state(variables)

    rng = np.random.default_rng(0)
    M = 32
    targets = np.zeros((BS, M, 5), np.float32)
    tmask = np.zeros((BS, M), bool)
    for b in range(BS):
        targets[b, :6, 0] = rng.integers(0, 80, 6)
        targets[b, :6, 1:3] = rng.uniform(0.2, 0.8, (6, 2))
        targets[b, :6, 3:5] = rng.uniform(0.05, 0.3, (6, 2))
        tmask[b, :6] = True
    masks = rng.integers(0, 7, (BS, IMGSZ // 4, IMGSZ // 4)).astype(np.float32)
    batch = {"image": jnp.asarray(rng.uniform(0, 255, (BS, IMGSZ, IMGSZ, 3)).astype(np.float32)),
             "targets": jnp.asarray(targets), "tmask": jnp.asarray(tmask),
             "masks": jnp.asarray(masks)}

    x = batch["image"]

    @jax.jit
    def loop_fwd(variables, iters):
        def body(i, acc):
            xi = (x + i.astype(jnp.float32) * 1e-6)
            out, new_vars = model.module.apply(
                variables, xi / 255.0, train=True, decode=False,
                mutable=["batch_stats"])
            return acc + sum(l.astype(jnp.float32).mean()
                             for l in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def loop_fwd_loss(state, iters):
        def body(i, acc):
            b = dict(batch)
            b["image"] = batch["image"] + i.astype(jnp.float32) * 1e-6
            lv, (items, new_bs) = tr._forward_loss(state.params, state.batch_stats, b)
            return acc + lv
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def loop_grad(state, iters):
        def body(i, acc):
            b = dict(batch)
            b["image"] = batch["image"] + i.astype(jnp.float32) * 1e-6

            def loss_fn(params):
                return tr._forward_loss(params, state.batch_stats, b)
            (lv, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return acc + lv + jax.tree_util.tree_reduce(
                lambda a, g: a + g.astype(jnp.float32).mean(), grads, jnp.float32(0.0))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    step = tr.make_train_step(donate=False)

    @jax.jit
    def loop_step(state, iters):
        def body(i, carry):
            state, acc = carry
            b = dict(batch)
            b["image"] = batch["image"] + i.astype(jnp.float32) * 1e-6
            state, m = step(state, b)
            return state, acc + m["loss"]
        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0.0)))
        return acc

    cases = (
        ("fwd(train=True)", lambda n: loop_fwd(variables, n)),
        ("fwd+loss", lambda n: loop_fwd_loss(state0, n)),
        ("fwd+loss+grad", lambda n: loop_grad(state0, n)),
        ("full step (+opt/EMA)", lambda n: loop_step(state0, n)),
    )
    for name, run in cases:
        per = slope(run)
        print(f"{name:22s} {per * 1e3:8.2f} ms/iter  {BS / per:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
