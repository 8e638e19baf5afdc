"""Bisect the train-throughput regression: full train step (bench.py's
bench_train) with blocked_stem on/off. Loop-slope methodology, small n2 to
keep wall-clock down; run stages sequentially on the one real chip."""

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


def bench(blocked_stem: bool):
    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    model = SegmentationModel(CFG, dtype=jnp.bfloat16, blocked_stem=blocked_stem)
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

    def one_step(state, i):
        b = dict(batch)
        b["image"] = batch["image"] + i.astype(jnp.float32) * 1e-6

        def loss_fn(params):
            return tr._forward_loss(params, state.batch_stats, b)

        (lv, (items, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax
        updates, opt_state = tr.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = tr.ema.update(state.ema, {"params": params, "batch_stats": new_bs})
        return state.replace(params=params, batch_stats=new_bs, opt_state=opt_state,
                             ema=ema, step=state.step + 1), lv

    @jax.jit
    def loop(state, iters):
        def body(i, carry):
            state, acc = carry
            state, lv = one_step(state, i)
            return state, acc + lv
        state, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.zeros(())))
        return acc

    per = slope(lambda n: loop(state0, n), 2, 30)
    print(f"blocked_stem={blocked_stem}: {per * 1e3:.1f} ms/iter = {BS / per:.0f} img/s",
          flush=True)
    return BS / per


if __name__ == "__main__":
    for flag in (False, True):
        bench(flag)
