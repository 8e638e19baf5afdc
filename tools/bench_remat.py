"""Train-step throughput ± per-layer remat on the real TPU.

The roofline accounting (tools/mfu_report.py, docs/ROADMAP.md) showed the
train step is HBM-bound (AI 57 vs ridge 241) with ~4x spare MXU compute, so
trading recompute FLOPs for saved-activation bytes should win: with
``remat_layers=True`` every compute layer is wrapped in ``nn.remat`` — only
layer-boundary tensors survive to the backward; C3/Conv internals (BN stats,
bottleneck intermediates) are recomputed and can fuse into the backward in
VMEM instead of round-tripping HBM. Loop-slope methodology (bench.py
docstring).

Run: python tools/bench_remat.py [imgsz] [bs ...]
"""

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp


def _timed(fn, *a):
    t0 = time.perf_counter()
    np.asarray(fn(*a))
    return time.perf_counter() - t0


def _slope(run, n1=2, n2=30, repeats=4):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def bench(remat, bs=16, imgsz=640):
    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    cfg = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
    model = SegmentationModel(cfg, dtype=jnp.bfloat16, blocked_stem=True,
                              fused_bn=True, remat_layers=remat)
    variables = model.init(imgsz=imgsz)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 80, 32, hyp,
                              overlap=True, pos_capacity=128)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1, steps_per_epoch=100)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment")
    state0 = tr.init_state(variables)

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

    per_iter = _slope(lambda n: loop(state0, n))
    return per_iter * 1e3, bs / per_iter


def main():
    imgsz = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    sizes = [int(a) for a in sys.argv[2:]] or [16, 32]
    print(f"device: {jax.devices()[0]}  imgsz={imgsz}  (fused_bn=True, blocked_stem=True)")
    # 'early' = selective remat of the large-activation stem/P3 layers only
    # (yolov5s-seg layers 0-4: 320^2..80^2 maps) — all-layers remat measured
    # SLOWER (recompute + fusion barriers outweigh bytes), this probes
    # whether the byte-heavy prefix alone wins.
    modes = {"none": False, "all": True, "early": (0, 1, 2, 3, 4)}
    for bs in sizes:
        for label, remat in modes.items():
            ms, ips = bench(remat, bs, imgsz)
            print(f"bs={bs} remat={label}: {ms:.2f} ms/iter = {ips:.1f} img/s")


if __name__ == "__main__":
    main()
