"""END-TO-END train throughput: real data pipeline feeding the real device
step CONCURRENTLY (VERDICT r3 next-#3: "BENCH stops measuring a fed-by-magic
step").

Through this box's high-latency tunnel, per-step host dispatch costs ~0.8 s
regardless of work, so a naive loader->step loop times the tunnel, not the
pipeline (BASELINE.md "Tunnel methodology"). What CAN be measured honestly:

  1. device step rate  — loop-slope inside one dispatch (bench.py method)
  2. host loader rate WHILE the device loop runs — the host produces batches
     on its own core(s) concurrently with the device's work, which is
     exactly the steady-state producer/consumer overlap of a real trainer
  3. the end-to-end bottleneck: min(device, host x cores)

On a 1-core build box the host side is the bottleneck by construction; the
JSON therefore reports `cores_to_feed` — how many loader cores a production
host needs before the TPU step rate becomes the binding constraint — for
both the host-everything pipeline and the --device-aug split (host does
decode+geometry only; mosaic/warp/HSV run on-device, kernels/augment.py).

Run on the real TPU:  python tools/bench_e2e_train.py [--n 96] [--bs 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

sys.path.insert(0, str(ROOT / "tools"))
from bench_loader import HYP, make_dataset  # noqa: E402


def device_step_runner(bs, imgsz):
    """Returns (run_fn, state) where run_fn(n) executes n train steps in ONE
    dispatch (bench.py bench_train's loop)."""
    import os

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        # jax falls back to CPU SILENTLY when the single-client TPU relay is
        # held (r4: a dying predecessor held it; this bench then burned 50
        # CPU-minutes executing the 640px train loop on Eigen). Fail fast.
        raise SystemExit("TPU backend unavailable (default_backend=cpu); "
                         "relay busy? Set BENCH_ALLOW_CPU=1 to force.")

    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0,
               fl_gamma=0.0)
    cfg = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
    model = SegmentationModel(cfg, dtype=jnp.bfloat16, blocked_stem=True, fused_bn=True)
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
        # inline step math (bench.py bench_train / bench_remat structure —
        # a nested jitted make_train_step inside the fori body compiles
        # pathologically slowly on this box's 1-core client)
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
            st, acc = carry
            st, lv = one_step(st, i)
            return st, acc + lv
        return jax.lax.fori_loop(0, iters, body, (state, jnp.zeros(())))[1]

    def run(n):
        return np.asarray(loop(state0, n))

    return run


def host_rate_during(loader, stop_event):
    """Drain the loader until stop_event; returns images/sec produced."""
    n = 0
    t0 = time.perf_counter()
    while not stop_event.is_set():
        got = 0
        for b in loader:
            got += 1
            n += b["image" if "image" in b else "aug_tiles"].shape[0]
            if stop_event.is_set():
                break
        if not got:  # empty loader: don't spin until the device run ends
            raise RuntimeError("loader yielded zero batches")
    return n / max(time.perf_counter() - t0, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=60,
                    help="device steps per overlap window")
    args = ap.parse_args()
    from yolo_dual_tpu.data import create_dataloader

    out = {}
    run = device_step_runner(args.bs, args.imgsz)
    run(2)  # compile
    t1 = min(_t(run, 2) for _ in range(3))
    t2 = min(_t(run, args.iters) for _ in range(3))
    dev_ips = args.bs * (args.iters - 2) / (t2 - t1)
    out["device_img_s"] = round(dev_ips, 1)

    with tempfile.TemporaryDirectory() as td:
        img_dir = make_dataset(Path(td), args.n)
        for label, dev_aug in (("host_all", False), ("device_aug", True)):
            # RAM image cache + one full warm epoch: the steady-state
            # (epoch 2+) producer rate is the one that feeds a real run
            loader, _ = create_dataloader(str(img_dir), args.imgsz, args.bs, hyp=HYP,
                                          augment=True, mask_downsample_ratio=4,
                                          overlap_mask=True, task="segment",
                                          shuffle=True, device_aug=dev_aug,
                                          cache_images="ram")
            for _b in loader:  # warm label + image caches (epoch 1)
                pass
            stop = threading.Event()
            res = {}

            def _drain():
                try:
                    res["r"] = host_rate_during(loader, stop)
                except BaseException as e:  # surfaced after join, with context
                    res["err"] = e

            th = threading.Thread(target=_drain)
            th.start()
            # device runs concurrently with the host producer (steady-state
            # overlap); min 2 windows so the host thread sees a full cycle
            run(args.iters)
            run(args.iters)
            stop.set()
            th.join()
            if "err" in res:
                raise RuntimeError(f"host drain thread failed ({label})") from res["err"]
            host_ips = res["r"]
            out[f"host_img_s_concurrent[{label}]"] = round(host_ips, 1)
            out[f"cores_to_feed[{label}]"] = int(np.ceil(dev_ips / max(host_ips, 1e-9)))
            out[f"e2e_img_s_1core[{label}]"] = round(min(dev_ips, host_ips), 1)
    print(json.dumps(out))


def _t(fn, n):
    t0 = time.perf_counter()
    fn(n)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
