"""Multi-HOST dry run: N separate processes (jax.distributed), each with its
own set of virtual CPU devices, jointly compile and run ONE data-parallel
training step over the global mesh.

This validates what the single-process 8-device dryrun cannot: distributed
initialization, per-host data sharding (Loader shards indices by
jax.process_index()), assembling per-host batches into global arrays, and the
cross-host gradient all-reduce XLA emits. It is the CPU-emulation analog of a
2-host ICI/DCN slice (SURVEY §2.4 multi-host strategy; reference counterpart:
classify/train.py:313 dist.init_process_group).

Usage:
    python tools/multihost_dryrun.py               # parent: spawns 2 procs
    python tools/multihost_dryrun.py --nproc 2 --devices-per-proc 4
"""

import argparse
import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def parent(nproc: int, devices_per_proc: int, timeout: int) -> None:
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform_device_count")]
        env["XLA_FLAGS"] = " ".join(
            flags + [f"--xla_force_host_platform_device_count={devices_per_proc}"])
        env.pop("PALLAS_AXON_POOL_IPS", None)  # never contend for the TPU relay
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(Path(__file__).resolve()), "--child",
             f"--coordinator=127.0.0.1:{port}", f"--nproc={nproc}",
             f"--process-id={pid}", f"--devices-per-proc={devices_per_proc}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        outs.append(out)
        rc |= p.returncode if p.returncode is not None else 1
        sys.stdout.write(f"--- process {pid} (rc={p.returncode}) ---\n{out[-2500:]}\n")
    losses = [l.split("loss=")[1].split()[0]
              for o in outs for l in o.splitlines() if "loss=" in l]
    if rc == 0 and len(losses) == nproc and len(set(losses)) == 1:
        print(f"multihost_dryrun OK: {nproc} hosts x {devices_per_proc} devices, "
              f"identical global loss {losses[0]}")
    else:
        print(f"multihost_dryrun FAILED (rc={rc}, losses={losses})")
        sys.exit(1)


def child(coordinator: str, nproc: int, process_id: int, devices_per_proc: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=process_id)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * devices_per_proc, (
        jax.device_count(), nproc, devices_per_proc)

    import jax.numpy as jnp
    import numpy as np

    from yolo_dual_tpu.losses import ComputeSegmentLoss
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.parallel import make_mesh, shard_batch
    from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

    cfg = dict(
        nc=3, depth_multiple=0.33, width_multiple=0.125,
        anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                 [116, 90, 156, 198, 373, 326]],
        backbone=[
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]], [-1, 1, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]], [-1, 1, "C3", [512]],
            [-1, 1, "Conv", [1024, 3, 2]], [-1, 1, "C3", [1024]], [-1, 1, "SPPF", [1024, 5]],
        ],
        head=[
            [-1, 1, "Conv", [512, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [256, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [-1, 1, "Conv", [256, 3, 2]], [[-1, 14], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [512, 3, 2]], [[-1, 10], 1, "Concat", [1]], [-1, 1, "C3", [1024, False]],
            [[17, 20, 23], 1, "Segment", ["nc", "anchors", 8, 32]],
        ],
    )
    hyp = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.0,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0,
               fl_gamma=0.0)
    model = SegmentationModel(cfg)
    imgsz = 64
    variables = model.init(imgsz=imgsz)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], cfg["nc"],
                              head_kw["nm"], hyp, overlap=True)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1, steps_per_epoch=1)
    mesh = make_mesh(nproc * devices_per_proc)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment", mesh=mesh)
    state = tr.init_state(variables)
    step = tr.make_train_step(donate=False)

    # per-HOST batch: each process holds only its shard (what Loader's
    # process_index()-strided sharding produces); the SAME global batch is
    # reconstructed by seeding per-row and slicing this host's rows
    global_bs = 2 * nproc * devices_per_proc
    local_rows = range(process_id * global_bs // nproc,
                       (process_id + 1) * global_bs // nproc)
    M = 8
    imgs, tgts, tms, msks = [], [], [], []
    for r in local_rows:
        rng = np.random.default_rng(1000 + r)
        imgs.append(rng.uniform(0, 255, (imgsz, imgsz, 3)).astype(np.uint8))
        t = np.zeros((M, 5), np.float32)
        t[0] = [1, 0.5, 0.5, 0.4, 0.4]
        tgts.append(t)
        tm = np.zeros((M,), bool)
        tm[0] = True
        tms.append(tm)
        mk = np.zeros((imgsz // 4, imgsz // 4), np.float32)
        mk[4:12, 4:12] = 1.0
        msks.append(mk)
    batch = shard_batch({
        "image": np.stack(imgs), "targets": np.stack(tgts),
        "tmask": np.stack(tms), "masks": np.stack(msks),
    }, mesh, global_batch=True)
    state, metrics = step(state, batch)
    loss_val = float(np.asarray(jax.block_until_ready(metrics["loss"])))
    assert np.isfinite(loss_val)
    print(f"process {process_id}: train step OK, loss={loss_val:.6f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=900)
    a = ap.parse_args()
    if a.child:
        child(a.coordinator, a.nproc, a.process_id, a.devices_per_proc)
    else:
        parent(a.nproc, a.devices_per_proc, a.timeout)
