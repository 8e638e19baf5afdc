"""Training-engine tests: a tiny semantic model must fit noise labels with the
full engine (optimizer groups, warmup schedules, EMA, accumulation), both
single-device and data-parallel over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_dual_tpu.losses import SemanticSegLoss, ComputeSegmentLoss
from yolo_dual_tpu.models.model import SemanticSegModel, SegmentationModel
from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer

TINY_SEM = dict(
    nc=3, compiler="semantic", activation="relu",
    backbone=[[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
    head=[[-1, 1, "Upsample", [None, 4, "nearest"]], [-1, 1, "Conv", [3, 1, 1]]],
)


def _make_batch(rng, bs=8, hw=32, nc=3):
    img = rng.uniform(0, 1, (bs, hw, hw, 3)).astype(np.float32)
    mask = (img[..., 0] * nc).astype(np.int32) % nc  # learnable from channel 0
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask)}


def test_semantic_training_loss_decreases(rng):
    model = SemanticSegModel(TINY_SEM)
    variables = model.init(imgsz=32)
    tx = smart_optimizer(variables["params"], "SGD",
                         {"lr0": 0.5, "lrf": 1.0, "warmup_epochs": 0.0, "momentum": 0.9},
                         epochs=10, steps_per_epoch=10)
    tr = Trainer(model, SemanticSegLoss(3), tx, ema=ModelEMA(decay=0.99, tau=10), task="semantic")
    state = tr.init_state(variables)
    step = tr.make_train_step(donate=False)
    batch = _make_batch(rng)
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05 and all(np.isfinite(losses)), losses
    assert int(state.ema["updates"]) == 12
    # EMA differs from raw params but stays close after decay ramp
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema["ema"]["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))


def test_semantic_training_data_parallel_matches_single(rng):
    """DP over the 8-device mesh must produce the same trajectory as a single
    device (SyncBN semantics: sharded batch stats are global either way).
    Both runs use the same (CPU) backend so this compares sharding, not
    cross-backend numerics."""
    import jax as _jax
    from jax.sharding import Mesh
    from yolo_dual_tpu.parallel import shard_batch

    def cpu_mesh(n):
        devs = _jax.devices("cpu")
        if len(devs) < n:
            pytest.skip(f"CPU backend has {len(devs)} devices; need {n}")
        return Mesh(np.asarray(devs[:n]), ("data",))

    model = SemanticSegModel(TINY_SEM)
    variables = model.init(imgsz=32)
    hyp = {"lr0": 0.1, "lrf": 1.0, "warmup_epochs": 0.0, "momentum": 0.9}

    def run(mesh):
        tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=5, steps_per_epoch=5)
        tr = Trainer(model, SemanticSegLoss(3), tx, ema=None, task="semantic", mesh=mesh)
        state = tr.init_state(jax.tree_util.tree_map(jnp.array, variables))
        step = tr.make_train_step(donate=False)
        batch = _make_batch(np.random.default_rng(7))
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        out = []
        for _ in range(4):
            state, m = step(state, batch)
            out.append(float(m["loss"]))
        return out

    single = run(cpu_mesh(1))
    multi = run(cpu_mesh(8))
    np.testing.assert_allclose(single, multi, rtol=1e-4)


def test_grad_accumulation_changes_update_cadence(rng):
    model = SemanticSegModel(TINY_SEM)
    variables = model.init(imgsz=32)
    hyp = {"lr0": 0.1, "lrf": 1.0, "warmup_epochs": 0.0, "momentum": 0.9}
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=5, steps_per_epoch=5,
                         accumulate=2)
    tr = Trainer(model, SemanticSegLoss(3), tx, ema=None, task="semantic")
    state = tr.init_state(variables)
    step = tr.make_train_step(donate=False)
    batch = _make_batch(rng)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, _ = step(state, batch)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: no update yet
    state, _ = step(state, batch)
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.array_equal(p1, p2)      # second micro-step applies


TINY_SEG = dict(
    nc=3, depth_multiple=1.0, width_multiple=1.0,
    anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
    backbone=[
        [-1, 1, "Conv", [8, 6, 2, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [-1, 1, "Conv", [24, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    head=[[[3, 4], 1, "Segment", ["nc", "anchors", 4, 8]]],
)


def test_segment_train_step_runs_and_is_finite(rng):
    model = SegmentationModel(TINY_SEG)
    variables = model.init(imgsz=64)
    hyp = dict(lr0=0.01, lrf=1.0, warmup_epochs=0.0, momentum=0.9, box=0.05,
               cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 3, 4, hyp, overlap=True)
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=3, steps_per_epoch=3)
    tr = Trainer(model, loss, tx, ema=ModelEMA(), task="segment")
    state = tr.init_state(variables)
    step = tr.make_train_step(donate=False)

    bs, M = 2, 4
    targets = np.zeros((bs, M, 5), np.float32)
    tmask = np.zeros((bs, M), bool)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.4]
    tmask[:, 0] = True
    masks = np.zeros((bs, 16, 16), np.float32)
    masks[:, 4:12, 4:12] = 1.0
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (bs, 64, 64, 3)).astype(np.float32)),
        "targets": jnp.asarray(targets), "tmask": jnp.asarray(tmask),
        "masks": jnp.asarray(masks),
    }
    l0 = None
    for _ in range(3):
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) <= l0 * 1.5


def test_segment_train_2d_mesh_matches_1d(rng):
    """Spatial partitioning (2-D data×space mesh, image H sharded) must give
    the same training trajectory as plain data parallelism — XLA inserts the
    conv halo exchanges; BN stats stay global (reductions over sharded axes
    are auto all-reduced). This is the dense-vision analog of sequence
    parallelism (SURVEY §2.4)."""
    from jax.sharding import Mesh
    from yolo_dual_tpu.parallel import shard_batch
    from yolo_dual_tpu.parallel.mesh import make_mesh_2d

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")

    model = SegmentationModel(TINY_SEG)
    variables = model.init(imgsz=64)
    hyp = dict(lr0=0.01, lrf=1.0, warmup_epochs=0.0, momentum=0.9, box=0.05,
               cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 3, 4, hyp, overlap=True)

    bs, M = 8, 4
    r = np.random.default_rng(11)
    targets = np.zeros((bs, M, 5), np.float32)
    tmask = np.zeros((bs, M), bool)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.4]
    tmask[:, 0] = True
    masks = np.zeros((bs, 16, 16), np.float32)
    masks[:, 4:12, 4:12] = 1.0
    base_batch = {
        "image": r.uniform(0, 1, (bs, 64, 64, 3)).astype(np.float32),
        "targets": targets, "tmask": tmask, "masks": masks,
    }

    def run(mesh):
        tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=3, steps_per_epoch=3)
        tr = Trainer(model, loss, tx, ema=None, task="segment", mesh=mesh)
        state = tr.init_state(jax.tree_util.tree_map(jnp.array, variables))
        step = tr.make_train_step(donate=False)
        batch = shard_batch({k: jnp.asarray(v) for k, v in base_batch.items()}, mesh)
        out = []
        for _ in range(3):
            state, m = step(state, batch)
            out.append(float(m["loss"]))
        return out

    one_d = run(Mesh(np.asarray(devs[:8]), ("data",)))
    two_d = run(make_mesh_2d(4, 2))
    np.testing.assert_allclose(one_d, two_d, rtol=2e-4)


def test_multihost_two_process_dryrun():
    """TRUE multi-process data parallelism: 2 jax.distributed processes x 2
    virtual CPU devices assemble per-host batches into global arrays
    (shard_batch global_batch=True) and agree on the global loss.
    (SURVEY §2.4 multi-host strategy; tools/multihost_dryrun.py)"""
    import subprocess
    import sys
    from pathlib import Path
    tool = Path(__file__).resolve().parents[1] / "tools" / "multihost_dryrun.py"
    r = subprocess.run([sys.executable, str(tool), "--nproc", "2",
                        "--devices-per-proc", "2", "--timeout", "600"],
                       capture_output=True, text=True, timeout=700)
    assert r.returncode == 0, r.stdout[-3000:]
    assert "multihost_dryrun OK" in r.stdout
