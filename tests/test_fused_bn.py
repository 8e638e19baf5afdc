"""FusedBatchNorm (custom-VJP train BN, nn/common.py): value, gradient and
running-stat parity with flax nn.BatchNorm, plus model-level equivalence
through a real train step. The hand-written backward is the closed form
    dx = scale·rstd · (g − mean(g) − x̂·mean(g·x̂))
so at f32 it must match autodiff to float tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from yolo_dual_tpu.nn.common import FusedBatchNorm


def _data(rng, shape=(4, 8, 8, 16)):
    return jnp.asarray(rng.normal(1.5, 2.0, shape).astype(np.float32))


def test_fused_bn_matches_flax_f32(rng):
    x = _data(rng)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.97, epsilon=1e-3,
                       dtype=jnp.float32)
    ours = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.float32)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_ours = ours.init(jax.random.PRNGKey(0), x)
    # same param/stat tree (checkpoint + torch-import compatibility)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_ours)
    # randomize scale/bias so the scale-chain in the backward is exercised
    v = jax.tree_util.tree_map(lambda a: a, v_ref)
    v["params"] = {"scale": jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32),
                   "bias": jnp.asarray(rng.normal(0, 1, 16), jnp.float32)}

    def f_ref(params, xx):
        y, upd = ref.apply({"params": params, "batch_stats": v["batch_stats"]},
                           xx, mutable=["batch_stats"])
        return (y * jnp.cos(y)).sum(), (y, upd)

    def f_ours(params, xx):
        y, upd = ours.apply({"params": params, "batch_stats": v["batch_stats"]},
                            xx, mutable=["batch_stats"])
        return (y * jnp.cos(y)).sum(), (y, upd)

    (l1, (y1, u1)), g1 = jax.value_and_grad(f_ref, argnums=(0, 1), has_aux=True)(
        v["params"], x)
    (l2, (y2, u2)), g2 = jax.value_and_grad(f_ours, argnums=(0, 1), has_aux=True)(
        v["params"], x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4, rtol=1e-3)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(u2["batch_stats"][k]),
                                   np.asarray(u1["batch_stats"][k]), atol=2e-5)


def test_fused_bn_bf16_close_to_f32(rng):
    x = _data(rng)
    f32 = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.float32)
    b16 = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.bfloat16)
    v = f32.init(jax.random.PRNGKey(0), x)
    y32, _ = f32.apply(v, x, mutable=["batch_stats"])
    y16, _ = b16.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               atol=0.05)


def test_model_level_fused_bn_grads_match(rng):
    """Same tiny segment model ± fused_bn (f32): train-step loss and grads
    must agree — proves the flag only changes the BACKWARD IMPLEMENTATION,
    not the math, across Conv/C3/SPPF/Segment and the blocked stem."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_torch_parity import tiny_cfg
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.nn.common import fused_bn_vjp  # noqa: F401

    cfg = tiny_cfg(True)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    models = {}
    for fused in (False, True):
        m = SegmentationModel(cfg, nc=4, fused_bn=fused)
        v = m.init(imgsz=64, bias_prior=False)
        models[fused] = (m, v)
    v0 = models[False][1]

    outs = {}
    for fused, (m, _) in models.items():
        def loss(params):
            (levels, protos), upd = m.module.apply(
                {"params": params, "batch_stats": v0["batch_stats"]}, x,
                train=True, decode=False, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.sin(lv)) for lv in levels) + jnp.sum(protos ** 2)
        # fused_bn uses bf16 normalize by default; force f32 for exactness
        from yolo_dual_tpu.nn import common as C
        old = C._BN_CTX.get("fused_dtype")
        C._BN_CTX["fused_dtype"] = jnp.float32
        try:
            l, g = jax.value_and_grad(loss)(v0["params"])
        finally:
            C._BN_CTX["fused_dtype"] = old
        outs[fused] = (float(l), g)
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5)
    la, lb = (jax.tree_util.tree_leaves(outs[False][1]),
              jax.tree_util.tree_leaves(outs[True][1]))
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=2e-3)


def test_fused_bn_silu_matches_separate_f32(rng):
    """_bn_silu (BN+SiLU folded into one VJP, recompute-in-backward) must
    match silu(FusedBatchNorm(x)) in value AND gradients at f32 to float
    tolerance — only the residual-stashing strategy differs."""
    x = _data(rng)
    sep = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.float32)
    fold = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.float32,
                          act_fold="silu")
    v = sep.init(jax.random.PRNGKey(0), x)
    v["params"] = {"scale": jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32),
                   "bias": jnp.asarray(rng.normal(0, 1, 16), jnp.float32)}

    def f_sep(params, xx):
        y, upd = sep.apply({"params": params, "batch_stats": v["batch_stats"]},
                           xx, mutable=["batch_stats"])
        y = y * jax.nn.sigmoid(y)
        return (y * jnp.cos(y)).sum(), (y, upd)

    def f_fold(params, xx):
        y, upd = fold.apply({"params": params, "batch_stats": v["batch_stats"]},
                            xx, mutable=["batch_stats"])
        return (y * jnp.cos(y)).sum(), (y, upd)

    (l1, (y1, u1)), g1 = jax.value_and_grad(f_sep, argnums=(0, 1), has_aux=True)(
        v["params"], x)
    (l2, (y2, u2)), g2 = jax.value_and_grad(f_fold, argnums=(0, 1), has_aux=True)(
        v["params"], x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(u2["batch_stats"]["mean"]),
                               np.asarray(u1["batch_stats"]["mean"]), rtol=1e-6)


def test_model_level_fused_bn_act_grads_match(rng):
    """fused_bn_act=True through a real model: same loss and same grads as
    fused_bn alone (f32), so the lever is a pure residual-strategy change."""
    from yolo_dual_tpu.models.model import SegmentationModel
    cfg = dict(
        nc=3, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                 [116, 90, 156, 198, 373, 326]],
        backbone=[[-1, 1, "Conv", [8, 6, 2, 2]], [-1, 1, "Conv", [16, 3, 2]],
                  [-1, 1, "C3", [16]], [-1, 1, "Conv", [16, 3, 2]],
                  [-1, 1, "Conv", [16, 3, 2]], [-1, 1, "SPPF", [16, 5]]],
        head=[[[2, 3, 5], 1, "Segment", ["nc", "anchors", 4, 8]]],
    )
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))

    def run(**kw):
        m = SegmentationModel(cfg, fused_bn=True, **kw)
        v = m.init(imgsz=64)

        def loss(params):
            (raw, protos), upd = m.module.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, decode=False, mutable=["batch_stats"])
            return sum(jnp.sum(r * jnp.sin(r)) for r in raw) + jnp.sum(protos ** 2)

        return jax.value_and_grad(loss)(v["params"])

    l1, g1 = run()
    l2, g2 = run(fused_bn_act=True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3)


def test_fused_bn_relu_matches_separate_f32(rng):
    """_bn_relu (BN+ReLU folded, recompute-in-backward) == relu(bn(x)) in
    value and grads at f32."""
    x = _data(rng)
    sep = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.float32)
    fold = FusedBatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.float32,
                          act_fold="relu")
    v = sep.init(jax.random.PRNGKey(0), x)
    v["params"] = {"scale": jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32),
                   "bias": jnp.asarray(rng.normal(0, 1, 16), jnp.float32)}

    def f(mod, post):
        def inner(params, xx):
            y, upd = mod.apply({"params": params, "batch_stats": v["batch_stats"]},
                               xx, mutable=["batch_stats"])
            y = post(y)
            return (y * jnp.cos(y)).sum(), y
        return inner

    (l1, y1), g1 = jax.value_and_grad(f(sep, lambda y: jnp.maximum(y, 0)),
                                      argnums=(0, 1), has_aux=True)(v["params"], x)
    (l2, y2), g2 = jax.value_and_grad(f(fold, lambda y: y),
                                      argnums=(0, 1), has_aux=True)(v["params"], x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4)
