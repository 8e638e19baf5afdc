"""Blocked (space-to-depth) TRAIN stem (nn/blocked_train.py): exact
equivalence with the native graph on parameters, forward, batch statistics,
and gradients. Reference provenance for the rewritten layers:
models/common.py:47-64 (Conv), :161-172 (C3) in /root/reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dual_tpu.models.model import SegmentationModel

CFG = "yolo_dual_tpu/configs/segment/yolov5n-seg.yaml"


@pytest.fixture(scope="module")
def pair():
    mn = SegmentationModel(CFG)
    mb = SegmentationModel(CFG, blocked_stem=True)
    assert mb.blocked_stem
    vn = mn.init(imgsz=64)
    vb = mb.init(imgsz=64)
    return mn, mb, vn, vb


def _paths(tree):
    return [(jax.tree_util.keystr(p), np.shape(a))
            for p, a in jax.tree_util.tree_leaves_with_path(tree)]


def test_param_tree_identical(pair):
    """Same paths, shapes, AND init values (paths drive flax init RNG), so
    checkpoints/EMA/optimizer state are interchangeable between graphs."""
    _, _, vn, vb = pair
    assert _paths(vn["params"]) == _paths(vb["params"])
    assert _paths(vn["batch_stats"]) == _paths(vb["batch_stats"])
    for (pn, an), (pb, ab) in zip(
            jax.tree_util.tree_leaves_with_path(vn["params"]),
            jax.tree_util.tree_leaves_with_path(vb["params"])):
        np.testing.assert_allclose(np.asarray(an), np.asarray(ab), err_msg=str(pn))


def test_forward_and_stats_equivalent(pair):
    mn, mb, vn, _ = pair
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32))
    # eval-mode forward
    on = mn.apply(vn, x, train=False)
    ob = mb.apply(vn, x, train=False)   # NATIVE variables through blocked graph
    np.testing.assert_allclose(np.asarray(on[0]), np.asarray(ob[0]), atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(on[1]), np.asarray(ob[1]), atol=5e-4, rtol=2e-3)
    # train-mode forward + running-stat update (Segment@train: ([levels], protos))
    (o1, u1) = mn.apply(vn, x, train=True, mutable=["batch_stats"])
    (o2, u2) = mb.apply(vn, x, train=True, mutable=["batch_stats"])
    for a, b in zip(o1[0], o2[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3)
    for (p1, a1), (p2, a2) in zip(
            jax.tree_util.tree_leaves_with_path(u1["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(u2["batch_stats"])):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-5,
                                   rtol=1e-5, err_msg=str(p1))


def test_gradients_equivalent(pair):
    """Kernel gradients flow back through the in-jit scatter and match the
    native graph's — training through the blocked stem is the same descent."""
    mn, mb, vn, _ = pair
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 64, 3)).astype(np.float32))

    def loss(model):
        def f(params):
            (levels, protos), _ = model.module.apply(
                {"params": params, "batch_stats": vn["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(jnp.mean(l.astype(jnp.float32) ** 2) for l in levels) + \
                jnp.mean(protos.astype(jnp.float32) ** 2)
        return f

    gn = jax.grad(loss(mn))(vn["params"])
    gb = jax.grad(loss(mb))(vn["params"])
    for (p1, a1), (p2, a2) in zip(
            jax.tree_util.tree_leaves_with_path(gn),
            jax.tree_util.tree_leaves_with_path(gb)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=5e-4,
                                   rtol=1e-3, err_msg=str(p1))
