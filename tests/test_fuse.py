"""Conv+BN folding (BaseModel.fuse) parity: the fused model's inference
forward must equal the unfused one (BN affine is linear, so folding is exact
up to float rounding). Mirrors the reference's model.fuse() contract
(reference models/yolo.py fuse / utils/torch_utils.py fuse_conv_and_bn)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
CFG = ROOT / "yolo_dual_tpu" / "configs"


def _perturbed_stats(variables, rng):
    """Give BN running stats non-trivial values so folding is actually tested
    (fresh init has mean=0/var=1 which would fold to a no-op)."""
    def mutate(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "mean":
                    out[k] = jnp.asarray(rng.normal(0, 0.5, np.shape(v)).astype(np.float32))
                elif k == "var":
                    out[k] = jnp.asarray(rng.uniform(0.5, 2.0, np.shape(v)).astype(np.float32))
                else:
                    out[k] = mutate(v)
            return out
        return tree
    v = dict(variables)
    if "batch_stats" in v:
        v = {**v, "batch_stats": mutate(v["batch_stats"])}
    return v


@pytest.mark.parametrize("cfg,task", [
    ("segment/yolov5n-seg.yaml", "segment"),
    ("models/yolov5n.yaml", "detect"),
])
def test_fuse_forward_parity(cfg, task):
    from yolo_dual_tpu.models.model import build_model

    path = CFG / cfg
    if not path.exists():
        pytest.skip(f"no config {cfg}")
    model = build_model(str(path), task=task)
    variables = model.init(imgsz=128)
    variables = _perturbed_stats(variables, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))

    with jax.default_matmul_precision("highest"):  # CPU convs default to low precision
        ref = model.apply(variables, x, train=False)
        fused_model, fused_vars = model.fuse(variables)
        got = fused_model.apply(fused_vars, x, train=False)

    # BN params must be gone from every Conv ("bn" sibling of "conv"+kernel)
    def assert_no_conv_bn(p):
        if isinstance(p, dict):
            if "conv" in p and isinstance(p["conv"], dict) and "kernel" in p["conv"]:
                assert "bn" not in p
            for v in p.values():
                assert_no_conv_bn(v)
    assert_no_conv_bn(fused_vars["params"])

    ref_flat = jax.tree_util.tree_leaves(ref)
    got_flat = jax.tree_util.tree_leaves(got)
    assert len(ref_flat) == len(got_flat)
    for a, b in zip(ref_flat, got_flat):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-4)


def test_fuse_single_conv_exact():
    """One Conv+BN layer: the fold must be exact to float-rounding (1e-6)."""
    from yolo_dual_tpu.models.model import DetectionModel

    cfg = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [32, 3, 2]]],
        "head": [[[-1], 1, "Detect", ["nc", "anchors"]]],
    }
    model = DetectionModel(cfg)
    variables = model.init(imgsz=64)
    variables = _perturbed_stats(variables, np.random.default_rng(4))
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = model.apply(variables, x, train=False)
        fm, fv = model.fuse(variables)
        got = fm.apply(fv, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_fuse_keeps_nonconv_bn():
    """A graph with a standalone BottleneckCSP (shared post-concat BN) must
    keep that BN in batch_stats and still produce identical outputs."""
    from yolo_dual_tpu.models.model import DetectionModel

    cfg = {
        "nc": 4,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "BottleneckCSP", [16]],
        ],
        "head": [[[-1], 1, "Detect", ["nc", "anchors"]]],
    }
    model = DetectionModel(cfg)
    variables = model.init(imgsz=64)
    variables = _perturbed_stats(variables, np.random.default_rng(2))
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = model.apply(variables, x, train=False)
        fm, fv = model.fuse(variables)
        assert "batch_stats" in fv and fv["batch_stats"], "shared CSP BN should survive fusing"
        got = fm.apply(fv, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-4)


def test_blocked_stem_parity():
    """The space-to-depth blocked-stem rewrite (nn/blocked.py, fuse(blocked=
    True)) must reproduce the plain fused forward exactly up to float
    reassociation: the scattered kernels only add zero terms."""
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.nn import blocked

    model = SegmentationModel(CFG / "segment" / "yolov5n-seg.yaml")
    assert blocked.eligible(model.spec)
    variables = model.init(imgsz=64)
    variables = _perturbed_stats(variables, np.random.default_rng(4))
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        fm, fv = model.fuse(variables, blocked=False)
        bm, bv = model.fuse(variables, blocked=True)
        # rewritten layers carry the blocked shapes
        assert bv["params"]["model_0"]["conv"]["kernel"].shape[:2] == (8, 8)
        assert bm.spec.layers[3].kw()["k"] == 2
        ref = fm.apply(fv, x, train=False)
        got = bm.apply(bv, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-4)


def test_blocked_eligibility_guards():
    """Non-stem graphs must not be rewritten (auto mode falls back silently;
    forcing blocked=True raises)."""
    from yolo_dual_tpu.models.model import build_model
    from yolo_dual_tpu.nn import blocked

    model = build_model(str(CFG / "semantic" / "resnet18.yaml"))
    assert not blocked.eligible(model.spec)
    variables = model.init(imgsz=64)
    fm, fv = model.fuse(variables)  # auto: plain fuse, no error
    assert fm.spec.layers[0].name != "Conv" or fm.spec.layers[0].kw().get("k") != 8
    with pytest.raises(ValueError):
        model.fuse(variables, blocked=True)
