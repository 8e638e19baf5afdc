"""Model-zoo build smoke tests (the analog of reference `models/yolo.py --test`,
models/yolo.py:409-414): compile every config, shape-probe it, and check output
shapes — all via jax.eval_shape, so no FLOPs are spent."""

from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from yolo_dual_tpu.models.compiler import parse_config
from yolo_dual_tpu.models.model import GraphModel, _probe_strides, build_model
from yolo_dual_tpu.utils.general import yaml_load

CFG = Path(__file__).resolve().parents[1] / "yolo_dual_tpu" / "configs"

ZOO = sorted(
    list((CFG / "models").glob("*.yaml"))
    + list((CFG / "segment").glob("*.yaml"))
    + list((CFG / "hub").glob("yolo*.yaml"))
    + list((CFG / "spp").glob("*.yaml"))
    + list((CFG / "attention").glob("*.yaml"))
    + list((CFG / "backbone").glob("*.yaml"))
    + list((CFG / "semantic").glob("*.yaml"))
)


def _shape_probe(cfg_path, imgsz=64):
    d = yaml_load(cfg_path)
    spec = parse_config(d, ch=3)
    spec = _probe_strides(spec)
    model = GraphModel(spec)
    x = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
    variables = jax.eval_shape(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x)
    out = jax.eval_shape(lambda v, xx: model.apply(v, xx, train=False), variables, x)
    return spec, out


@pytest.mark.parametrize("cfg", ZOO, ids=lambda p: str(p.relative_to(CFG)))
def test_zoo_builds(cfg):
    try:
        spec, out = _shape_probe(cfg, imgsz=128)
    except KeyError as e:
        if "not registered" in str(e):
            pytest.skip(f"module not yet implemented: {e}")
        raise
    head = spec.layers[-1].name
    if head in ("Detect", "Segment"):
        assert spec.strides, cfg
        assert all(s in (4, 8, 16, 32, 64, 128) for s in spec.strides), spec.strides
    else:
        # semantic: dense per-pixel output
        assert out.shape[-1] == spec.nc


def test_detect_decode_shapes():
    spec, out = _shape_probe(CFG / "models" / "yolov5n.yaml", imgsz=128)
    assert spec.strides == (8, 16, 32)
    pred, raw = out
    n = sum((128 // s) ** 2 * 3 for s in spec.strides)
    assert pred.shape == (1, n, 85)
    assert [r.shape for r in raw] == [(1, 3, 128 // s, 128 // s, 85) for s in spec.strides]


def test_segment_decode_shapes():
    spec, out = _shape_probe(CFG / "segment" / "yolov5n-seg.yaml", imgsz=128)
    pred, protos, raw = out
    assert pred.shape[-1] == 80 + 5 + 32
    assert protos.shape == (1, 32, 32, 32)  # 128/8*2 = 32 spatial, 32 protos


def test_semantic_resnet50_shapes():
    # graph output is /2 resolution; the SemanticSegModel wrapper resizes to input
    m = build_model(CFG / "semantic" / "resnet50.yaml")
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(lambda xx: m.module.init(jax.random.PRNGKey(0), xx, train=False), x)
    out = jax.eval_shape(lambda v, xx: m.apply(v, xx, train=False), variables, x)
    assert out.shape == (1, 64, 64, 12)


def test_classification_from_detection():
    m = build_model(CFG / "models" / "yolov5n.yaml", task="classify", nc=10)
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(lambda xx: m.module.init(jax.random.PRNGKey(0), xx, train=False), x)
    out = jax.eval_shape(lambda v, xx: m.module.apply(v, xx, train=False), variables, x)
    assert out.shape == (1, 10)
