"""Tests for the smaller subsystems: AuxOTA head/config, parameterized
activations, hyperparameter evolution, dataset tools, export formats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_auxota_config_builds():
    from test_model_zoo import CFG
    from yolo_dual_tpu.models.compiler import parse_config
    from yolo_dual_tpu.models.model import GraphModel, _probe_strides
    from yolo_dual_tpu.utils.general import yaml_load

    d = yaml_load(CFG / "loss" / "yolov5n_auxota.yaml")
    spec = parse_config(d, ch=3)
    spec = _probe_strides(spec)
    assert spec.layers[-1].name == "DetectAux"
    assert spec.strides == (8, 16, 32)
    model = GraphModel(spec)
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    v = jax.eval_shape(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x)
    raw = jax.eval_shape(lambda vv, xx: model.apply(vv, xx, train=False, decode=False), v, x)
    assert len(raw) == 6  # 3 lead + 3 aux levels
    pred, raw2 = jax.eval_shape(lambda vv, xx: model.apply(vv, xx, train=False, decode=True), v, x)
    assert pred.shape[2] == 2 + 5  # nc=2


def test_act_modules_run(rng):
    from yolo_dual_tpu.nn.act_modules import AconC, FReLU, MetaAconC
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    for mod in (FReLU(), AconC(), MetaAconC()):
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_evolve_roundtrip(tmp_path):
    from yolo_dual_tpu.utils.evolve import META, mutate, print_mutation
    hyp = {k: (lo + hi) / 2 for k, (s, lo, hi) in META.items()}
    print_mutation([], [], hyp, tmp_path, fitness_value=0.5)
    print_mutation([], [], {**hyp, "lr0": 0.02}, tmp_path, fitness_value=0.7)
    child = mutate(hyp, tmp_path / "evolve.csv", seed=0)
    for k, (s, lo, hi) in META.items():
        assert lo <= child[k] <= hi, k
    assert any(abs(child[k] - hyp[k]) > 1e-9 for k in child)


def test_autosplit_and_stats(tmp_path, rng):
    import cv2
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(6):
        cv2.imwrite(str(tmp_path / "images" / f"i{i}.jpg"),
                    rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        (tmp_path / "labels" / f"i{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n1 0.3 0.3 0.1 0.1")
    from yolo_dual_tpu.data.tools import autosplit, dataset_stats
    files = autosplit(tmp_path / "images", weights=(0.5, 0.5, 0.0), seed=0)
    total = sum(len(f.read_text().strip().splitlines()) for f in files if f.exists())
    assert total == 6
    stats = dataset_stats(str(tmp_path / "images"), imgsz=32)
    assert stats["images"] == 6 and stats["instances"] == 12


def test_export_formats_table():
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "export_cli", Path(__file__).resolve().parents[1] / "export.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fmts = mod.export_formats()
    assert any(row[1] == "torchpt" for row in fmts)
    assert any(row[1] == "savedmodel" for row in fmts)
