"""Tests for the smaller subsystems: AuxOTA head/config, parameterized
activations, hyperparameter evolution, dataset tools, export formats."""

from pathlib import Path

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


def test_semantic_confusion_get_metrics():
    """Accuracy/Class_Accuracy bundle mirrors reference test.py:436-464."""
    from yolo_dual_tpu.metrics.seg import SegmentationConfusionMatrix
    cm = SegmentationConfusionMatrix(3, ignore_index=None)
    pred = np.array([0, 0, 1, 2, 2, 2])
    gt = np.array([0, 1, 1, 2, 2, 0])
    cm.update(pred, gt)
    m = cm.get_metrics()
    assert abs(m["Accuracy"] - 4 / 6) < 1e-9
    # class 0: 2 gt pixels, 1 correct; class 1: 2 gt, 1 correct; class 2: 2 gt, 2 correct
    np.testing.assert_allclose(m["Class_Accuracy"], [0.5, 0.5, 1.0])
    assert 0.0 < m["mIoU"] < 1.0 and m["IoU"].shape == (3,)


def test_legend_strip_and_panel_names():
    from yolo_dual_tpu.utils.plots import legend_strip, semantic_panel
    names = ["sky", "road", "car"]
    strip = legend_strip(names, height=96, width=80)
    assert strip.shape == (96, 80, 3) and strip.dtype == np.uint8
    assert (strip != 255).any()  # something was drawn
    img = np.zeros((96, 96, 3), np.uint8)
    gt = np.zeros((96, 96), np.uint8)
    panel = semantic_panel(img, gt, gt, names=names)
    assert panel.shape == (96, 96 * 4 + 160, 3)  # 4 panels + default legend width


def test_semantic_predict_cli(tmp_path, rng):
    """semantic/predict.py end-to-end: masks + overlays + GT panels + metrics
    (reference test.py:468+ equivalent)."""
    import cv2
    import importlib.util
    img_dir = tmp_path / "imgs"
    json_dir = tmp_path / "jsons"
    img_dir.mkdir()
    json_dir.mkdir()
    from yolo_dual_tpu.data import mask_to_json
    for i in range(2):
        cv2.imwrite(str(img_dir / f"f{i}.png"),
                    rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8))
        cv2.imwrite(str(tmp_path / f"m{i}.png"),
                    rng.integers(0, 12, (48, 64)).astype(np.uint8))
        mask_to_json(tmp_path / f"m{i}.png", json_dir / f"f{i}.json")
    spec = importlib.util.spec_from_file_location(
        "semantic_predict", Path(__file__).resolve().parents[1] / "semantic" / "predict.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    metrics, save_dir = mod.run(cfg="resnet18.yaml", source=str(img_dir), imgsz=64,
                                gt_json_dir=str(json_dir), project=str(tmp_path / "runs"))
    for stem in ("f0", "f1"):
        for kind in ("mask", "overlay", "panel"):
            assert (save_dir / f"{stem}_{kind}.png").exists()
    assert set(metrics) == {"mIoU", "IoU", "Accuracy", "Class_Accuracy"}


def test_new_plot_helpers(tmp_path, rng):
    """plot_labels / imshow_cls / plot_lr_scheduler produce non-trivial files."""
    from yolo_dual_tpu.utils.plots import imshow_cls, plot_labels, plot_lr_scheduler
    labels = np.column_stack([rng.integers(0, 3, 50),
                              rng.uniform(0.2, 0.8, (50, 2)),
                              rng.uniform(0.05, 0.4, (50, 2))])
    f1 = plot_labels(labels, {0: "a", 1: "b", 2: "c"}, tmp_path)
    ims = rng.uniform(0, 255, (9, 32, 32, 3)).astype(np.uint8)
    f2 = imshow_cls(ims, labels=rng.integers(0, 3, 9), pred=rng.integers(0, 3, 9),
                    names=["a", "b", "c"], f=tmp_path / "cls.jpg")
    from yolo_dual_tpu.train import build_lr_schedule
    lr = build_lr_schedule(dict(lr0=0.01, lrf=0.1, warmup_epochs=1.0), 10, 20, True, "g0", 1)
    f3 = plot_lr_scheduler(lr, 200, tmp_path)
    for f in (f1, f2, f3):
        assert f.exists() and f.stat().st_size > 2000, f


def test_check_dataset_resolves_test_split(tmp_path):
    """--task test consumes data['test']; it must resolve against `path:`
    like train/val (advisor r2)."""
    import yaml
    from yolo_dual_tpu.utils.general import check_dataset
    (tmp_path / "images" / "test").mkdir(parents=True)
    dy = tmp_path / "d.yaml"
    dy.write_text(yaml.safe_dump(dict(path=str(tmp_path), train="images/test",
                                      val="images/test", test="images/test",
                                      names=["a"])))
    data = check_dataset(dy)
    for k in ("train", "val", "test"):
        assert data[k] == str(tmp_path / "images" / "test"), k


def test_check_dataset_download_hooks(tmp_path):
    """When val is missing, the data yaml's `download:` hook runs — bash
    command line or inline python with the resolved dict bound as `yaml`
    (reference utils/general.py:537-561)."""
    import yaml
    from yolo_dual_tpu.utils.general import check_dataset

    def data_yaml(name, hook=None):
        d = dict(path=str(tmp_path / name), train=f"images/{name}",
                 val=f"images/{name}", names=["a"])
        if hook:
            d["download"] = hook
        p = tmp_path / f"{name}.yaml"
        p.write_text(yaml.safe_dump(d))
        return p

    # bash hook synthesizes the split
    bash = data_yaml("b", hook=f"bash -c 'mkdir -p {tmp_path}/b/images/b'")
    assert Path(check_dataset(bash)["val"]).exists()

    # python hook sees the RESOLVED dict as `yaml`
    py = data_yaml("p", hook="Path(yaml['val']).mkdir(parents=True)")
    assert Path(check_dataset(py)["val"]).exists()

    # missing + no hook -> clear error; autodownload=False never runs the hook
    with pytest.raises(FileNotFoundError, match="no download"):
        check_dataset(data_yaml("n"))
    with pytest.raises(FileNotFoundError):
        check_dataset(data_yaml("o", hook="Path(yaml['val']).mkdir(parents=True)"),
                      autodownload=False)

    # a hook that runs but fails to produce the split is reported as such
    with pytest.raises(FileNotFoundError, match="still missing"):
        check_dataset(data_yaml("f", hook="pass"))

    # names-only consumers (predict) skip the split check entirely
    assert check_dataset(data_yaml("q"), require_splits=False)["nc"] == 1


def test_mixconv_sum_yaml_build():
    """MixConv2d and Sum are YAML-loadable (reference whitelist
    models/yolo.py:318 includes MixConv2d; Sum pairs multi-input rows)."""
    from yolo_dual_tpu.models.compiler import parse_config
    from yolo_dual_tpu.models.model import GraphModel

    cfg = dict(
        nc=2, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 13, 16, 30, 33, 23]],
        backbone=[
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "MixConv2d", [24, [1, 3], 1]],
            [-1, 1, "Conv", [24, 3, 1]],
            [[-1, 1], 1, "Sum", [2, True]],
        ],
        head=[[[3], 1, "Detect", ["nc", "anchors"]]],
    )
    spec = parse_config(cfg, ch=3)
    assert spec.layers[1].c2 == 24 and spec.layers[3].c2 == 24
    model = GraphModel(spec)
    x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
    v = jax.eval_shape(lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x)
    raw = jax.eval_shape(lambda vv, xx: model.apply(vv, xx, train=False, decode=False), v, x)
    assert raw[0].shape == (1, 3, 16, 16, 7)  # na=3, 16x16 grid, no=nc+5
    assert v["params"]["model_3"]["w"].shape == (1,)  # Sum gate param exists


def test_check_dataset_val_list(tmp_path):
    """val may be a LIST of paths in reference data YAMLs (resolved at
    reference utils/general.py:527-535, existence-checked with all())."""
    import yaml
    from yolo_dual_tpu.utils.general import check_dataset
    for sub in ("images/a", "images/b"):
        (tmp_path / sub).mkdir(parents=True)
    dy = tmp_path / "d.yaml"
    dy.write_text(yaml.safe_dump(dict(path=str(tmp_path), train="images/a",
                                      val=["images/a", "images/b"], names=["x"])))
    data = check_dataset(dy)
    assert data["val"] == [str(tmp_path / "images/a"), str(tmp_path / "images/b")]

    # one missing entry of the list -> clear error, no TypeError
    dy.write_text(yaml.safe_dump(dict(path=str(tmp_path), train="images/a",
                                      val=["images/a", "images/missing"], names=["x"])))
    with pytest.raises(FileNotFoundError, match="missing"):
        check_dataset(dy)


def test_mixconv_channel_sum_exact():
    """equal_ch=False rounding residual must land on a branch so the concat
    emits exactly c2 channels (advisor r2: independent np.round drifts, e.g.
    k=(1,3), c2=25 rounds to 22+2=24)."""
    import jax, jax.numpy as jnp
    from yolo_dual_tpu.nn.common import MixConv2d
    for k, c2 in [((1, 3), 25), ((1, 3, 5), 12), ((3, 5, 7), 10)]:
        m = MixConv2d(c2, k=k, s=1, equal_ch=False)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 16)))
        y = m.apply(v, jnp.ones((1, 8, 8, 16)))
        assert y.shape[-1] == c2, (k, c2, y.shape)
