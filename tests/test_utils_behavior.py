"""Behavioral tests for the auto-tuning / observability / ensemble utilities
(VERDICT r1 weak #5: these were import-smoke tested only).

- autoanchor: BPR math + kmeans/genetic evolution on a synthetic label set
  (reference utils/autoanchor.py:17-169)
- autobatch: memory-fit batch picking via compiled-graph memory analysis
  (reference utils/autobatch.py:18-72)
- Loggers: CSV rows + TensorBoard event file actually written
  (reference utils/loggers/__init__.py)
- Ensemble: multi-checkpoint cat/mean merge (reference models/experimental.py:71-111)
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ANCHORS3 = np.array([[[10, 13], [16, 30], [33, 23]],
                     [[30, 61], [62, 45], [59, 119]],
                     [[116, 90], [156, 198], [373, 326]]], np.float32)


def _synthetic_labels(rng, n_imgs=40, per_img=6, wh_range=(0.05, 0.6)):
    shapes = np.full((n_imgs, 2), 480)
    labels = []
    for _ in range(n_imgs):
        wh = rng.uniform(*wh_range, size=(per_img, 2)).astype(np.float32)
        xy = rng.uniform(0.3, 0.7, size=(per_img, 2)).astype(np.float32)
        cls = np.zeros((per_img, 1), np.float32)
        labels.append(np.concatenate([cls, xy, wh], 1))
    return shapes, labels


def test_check_anchors_good_fit_keeps(rng):
    from yolo_dual_tpu.utils.autoanchor import check_anchors
    shapes, labels = _synthetic_labels(rng)
    np.random.seed(0)
    bpr, new = check_anchors(shapes, labels, ANCHORS3, stride=[8, 16, 32], imgsz=640)
    assert bpr > 0.98 and new is None


def test_check_anchors_bad_fit_evolves(rng):
    from yolo_dual_tpu.utils.autoanchor import anchor_fitness, check_anchors
    shapes, labels = _synthetic_labels(rng, wh_range=(0.5, 0.95))
    bad = ANCHORS3 / 40.0  # absurdly small anchors for huge boxes
    np.random.seed(0)
    bpr, new = check_anchors(shapes, labels, bad, stride=[8, 16, 32], imgsz=640)
    assert bpr < 0.98
    assert new is not None and new.shape == bad.shape
    # evolved anchors must beat the bad ones on the dataset's wh distribution
    sc = 640 * shapes / shapes.max(1, keepdims=True)
    wh = np.concatenate([l[:, 3:5] * s for s, l in zip(sc, labels)])
    assert anchor_fitness(new.reshape(-1, 2), wh, 1 / 4.0) > \
        anchor_fitness(bad.reshape(-1, 2), wh, 1 / 4.0)


def test_kmean_anchors_sorted_and_sized(rng):
    from yolo_dual_tpu.utils.autoanchor import kmean_anchors
    wh = rng.uniform(4, 300, size=(500, 2)).astype(np.float32)
    k = kmean_anchors(wh, n=9, gen=50, seed=0)
    assert k.shape == (9, 2)
    areas = k.prod(1)
    assert (np.diff(areas) >= 0).all()  # sorted by area
    assert (k >= 2.0).all()


def test_autobatch_returns_fitting_batch():
    from yolo_dual_tpu.models.model import SemanticSegModel
    from yolo_dual_tpu.utils.autobatch import autobatch
    cfg = dict(nc=3, backbone=[[-1, 1, "Conv", [8, 3, 2]]],
               head=[[-1, 1, "Conv", [3, 1, 1]]])
    m = SemanticSegModel(cfg)
    v = m.init(imgsz=32)
    bs = autobatch(m, v, imgsz=32, candidates=(1, 2, 4))
    assert bs in (1, 2, 4)


def test_loggers_write_csv_and_tb(tmp_path):
    from yolo_dual_tpu.utils.loggers import Loggers
    lg = Loggers(tmp_path, include=("csv", "tb"))
    lg.log_metrics({"train/loss": 1.5, "metrics/mAP50": 0.2}, step=0)
    lg.log_metrics({"train/loss": 1.2, "metrics/mAP50": 0.3}, step=1)
    lg.log_images("mosaic", np.zeros((32, 32, 3), np.uint8), step=0)
    lg.close()
    csvs = list(Path(tmp_path).glob("*.csv"))
    assert csvs, "results csv missing"
    lines = csvs[0].read_text().strip().splitlines()
    assert len(lines) == 3 and "train/loss" in lines[0]
    events = list(Path(tmp_path).rglob("events.out.tfevents.*"))
    if events:  # TB gated on tensorflow being importable
        assert events[0].stat().st_size > 0


def test_ensemble_cat_and_mean(tmp_path, rng):
    from test_predictor import _tiny_seg_model
    from yolo_dual_tpu.io.ensemble import Ensemble
    model, v1 = _tiny_seg_model()
    v2 = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.asarray(rng.standard_normal(np.shape(x)), np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, v1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    p1, pr1, _ = model.module.apply(v1, x, train=False)
    p2, _, _ = model.module.apply(v2, x, train=False)

    ens = Ensemble(model, [v1, v2], mode="cat")
    pc, prc = ens(x)
    assert pc.shape[1] == p1.shape[1] + p2.shape[1]
    np.testing.assert_allclose(np.asarray(pc[:, :p1.shape[1]]), np.asarray(p1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prc), np.asarray(pr1), rtol=1e-5, atol=1e-5)

    ens_m = Ensemble(model, [v1, v2], mode="mean")
    pm, _ = ens_m(x)
    np.testing.assert_allclose(np.asarray(pm), (np.asarray(p1) + np.asarray(p2)) / 2,
                               rtol=1e-5, atol=1e-5)


def test_attempt_load_single_and_ensemble(tmp_path):
    from test_predictor import _tiny_seg_model
    from yolo_dual_tpu.io.ensemble import attempt_load, Ensemble
    from yolo_dual_tpu.train import save_checkpoint
    model, v = _tiny_seg_model()
    cfg = model.yaml
    save_checkpoint(tmp_path / "w1", {"variables": v, "ema": None})
    save_checkpoint(tmp_path / "w2", {"variables": v, "ema": None})
    m, vv = attempt_load(tmp_path / "w1", cfg, nc=2, imgsz=64)
    assert vv["params"]
    ens = attempt_load([tmp_path / "w1", tmp_path / "w2"], cfg, nc=2, imgsz=64)
    assert isinstance(ens, Ensemble) and len(ens.variables_list) == 2


def test_prune_sparsity():
    """prune() zeroes the smallest |w| per conv kernel and reports sparsity
    (reference utils/torch_utils.py prune/sparsity)."""
    import numpy as np
    from yolo_dual_tpu.utils.prune import prune, sparsity

    rng = np.random.default_rng(0)
    params = {"model_0": {"conv": {"kernel": rng.normal(0, 1, (3, 3, 8, 16)).astype(np.float32),
                                   "bias": rng.normal(0, 1, 16).astype(np.float32)},
                          "bn": {"scale": np.ones(16, np.float32)}}}
    pruned, sp = prune(params, amount=0.3)
    k = pruned["model_0"]["conv"]["kernel"]
    frac = (np.asarray(k) == 0).mean()
    assert 0.25 <= frac <= 0.35
    # bias and bn untouched
    assert (pruned["model_0"]["conv"]["bias"] != 0).all()
    assert sparsity(pruned) > 0.2
    # surviving weights are the largest-magnitude ones
    orig = params["model_0"]["conv"]["kernel"]
    kept_min = np.abs(np.asarray(k)[np.asarray(k) != 0]).min()
    dropped_max = np.abs(orig[np.asarray(k) == 0]).max()
    assert kept_min >= dropped_max


def test_select_device_cpu_pins_platform():
    """--device cpu parity (reference utils/torch_utils.py select_device):
    "cpu" pins jax_platforms via config.update (wins over env/site hooks);
    ordinal/empty device strings leave backend selection alone."""
    import jax

    from yolo_dual_tpu.utils.general import select_device

    before = jax.config.jax_platforms
    select_device("")        # no-op
    select_device("0,1")     # ordinals: JAX owns placement, no-op
    assert jax.config.jax_platforms == before
    select_device("CPU")
    assert jax.config.jax_platforms == "cpu"
    assert jax.devices()[0].platform == "cpu"


def test_labels_to_weights_vs_reference():
    """labels_to_class_weights / labels_to_image_weights oracle parity
    (reference utils/general.py:714-738)."""
    import sys
    ref = Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference checkout unavailable")
    if str(ref) not in sys.path:
        sys.path.insert(0, str(ref))
    from yolo_dual_tpu.utils.general import (labels_to_class_weights,
                                             labels_to_image_weights)
    rng = np.random.default_rng(3)
    nc = 5
    labels = [np.column_stack([rng.integers(0, nc, k), rng.uniform(0, 1, (k, 4))])
              .astype(np.float32) for k in (3, 0, 7, 1)]
    # hand-evaluated reference formulas (utils/general.py:714-738); the
    # reference module itself needs pkg_resources, absent from this image
    counts = np.bincount(np.concatenate([l[:, 0] for l in labels]).astype(int),
                         minlength=nc).astype(np.float64)
    counts[counts == 0] = 1
    exp_cw = (1 / counts) / (1 / counts).sum()
    ours_cw = labels_to_class_weights(labels, nc)
    np.testing.assert_allclose(ours_cw, exp_cw, rtol=1e-6)
    per_img = np.stack([np.bincount(l[:, 0].astype(int), minlength=nc)
                        if len(l) else np.zeros(nc) for l in labels])
    exp_iw = (exp_cw.reshape(1, nc) * per_img).sum(1)
    ours_iw = labels_to_image_weights(labels, nc, ours_cw)
    np.testing.assert_allclose(ours_iw, exp_iw, rtol=1e-6)


def test_freeze_layers_blocks_updates():
    import jax
    import jax.numpy as jnp
    import optax

    from yolo_dual_tpu.train import freeze_layers, smart_optimizer
    params = {"model_0": {"conv": {"kernel": jnp.ones((3, 3, 2, 4))}},
              "model_1": {"conv": {"kernel": jnp.ones((1, 1, 4, 4))}},
              "model_2": {"bn": {"scale": jnp.ones((4,))}}}
    hyp = dict(lr0=0.1, lrf=0.1, momentum=0.9, weight_decay=1e-2, warmup_epochs=0.0)
    tx = freeze_layers(smart_optimizer(params, "SGD", hyp), params, [2])  # freeze 0,1
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # two steps: the lr schedule warms from 0 at step 0 (reference warmup)
    updates, state = tx.update(grads, state, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.allclose(new["model_0"]["conv"]["kernel"], 1.0)
    assert np.allclose(new["model_1"]["conv"]["kernel"], 1.0)
    assert not np.allclose(new["model_2"]["bn"]["scale"], 1.0)

    # explicit index list freezes exactly those layers
    tx2 = freeze_layers(smart_optimizer(params, "SGD", hyp), params, [0, 2])
    st2 = tx2.init(params)
    updates2, st2 = tx2.update(grads, st2, params)
    updates2, _ = tx2.update(grads, st2, params)
    new2 = optax.apply_updates(params, updates2)
    assert np.allclose(new2["model_0"]["conv"]["kernel"], 1.0)
    assert not np.allclose(new2["model_1"]["conv"]["kernel"], 1.0)
    assert np.allclose(new2["model_2"]["bn"]["scale"], 1.0)

    # repeated layers are named model_{i}_{r}: freezing keys on the LAYER
    # index i, never the repeat index r (regression: rsplit parsed r)
    params3 = {"model_0": {"conv": {"kernel": jnp.ones((3, 3, 2, 4))}},
               "model_1_0": {"conv": {"kernel": jnp.ones((1, 1, 4, 4))}},
               "model_1_7": {"conv": {"kernel": jnp.ones((1, 1, 4, 4))}},
               "model_2_0": {"bn": {"scale": jnp.ones((4,))}}}
    tx3 = freeze_layers(smart_optimizer(params3, "SGD", hyp), params3, [2])  # freeze 0,1
    st3 = tx3.init(params3)
    grads3 = jax.tree_util.tree_map(jnp.ones_like, params3)
    updates3, st3 = tx3.update(grads3, st3, params3)
    updates3, _ = tx3.update(grads3, st3, params3)
    new3 = optax.apply_updates(params3, updates3)
    assert np.allclose(new3["model_1_0"]["conv"]["kernel"], 1.0)
    assert np.allclose(new3["model_1_7"]["conv"]["kernel"], 1.0)  # repeat 7 of layer 1 IS frozen
    assert not np.allclose(new3["model_2_0"]["bn"]["scale"], 1.0)  # layer 2 trains


def test_loader_sample_weights_resampling():
    from yolo_dual_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.float32(i)}

    loader = Loader(DS(), batch_size=5, shuffle=True, seed=0,
                    num_shards=1, shard_index=0)
    # heavily weight index 7
    w = np.ones(10)
    w[7] = 1e6
    loader.sample_weights = w
    loader.set_epoch(0)
    idx = loader._indices()
    assert len(idx) == 10
    assert sum(1 for i in idx if i == 7) >= 8  # resampled with replacement
    # deterministic per epoch
    assert idx == loader._indices()
    loader.set_epoch(1)
    assert idx != loader._indices() or True  # different epoch may differ
    loader.sample_weights = None
    assert sorted(loader._indices()) == list(range(10))


def test_check_anchors_nonsquare_orientation():
    """(h, w) dataset shapes x (w, h) normalized labels: the per-axis pixel
    scale must not invert box aspect on non-square images (advisor r2)."""
    from yolo_dual_tpu.utils.autoanchor import check_anchors
    shapes = np.array([[320, 640]] * 40)          # (h, w): wide images
    # wide boxes: normalized (w=0.5, h=0.25) -> pixels (320, 80)
    labels = [np.array([[0, 0.5, 0.5, 0.5, 0.25]], np.float32) for _ in range(40)]
    anchors = np.array([[[320, 80]]], np.float32)  # exact (w, h) pixel match
    np.random.seed(0)
    bpr, new = check_anchors(shapes, labels, anchors, stride=[8], thr=1.25, imgsz=640)
    assert bpr == 1.0, f"aspect inverted: bpr={bpr}"
    assert new is None
