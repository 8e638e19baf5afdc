"""IO round trips: torch export -> import identity; orbax checkpoint
save/load/strip; autoanchor evolution."""

import numpy as np
import pytest

import jax


def test_torch_export_import_roundtrip():
    """export_torch_state_dict ∘ import_torch_state_dict == identity."""
    from yolo_dual_tpu.io import import_torch_state_dict
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train.checkpoint import export_torch_state_dict

    cfg = dict(
        nc=2, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
        backbone=[[-1, 1, "Conv", [8, 6, 2, 2]], [-1, 1, "Conv", [16, 3, 2]],
                  [-1, 1, "C3", [16]], [-1, 1, "Conv", [24, 3, 2]],
                  [-1, 1, "SPPF", [24, 5]]],
        head=[[[3, 4], 1, "Segment", ["nc", "anchors", 4, 8]]],
    )
    m = SegmentationModel(cfg)
    v = m.init(imgsz=64)
    sd = export_torch_state_dict(v, m.spec)
    assert any(k.startswith("model.0.conv.weight") for k in sd)
    assert any("running_mean" in k for k in sd)
    v2 = m.init(jax.random.PRNGKey(7), imgsz=64)  # different init
    v2 = import_torch_state_dict(v2, sd, spec=m.spec, strict=True)
    flat1 = jax.tree_util.tree_leaves(v)
    flat2 = jax.tree_util.tree_leaves(v2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from yolo_dual_tpu.train import load_checkpoint, save_checkpoint, strip_optimizer
    state = {"variables": {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
             "ema": {"ema": {"params": {"w": np.ones((2, 3), np.float32)}}, "updates": np.int32(5)},
             "epoch": 3, "best_fitness": 0.5, "opt_state": {"mu": np.zeros(3, np.float32)}}
    p = tmp_path / "ckpt"
    save_checkpoint(p, state)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back["variables"]["params"]["w"],
                                  state["variables"]["params"]["w"])
    assert int(back["epoch"]) == 3
    strip_optimizer(p)
    stripped = load_checkpoint(p)
    assert stripped["opt_state"] is None and stripped["ema"] is None
    # strip swaps in the EMA weights (reference strip_optimizer semantics)
    np.testing.assert_array_equal(stripped["variables"]["params"]["w"], np.ones((2, 3)))
    assert int(stripped["epoch"]) == -1


def test_autoanchor_improves_bad_anchors(rng):
    from yolo_dual_tpu.utils.autoanchor import anchor_fitness, check_anchors, kmean_anchors
    # targets cluster around two wh modes
    wh = np.concatenate([rng.normal(40, 4, (300, 2)), rng.normal(120, 10, (300, 2))]).clip(2)
    bad = np.array([[2, 2], [3, 3], [4, 4], [5, 5], [6, 6], [8, 8]], np.float32)
    new = kmean_anchors(wh, n=6, thr=4.0, gen=100)
    assert anchor_fitness(new, wh, 1 / 4.0) > anchor_fitness(bad, wh, 1 / 4.0) + 0.2

    shapes = np.full((50, 2), 640)
    labels = [np.concatenate([np.zeros((12, 1)), rng.uniform(0.4, 0.6, (12, 2)),
                              rng.uniform(0.05, 0.2, (12, 2))], 1)]
    labels = labels * 50
    bpr, suggestion = check_anchors(shapes, labels, bad.reshape(2, 3, 2), [8, 16], thr=4.0)
    assert suggestion is not None  # bad anchors -> evolution kicks in


def test_multibackend_torchpt(tmp_path):
    """MultiBackend loads a .pt exported by export.py."""
    torch = pytest.importorskip("torch")
    from yolo_dual_tpu.io.multibackend import MultiBackend
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train.checkpoint import export_torch_state_dict

    cfg = dict(
        nc=2, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 13, 16, 30, 33, 23]],
        backbone=[[-1, 1, "Conv", [8, 6, 2, 2]], [-1, 1, "Conv", [16, 3, 2]],
                  [-1, 1, "Conv", [16, 3, 2]]],
        head=[[[2], 1, "Segment", ["nc", "anchors", 4, 8]]],
    )
    m = SegmentationModel(cfg)
    v = m.init(imgsz=32)
    sd = {k: torch.tensor(x) for k, x in export_torch_state_dict(v, m.spec).items()}
    pt = tmp_path / "w.pt"
    torch.save({"model": sd}, pt)
    # fuse=False: exact weight round-trip; the fused default is covered below
    mb = MultiBackend(pt, cfg=cfg, nc=2, imgsz=32, fuse=False)
    pred, protos = mb.forward(np.zeros((1, 32, 32, 3), np.float32))
    assert np.isfinite(np.asarray(pred)).all()
    # outputs must equal the source model's (weights round-tripped)
    import jax.numpy as jnp
    ref_pred, ref_protos, _ = m.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred), rtol=1e-5, atol=1e-5)
    # fused default stays numerically close (conv+BN folding + backend conv precision)
    mbf = MultiBackend(pt, cfg=cfg, nc=2, imgsz=32)
    predf, _ = mbf.forward(np.zeros((1, 32, 32, 3), np.float32))
    np.testing.assert_allclose(np.asarray(predf), np.asarray(ref_pred), rtol=5e-3, atol=5e-2)


def test_multibackend_torchscript(tmp_path):
    """MultiBackend runs a TorchScript archive through the torch-CPU bridge."""
    torch = pytest.importorskip("torch")
    from yolo_dual_tpu.io.multibackend import MultiBackend

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 4, 1)

        def forward(self, x):
            return self.conv(x).flatten(2).transpose(1, 2)  # (b, hw, 4)

    ts = tmp_path / "w.torchscript"
    torch.jit.script(Tiny()).save(str(ts))
    mb = MultiBackend(ts, imgsz=16)
    assert mb.kind == "torchscript"
    pred, protos = mb.warmup((1, 16, 16, 3)) and mb.forward(np.ones((1, 16, 16, 3), np.float32))
    assert pred.shape == (1, 256, 4) and protos is None


def test_multibackend_kind_detection(tmp_path):
    from yolo_dual_tpu.io.multibackend import detect_kind
    import pytest as _pytest
    (tmp_path / "sm").mkdir()
    (tmp_path / "sm" / "saved_model.pb").touch()
    assert detect_kind(tmp_path / "sm") == "savedmodel"
    (tmp_path / "ck").mkdir()
    assert detect_kind(tmp_path / "ck") == "orbax"
    assert detect_kind(tmp_path / "w.pt") == "torchpt"
    assert detect_kind(tmp_path / "w.tflite") == "tflite"
    assert detect_kind(tmp_path / "w.torchscript") == "torchscript"
    with _pytest.raises(ValueError):
        detect_kind(tmp_path / "missing.bin")


def test_semantic_backbone_head_rooted_import():
    """Reference semantic checkpoints root keys at backbone.{i}/head.{j}
    (reference seg_jaccardloss_Resnet50.py:355-356); head.{j} must land on
    model_{n_backbone+j} (advisor r2: n_backbone was hard-wired to 0)."""
    import re

    from yolo_dual_tpu.io import import_torch_state_dict
    from yolo_dual_tpu.models.model import SemanticSegModel
    from yolo_dual_tpu.train.checkpoint import export_torch_state_dict

    cfg = dict(
        nc=4, depth_multiple=1.0, width_multiple=1.0, compiler="semantic",
        activation="relu",
        backbone=[[-1, 1, "ResNetStem", [8]],
                  [-1, 1, "ResNet18Layer", [8, 1, 1]],
                  [-1, 1, "ResNet18Layer", [16, 1, 2]]],
        head=[[[1, 2], 1, "SegmentHead", [4, 8]]],
    )
    m = SemanticSegModel(cfg)
    nb = m.spec.n_backbone
    assert nb == 3
    v = m.init(imgsz=64)
    sd = export_torch_state_dict(v, m.spec)

    def reroot(k):
        mm = re.match(r"model\.(\d+)\.(.*)", k)
        if not mm:
            return k
        i, rest = int(mm.group(1)), mm.group(2)
        return (f"backbone.{i}.{rest}" if i < nb else f"head.{i - nb}.{rest}")

    sd2 = {reroot(k): x for k, x in sd.items()}
    assert any(k.startswith("head.0.") for k in sd2)
    v2 = m.init(jax.random.PRNGKey(3), imgsz=64)
    v2 = import_torch_state_dict(v2, sd2, spec=m.spec, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_multibackend_detect_head_protos_none(tmp_path):
    """Detect-head configs return (pred, raw levels) from apply; MultiBackend
    must NOT leak the raw maps through the protos slot (advisor r2)."""
    import torch

    from yolo_dual_tpu.io import MultiBackend
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.train.checkpoint import export_torch_state_dict

    cfg = dict(
        nc=2, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
        backbone=[[-1, 1, "Conv", [8, 6, 2, 2]], [-1, 1, "Conv", [16, 3, 2]],
                  [-1, 1, "C3", [16]], [-1, 1, "Conv", [24, 3, 2]],
                  [-1, 1, "SPPF", [24, 5]]],
        head=[[[3, 4], 1, "Detect", ["nc", "anchors"]]],
    )
    m = SegmentationModel(cfg)
    v = m.init(imgsz=64)
    sd = {k: torch.tensor(x) for k, x in export_torch_state_dict(v, m.spec).items()}
    w = tmp_path / "detect.pt"
    torch.save({"model_state_dict": sd}, str(w))
    import yaml
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    mb = MultiBackend(w, cfg=str(cfg_path), nc=2, imgsz=64)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    pred, protos = mb.forward(x)
    assert protos is None
    assert np.asarray(pred).ndim == 3  # (b, N, 5+nc)
    # weights actually transferred: MultiBackend (fused conv+BN) must match
    # the source model's own decoded forward — 'model_state_dict' container
    # unwrap + non-strict import both silently failing would diverge here
    import jax.numpy as jnp
    expected = np.asarray(m.apply(v, jnp.asarray(x), train=False)[0])
    np.testing.assert_allclose(np.asarray(pred), expected, rtol=1e-3, atol=2e-4)
