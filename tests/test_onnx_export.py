"""ONNX export round-trip (io/onnx_export.py): the dependency-free protobuf
writer + graph builder must produce a file OpenCV-DNN parses AND whose outputs
match the flax inference forward (decoded pred + protos) numerically.

cv2.dnn is the in-image ONNX runtime (neither `onnx` nor `onnxruntime` ship
here); it is also a real deployment target (reference DetectMultiBackend's
--dnn path, models/common.py:320-624)."""

import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, str(Path(__file__).parent))
from test_torch_parity import tiny_cfg  # noqa: E402

IMGSZ = 64


def _flax_forward(model, variables, x_nchw):
    import jax.numpy as jnp
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    out = model.apply(variables, x, train=False)
    if len(out) == 3:  # segment: pred, protos, raw
        pred, protos, _ = out
        return np.asarray(pred), np.asarray(protos).transpose(0, 3, 1, 2)
    pred, _ = out
    return np.asarray(pred), None


@pytest.mark.parametrize("segment", [False, True], ids=["detect", "segment"])
def test_onnx_roundtrip_cv2dnn(tmp_path, segment):
    from yolo_dual_tpu.io.onnx_export import export_onnx
    from yolo_dual_tpu.models.model import DetectionModel, SegmentationModel

    cfg = tiny_cfg(segment)
    model = (SegmentationModel if segment else DetectionModel)(cfg, nc=4)
    variables = model.init(imgsz=IMGSZ)

    out = export_onnx(model, variables, IMGSZ, tmp_path / "m.onnx")
    assert out.stat().st_size > 10_000

    net = cv2.dnn.readNetFromONNX(str(out))
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, IMGSZ, IMGSZ)).astype(np.float32)
    net.setInput(x, "images")
    names = ["pred", "protos"] if segment else ["pred"]
    got = net.forward(names)

    pred_ref, protos_ref = _flax_forward(model, variables, x)
    np.testing.assert_allclose(got[0], pred_ref, atol=2e-3, rtol=1e-3)
    if segment:
        np.testing.assert_allclose(got[1], protos_ref, atol=1e-3, rtol=1e-3)


def test_onnx_unsupported_module_message(tmp_path):
    from yolo_dual_tpu.io.onnx_export import export_onnx
    from yolo_dual_tpu.models.model import DetectionModel
    cfg = tiny_cfg(False)
    cfg["backbone"][2] = [-1, 1, "GhostConv", [16, 1, 1]]
    model = DetectionModel(cfg, nc=4)
    variables = model.init(imgsz=IMGSZ)
    with pytest.raises(NotImplementedError, match="GhostConv"):
        export_onnx(model, variables, IMGSZ, tmp_path / "x.onnx")


def test_multibackend_onnx(tmp_path):
    """MultiBackend loads .onnx (OpenCV-DNN runtime) behind the same
    (pred, protos) forward contract as every other backend."""
    from yolo_dual_tpu.io.multibackend import MultiBackend
    from yolo_dual_tpu.io.onnx_export import export_onnx
    from yolo_dual_tpu.models.model import SegmentationModel

    cfg = tiny_cfg(True)
    model = SegmentationModel(cfg, nc=4)
    variables = model.init(imgsz=IMGSZ)
    path = export_onnx(model, variables, IMGSZ, tmp_path / "m.onnx")

    mb = MultiBackend(path, imgsz=IMGSZ)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, IMGSZ, IMGSZ, 3)).astype(np.float32)  # NHWC contract
    pred, protos = mb(x)
    pred_ref, protos_ref = _flax_forward(model, variables, x.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(pred, pred_ref, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(protos.transpose(0, 3, 1, 2), protos_ref,
                               atol=1e-3, rtol=1e-3)


def test_onnx_semantic_roundtrip_cv2dnn(tmp_path):
    """Semantic-dialect export (r4): a tiny graph covering EVERY new op —
    ResNetStem, bottleneck+basic ResNetLayer, VGGBlock, C3Conv (incl. the
    n=0 split+merge degenerate), aligning Concat (bilinear resize), Upsample,
    nn.Softmax — round-tripped through cv2.dnn against the flax forward.
    The same dialect drives the full resnet50/vgg16 semantic flagship yamls
    (reference unet-lite/Resnet50/resnet50.yaml:44 ends with nn.Softmax)."""
    import jax.numpy as jnp

    from yolo_dual_tpu.io.onnx_export import export_onnx
    from yolo_dual_tpu.models.model import SemanticSegModel

    cfg = dict(
        nc=5, compiler="semantic", activation="relu",
        backbone=[
            [-1, 1, "ResNetStem", [8]],                 # 0: /4
            [-1, 1, "ResNet50Layer", [16, 2, 1]],       # 1: /4 bottleneck x2
            [-1, 1, "ResNet18Layer", [24, 2, 2]],       # 2: /8 basic x2
            [-1, 1, "VGGBlock", [24, 2, True]],         # 3: /16
        ],
        head=[
            [-1, 1, "Conv", [16, 1, 1]],                # 4
            [-1, 1, "Upsample", [None, 2, "nearest"]],  # 5: /8
            [2, 1, "Conv", [16, 1, 1]],                 # 6: /8
            [[-1, -2], 1, "Concat", [1]],               # 7
            [-1, 3, "C3", [16, False]],                 # 8: C3Conv n=0
            [-1, 1, "C3", [16, 2, True]],               # 9: C3Conv n=2
            [[1, -1], 1, "Concat", [1]],                # 10: ALIGN /8 -> /4
            [-1, 1, "Conv", [5, 1, 1]],                 # 11
            [-1, 1, "nn.Softmax", [1]],                 # 12
        ],
    )
    model = SemanticSegModel(cfg, nc=5)
    variables = model.init(imgsz=IMGSZ)
    out = export_onnx(model, variables, IMGSZ, tmp_path / "sem.onnx")

    net = cv2.dnn.readNetFromONNX(str(out))
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 3, IMGSZ, IMGSZ)).astype(np.float32)
    net.setInput(x, "images")
    got = net.forward("seg")

    # model.apply = the public contract: scores at INPUT resolution (the
    # export appends the same half-pixel resize when the graph is coarser)
    ref = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False)).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_onnx_semantic_segmenthead_roundtrip(tmp_path):
    """resnet18-style SegmentHead graph (multi-scale laterals + align-corners
    upsampling, nn/backbones.py SegmentHead) exports and matches the flax
    forward through cv2.dnn — covers the OTHER semantic head family
    (resnet18/34 configs) at full output resolution."""
    import jax.numpy as jnp

    from yolo_dual_tpu.io.onnx_export import export_onnx
    from yolo_dual_tpu.models.model import SemanticSegModel

    cfg = dict(
        nc=4, compiler="semantic", activation="relu",
        backbone=[
            [-1, 1, "ResNetStem", [8]],
            [-1, 1, "ResNet18Layer", [8, 1, 1]],
            [-1, 1, "ResNet18Layer", [16, 1, 2]],
            [-1, 1, "ResNet18Layer", [24, 1, 2]],
        ],
        head=[[[1, 2, 3], 1, "SegmentHead", [4, 8]]],
    )
    model = SemanticSegModel(cfg, nc=4)
    variables = model.init(imgsz=IMGSZ)
    out = export_onnx(model, variables, IMGSZ, tmp_path / "sh.onnx")

    net = cv2.dnn.readNetFromONNX(str(out))
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 3, IMGSZ, IMGSZ)).astype(np.float32)
    net.setInput(x, "images")
    got = net.forward("seg")
    ref = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False)).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape == (1, 4, IMGSZ, IMGSZ)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)
