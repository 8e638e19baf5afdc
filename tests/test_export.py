"""Export surface: SavedModel via jax2tf and TFLite (float + int8 PTQ)
round-trips (upstream YOLOv5 export.py capability; the reference ships a
DetectMultiBackend that *requires* an export.py it lacks —
reference models/common.py:607)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
           [116, 90, 156, 198, 373, 326]]


def _tiny_model():
    from yolo_dual_tpu.models.model import SegmentationModel
    cfg = dict(
        nc=2, depth_multiple=0.33, width_multiple=0.125,
        anchors=[list(a) for a in ANCHORS],
        backbone=[
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]], [-1, 1, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]], [-1, 1, "C3", [512]],
            [-1, 1, "Conv", [1024, 3, 2]], [-1, 1, "C3", [1024]], [-1, 1, "SPPF", [1024, 5]],
        ],
        head=[
            [-1, 1, "Conv", [512, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [256, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [-1, 1, "Conv", [256, 3, 2]], [[-1, 14], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [512, 3, 2]], [[-1, 10], 1, "Concat", [1]], [-1, 1, "C3", [1024, False]],
            [[17, 20, 23], 1, "Segment", ["nc", "anchors", 8, 32]],
        ],
    )
    model = SegmentationModel(cfg)
    return model, model.init(imgsz=64)


def _tflite_pred(tfl_bytes_path, x):
    interp = tf.lite.Interpreter(model_path=str(tfl_bytes_path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    outs = {d["name"]: interp.get_tensor(d["index"])
            for d in interp.get_output_details()}
    # output naming varies across converter versions; match by rank/shape
    pred = next(v for v in outs.values() if v.ndim == 3)
    return pred


def test_tflite_float_and_int8_roundtrip(tmp_path):
    import jax.numpy as jnp
    from export import export_savedmodel, export_tflite

    model, variables = _tiny_model()
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    pred_jax, _, _ = model.module.apply(variables, jnp.asarray(x), train=False)
    pred_jax = np.asarray(pred_jax)

    sm = export_savedmodel(model, variables, 64, tmp_path / "sm")
    fl = export_tflite(sm, tmp_path / "m.tflite", imgsz=64)
    pred_fl = _tflite_pred(fl, x)
    assert pred_fl.shape == pred_jax.shape
    np.testing.assert_allclose(pred_fl, pred_jax, rtol=1e-3, atol=1e-3)

    # MultiBackend must return (pred, protos) in that order off the .tflite
    from yolo_dual_tpu.io.multibackend import MultiBackend
    mb = MultiBackend(tmp_path / "m.tflite")
    mb_pred, mb_protos = mb(x)
    assert mb_pred.ndim == 3 and mb_pred.shape == pred_jax.shape
    assert mb_protos is not None and mb_protos.ndim == 4
    np.testing.assert_allclose(mb_pred, pred_jax, rtol=1e-3, atol=1e-3)

    q = export_tflite(sm, tmp_path / "m_int8.tflite", int8=True, imgsz=64,
                      rep_images=[x[0]] * 4)
    pred_q = _tflite_pred(q, x)
    assert pred_q.shape == pred_jax.shape
    assert np.all(np.isfinite(pred_q))
    # int8 PTQ keeps the prediction field correlated with the float model
    c = np.corrcoef(pred_q.ravel(), pred_jax.ravel())[0, 1]
    assert c > 0.8, f"int8 output decorrelated from float (r={c:.3f})"
