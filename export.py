"""Model export CLI.

The reference's `DetectMultiBackend._model_type` imports `export_formats` from
an `export.py` that does not exist in that repo (reference
models/common.py:607 — a shipped defect). This framework ships the real thing:

  - torchpt    : reference-style state_dict .pt (usable by the PyTorch
                 ecosystem and re-importable here)
  - savedmodel : TF SavedModel via jax2tf (serving / TF-Lite toolchains)
  - tflite     : TFLite flatbuffer converted from the SavedModel

Usage:
    python export.py --weights runs/train-seg/exp/best --cfg yolov5s-seg.yaml \
        --include torchpt savedmodel --imgsz 640
"""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from yolo_dual_tpu.utils.general import LOGGER


def export_formats():
    """Supported formats table (the API the reference's DetectMultiBackend
    expects from export.py)."""
    return [
        ["Orbax checkpoint", "orbax", "", True],
        ["PyTorch state_dict", "torchpt", ".pt", True],
        ["TF SavedModel", "savedmodel", "_saved_model", True],
        ["TFLite", "tflite", ".tflite", True],
    ]


def load_model(weights, cfg, nc, imgsz):
    sys.path.insert(0, str(ROOT / "segment"))
    from val import find_cfg
    path = find_cfg(cfg, "segment", "models", "semantic")
    import yaml
    d = yaml.safe_load(Path(path).read_text())
    if d.get("anchors") is None:
        # semantic-dialect config (no anchor head): route through the factory
        # so `export.py --cfg resnet50.yaml --include onnx` ships the
        # semantic flagship too (io/onnx_export.py semantic ops, r4)
        from yolo_dual_tpu.models.model import build_model
        # --nc overrides the config's class count here exactly like the
        # detect branch; None/unset keeps the config's own nc
        model = build_model(path, nc=nc)
        variables = model.init(imgsz=imgsz)
        if weights:
            from yolo_dual_tpu.io.weights import resolve_variables
            variables = resolve_variables(model, weights, variables)
        return model, variables
    from val import load_model_and_weights
    return load_model_and_weights(weights, cfg, nc, imgsz)


def export_torchpt(model, variables, out: Path):
    import torch
    from yolo_dual_tpu.train.checkpoint import export_torch_state_dict
    sd = {k: torch.tensor(v) for k, v in export_torch_state_dict(variables, model.spec).items()}
    torch.save({"model": sd, "format": "yolo_dual_tpu-state_dict"}, out)
    LOGGER.info(f"exported torch state_dict -> {out}")
    return out


def export_savedmodel(model, variables, imgsz: int, out: Path):
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fwd(x):
        pred, protos, _ = model.module.apply(variables, x, train=False)
        return {"pred": pred, "protos": protos}

    tf_fn = tf.function(
        jax2tf.convert(fwd, with_gradient=False,
                       native_serialization_platforms=("cpu", "tpu")),
        input_signature=[tf.TensorSpec((1, imgsz, imgsz, 3), tf.float32)],
        autograph=False)
    m = tf.Module()
    m.f = tf_fn
    tf.saved_model.save(m, str(out))
    LOGGER.info(f"exported SavedModel -> {out}")
    return out


def export_tflite(saved_model_dir: Path, out: Path, int8: bool = False,
                  imgsz: int = 640, rep_images=None):
    """TFLite conversion; `int8` adds post-training full-integer quantization
    with float fallback (the upstream YOLOv5 `export.py --int8` capability the
    reference lost with its missing export.py): a representative dataset
    calibrates activation ranges, model IO stays float32 so the serving
    contract is unchanged. `rep_images`: iterable of HWC uint8 / NHWC float
    calibration images; defaults to random frames."""
    import numpy as np
    import tensorflow as tf
    converter = tf.lite.TFLiteConverter.from_saved_model(str(saved_model_dir))
    converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS,
                                           tf.lite.OpsSet.SELECT_TF_OPS]
    if int8:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]

        def _rep():
            if rep_images is not None:
                for im in rep_images:
                    im = np.asarray(im)
                    if im.ndim == 3:
                        im = im[None]
                    if im.dtype == np.uint8:
                        im = im.astype(np.float32) / 255.0
                    yield [im.astype(np.float32)]
            else:
                rng = np.random.default_rng(0)
                for _ in range(16):
                    yield [rng.uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)]

        converter.representative_dataset = _rep
    out.write_bytes(converter.convert())
    LOGGER.info(f"exported TFLite{' int8' if int8 else ''} -> {out}")
    return out


def run(weights="", cfg="yolov5s-seg.yaml", nc=None, imgsz=640,
        include=("torchpt",), out_dir="runs/export", fuse=False, int8=False):
    model, variables = load_model(weights, cfg, nc, imgsz)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(cfg).stem
    results = {}
    if "torchpt" in include:
        # .pt keeps the unfused layout (torch importers expect BN keys)
        results["torchpt"] = export_torchpt(model, variables, out_dir / f"{stem}.pt")
    if "onnx" in include:
        # export_onnx folds conv+BN itself (it needs the unfused tree)
        from yolo_dual_tpu.io.onnx_export import export_onnx
        out = export_onnx(model, variables, imgsz, out_dir / f"{stem}.onnx")
        LOGGER.info(f"exported ONNX -> {out}")
        results["onnx"] = out
    if fuse:
        # conv+BN folding shrinks the exported inference graph
        model, variables = model.fuse(variables)
    if "savedmodel" in include or "tflite" in include:
        sm = export_savedmodel(model, variables, imgsz, out_dir / f"{stem}_saved_model")
        results["savedmodel"] = sm
        if "tflite" in include:
            results["tflite"] = export_tflite(sm, out_dir / f"{stem}.tflite",
                                              int8=int8, imgsz=imgsz)
    return results


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5s-seg.yaml")
    p.add_argument("--nc", type=int, default=None,
                   help="class-count override; default: the config's own nc")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--include", nargs="+", default=["torchpt"],
                   choices=["torchpt", "savedmodel", "tflite", "onnx"])
    p.add_argument("--out-dir", default=str(ROOT / "runs" / "export"))
    p.add_argument("--fuse", action="store_true",
                   help="fold conv+BN before SavedModel/TFLite export")
    p.add_argument("--int8", action="store_true",
                   help="TFLite post-training int8 quantization (float IO)")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(**vars(parse_opt()))
