"""Multi-backend inference loader.

Capability parity with reference models/common.py:320-624 DetectMultiBackend
(PT/TorchScript/ONNX/OpenVINO/TRT/CoreML/TF/TFLite/Paddle/Triton behind one
`forward`). The TPU-native equivalent loads every format that exists in this
stack's ecosystem:

  - orbax checkpoint directory (native; conv+BN-fused for inference)
  - reference / exported .pt state_dicts (via the torch importer; fused)
  - TorchScript .torchscript archives (runs via torch-CPU, NCHW bridge)
  - TF SavedModel produced by export.py (runs via tensorflow)
  - TFLite .tflite flatbuffers produced by export.py (tf.lite.Interpreter)

All backends expose `forward(x_nhwc_float)` -> (pred, protos|None) and a
`warmup()` like the reference.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def detect_kind(w: Path) -> str:
    """Classify a weights path. Directory layouts: orbax checkpoints carry
    ocdbt manifests / _METADATA / item subdirs; SavedModels carry
    saved_model.pb. Files classify by suffix."""
    s = str(w).lower()
    if s.endswith(".torchscript"):
        return "torchscript"
    if s.endswith(".pt"):
        return "torchpt"
    if s.endswith(".tflite"):
        return "tflite"
    if s.endswith(".onnx"):
        return "onnx"
    if w.is_dir():
        if (w / "saved_model.pb").exists():
            return "savedmodel"
        return "orbax"  # orbax layouts vary by version; any other dir is native
    raise ValueError(f"unsupported weights {w}")


class MultiBackend:
    def __init__(self, weights, cfg=None, nc: int = 80, imgsz: int = 640,
                 fuse: bool = True):
        w = Path(str(weights))
        self.kind = detect_kind(w)
        self.imgsz = imgsz

        if self.kind in ("orbax", "torchpt"):
            from yolo_dual_tpu.models.model import SegmentationModel
            assert cfg is not None, "cfg required for orbax/torch weights"
            self.model = SegmentationModel(cfg, nc=nc)
            variables = self.model.init(imgsz=imgsz)
            from yolo_dual_tpu.io.weights import resolve_variables
            variables = resolve_variables(self.model, w, variables)
            if fuse:
                self.model, variables = self.model.fuse(variables)
            self.variables = variables
            model = self.model

            is_segment = model.spec.layers[-1].name == "Segment"

            @jax.jit
            def fwd(v, x):
                out = model.module.apply(v, x, train=False)
                if not isinstance(out, tuple):
                    return out, None     # semantic: one dense (b,h,w,nc) map
                if is_segment:
                    return out[0], out[1]  # (decoded pred, protos[, raw])
                # Detect heads return (decoded pred, raw levels) — the raw
                # maps are NOT protos and must not leak through the
                # (pred, protos|None) contract
                return out[0], None
            self._fwd = fwd
        elif self.kind == "torchscript":
            import torch
            self.ts_model = torch.jit.load(str(w), map_location="cpu").eval()
        elif self.kind == "savedmodel":
            import tensorflow as tf
            self.tf_model = tf.saved_model.load(str(w))
        elif self.kind == "onnx":
            # OpenCV-DNN runtime (the reference's --dnn ONNX path,
            # models/common.py:377-379); files come from export.py --include
            # onnx (io/onnx_export.py, dependency-free writer)
            import cv2
            self.net = cv2.dnn.readNetFromONNX(str(w))
            self._onnx_outs = list(self.net.getUnconnectedOutLayersNames())
        elif self.kind == "tflite":
            import tensorflow as tf
            self.interpreter = tf.lite.Interpreter(model_path=str(w))
            self.interpreter.allocate_tensors()
            self._tfl_in = self.interpreter.get_input_details()
            self._tfl_out = self.interpreter.get_output_details()
        LOGGER.info(f"MultiBackend: loaded {weights} as {self.kind}")

    def forward(self, x):
        x = np.asarray(x, np.float32)
        if self.kind == "savedmodel":
            import tensorflow as tf
            out = self.tf_model.f(tf.constant(x))
            return np.asarray(out["pred"]), np.asarray(out["protos"])
        if self.kind == "tflite":
            interp = self.interpreter
            if tuple(self._tfl_in[0]["shape"]) != x.shape:
                interp.resize_tensor_input(self._tfl_in[0]["index"], x.shape)
                interp.allocate_tensors()
                # refresh cached details: the stale shape would re-trigger
                # resize+allocate on EVERY subsequent call (per-frame realloc)
                self._tfl_in = interp.get_input_details()
                self._tfl_out = interp.get_output_details()
            interp.set_tensor(self._tfl_in[0]["index"], x)
            interp.invoke()
            outs = [interp.get_tensor(d["index"]) for d in self._tfl_out]
            # export.py emits pred (b, N, 5+nc+nm) ndim=3 and, for segment
            # models, protos (b, mh, mw, nm) ndim=4 — identify by rank
            outs.sort(key=lambda o: o.ndim)
            if len(outs) >= 2:
                return outs[0], outs[1]
            return outs[0], None
        if self.kind == "onnx":
            self.net.setInput(x.transpose(0, 3, 1, 2), "images")
            names = [n for n in ("pred", "protos") if n in self._onnx_outs] \
                or self._onnx_outs
            outs = self.net.forward(names)
            pred = outs[0]
            protos = outs[1].transpose(0, 2, 3, 1) if len(outs) > 1 else None
            return pred, protos
        if self.kind == "torchscript":
            import torch
            with torch.no_grad():
                out = self.ts_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            if isinstance(out, (list, tuple)):
                pred = out[0]
                protos = out[1] if len(out) > 1 else None
                if isinstance(protos, (list, tuple)):  # torch (pred, (…, protos)) nests
                    protos = protos[-1]
                return (np.asarray(pred),
                        None if protos is None else np.asarray(protos))
            return np.asarray(out), None
        pred, protos = self._fwd(self.variables, jnp.asarray(x))
        return pred, protos

    __call__ = forward

    def warmup(self, shape=None):
        shape = shape or (1, self.imgsz, self.imgsz, 3)
        self.forward(np.zeros(shape, np.float32))
        return self
