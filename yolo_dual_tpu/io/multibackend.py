"""Multi-backend inference loader.

Capability parity with reference models/common.py:320-624 DetectMultiBackend
(PT/TorchScript/ONNX/OpenVINO/TRT/CoreML/TF/TFLite/Paddle/Triton behind one
`forward`). The TPU-native equivalent loads the formats that make sense here:

  - orbax checkpoint directory (native)
  - reference / exported .pt state_dicts (via the torch importer)
  - TF SavedModel produced by export.py (runs via tensorflow — useful to
    validate an export round trip)

All backends expose `forward(x_nhwc_float)` -> (pred, protos|None) and a
`warmup()` like the reference.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


class MultiBackend:
    def __init__(self, weights, cfg=None, nc: int = 80, imgsz: int = 640):
        w = Path(str(weights))
        self.kind = None
        self.imgsz = imgsz
        if w.is_dir() and (w / "_METADATA").exists() or (w / "manifest.ocdbt").exists() \
                or (w.is_dir() and any(w.glob("*.orbax*"))) or (w.is_dir() and (w / "d").exists()):
            self.kind = "orbax"
        if str(w).endswith(".pt"):
            self.kind = "torchpt"
        elif w.is_dir() and (w / "saved_model.pb").exists():
            self.kind = "savedmodel"
        elif self.kind is None and w.is_dir():
            self.kind = "orbax"

        if self.kind in ("orbax", "torchpt"):
            from yolo_dual_tpu.models.model import SegmentationModel
            assert cfg is not None, "cfg required for orbax/torch weights"
            self.model = SegmentationModel(cfg, nc=nc)
            variables = self.model.init(imgsz=imgsz)
            if self.kind == "torchpt":
                from yolo_dual_tpu.io import import_torch_state_dict, load_torch_checkpoint
                sd = load_torch_checkpoint(w)
                variables = import_torch_state_dict(variables, sd, spec=self.model.spec,
                                                    strict=False)
            else:
                from yolo_dual_tpu.train import load_checkpoint
                ckpt = load_checkpoint(w)
                variables = ckpt.get("variables", variables)
                if ckpt.get("ema"):
                    variables = ckpt["ema"].get("ema", variables)
            self.variables = variables

            @jax.jit
            def fwd(v, x):
                out = self.model.module.apply(v, x, train=False)
                return out[0], out[1] if isinstance(out, tuple) and len(out) > 1 else None
            self._fwd = fwd
        elif self.kind == "savedmodel":
            import tensorflow as tf
            self.tf_model = tf.saved_model.load(str(w))
            self._fwd = None
        else:
            raise ValueError(f"unsupported weights {weights}")
        LOGGER.info(f"MultiBackend: loaded {weights} as {self.kind}")

    def forward(self, x):
        if self.kind == "savedmodel":
            import tensorflow as tf
            out = self.tf_model.f(tf.constant(np.asarray(x, np.float32)))
            return np.asarray(out["pred"]), np.asarray(out["protos"])
        pred, protos = self._fwd(self.variables, jnp.asarray(x))
        return pred, protos

    __call__ = forward

    def warmup(self, shape=None):
        shape = shape or (1, self.imgsz, self.imgsz, 3)
        self.forward(np.zeros(shape, np.float32))
        return self
