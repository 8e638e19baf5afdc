"""Multi-checkpoint ensemble loading.

Capability parity with reference models/experimental.py:71-111 (attempt_load
with the Ensemble module: several weights files run through one forward; the
reference's shipping mode concatenates each model's decoded predictions along
the candidate axis — "nms ensemble" — with max/mean kept as alternatives).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp

from yolo_dual_tpu.utils.general import LOGGER


def _load_variables(model, weights, imgsz: int):
    from yolo_dual_tpu.io.weights import resolve_variables
    return resolve_variables(model, weights, model.init(imgsz=imgsz))


class Ensemble:
    """Holds one model graph + N weight sets; forward runs all and merges.

    mode='cat'  — concatenate decoded predictions over candidates (the
                  reference Ensemble default, experimental.py:39: NMS dedups)
    mode='mean' — average predictions elementwise (reference's commented
                  alternative; requires identical output shapes, which holds
                  since all members share the graph)
    Protos come from the first member (mask coefficients are member-specific;
    under 'cat' each candidate row still carries its own member's coefs
    against member-0 protos — same caveat the torch ensemble has)."""

    def __init__(self, model, variables_list: Sequence, mode: str = "cat"):
        assert mode in ("cat", "mean"), mode
        assert len(variables_list) >= 1
        self.model = model
        self.variables_list = list(variables_list)
        self.mode = mode
        self.nc = model.nc
        self.names = model.names
        self.stride = model.stride

        def fwd(vs, x):
            preds, protos = [], None
            for v in vs:
                out = model.module.apply(v, x, train=False)
                if isinstance(out, tuple) and len(out) == 3:
                    p, pr, _ = out
                    protos = pr if protos is None else protos
                else:
                    p = out[0] if isinstance(out, tuple) else out
                preds.append(p)
            merged = (jnp.concatenate(preds, axis=1) if mode == "cat"
                      else sum(preds) / len(preds))
            return merged, protos

        # variables passed as a jit ARGUMENT, not a closure: closed-over
        # weights would be baked into the executable as XLA constants
        # (~2x weight HBM + constant-folding compile cost)
        self._fwd = jax.jit(fwd)

    def __call__(self, x):
        return self._fwd(self.variables_list, jnp.asarray(x))

    forward = __call__


def attempt_load(weights, cfg, nc: int = 80, imgsz: int = 640, mode: str = "cat"):
    """Load one or several weights files (reference attempt_load,
    models/experimental.py:71-111).

    weights: path or list of paths (.pt or orbax dirs). Returns
    (model, variables) for a single file, or an `Ensemble` for several."""
    from yolo_dual_tpu.models.model import SegmentationModel
    ws = [weights] if isinstance(weights, (str, Path)) else list(weights)
    model = SegmentationModel(cfg, nc=nc)
    variables_list = [_load_variables(model, w, imgsz) for w in ws]
    if len(ws) == 1:
        return model, variables_list[0]
    LOGGER.info(f"Ensemble created with {len(ws)} models ({mode} merge)")
    return Ensemble(model, variables_list, mode=mode)
