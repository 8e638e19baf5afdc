"""Single weight-resolution rule shared by every loader surface.

The reference funnels all loading through attempt_load
(models/experimental.py:71-111); here MultiBackend, Ensemble/attempt_load and
the val/predict CLIs all call `resolve_variables` so the ".pt vs orbax,
prefer EMA, accept bare variables trees" rule lives in ONE place (it had
drifted into three copies — advisor r2)."""

from __future__ import annotations


def resolve_variables(model, weights, variables: dict) -> dict:
    """Fill `variables` (a fresh model.init tree) from a weights path.

    - *.pt → torch state_dict import (strict=False partial fill)
    - anything else → orbax checkpoint: prefer ckpt['ema']['ema'], then
      ckpt['variables'], and accept a BARE variables tree (a dict with
      'params'/...) saved without the training wrapper.
    """
    w = str(weights)
    if w.endswith(".pt"):
        from yolo_dual_tpu.io.torch_import import import_torch_state_dict, load_torch_checkpoint
        sd = load_torch_checkpoint(w)
        return import_torch_state_dict(variables, sd, spec=model.spec, strict=False)
    from yolo_dual_tpu.train import load_checkpoint
    ckpt = load_checkpoint(w)
    if ckpt.get("ema") and isinstance(ckpt["ema"], dict) and ckpt["ema"].get("ema"):
        return ckpt["ema"]["ema"]
    return ckpt.get("variables", ckpt) if isinstance(ckpt, dict) else ckpt
