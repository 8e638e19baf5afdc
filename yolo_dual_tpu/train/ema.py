"""Exponential moving average of model variables (params + BN stats).

Capability parity with reference utils/torch_utils.py:404-432 ModelEMA:
decay(t) = decay · (1 − e^{−t/tau}), applied to every float leaf of the
variables tree (the torch version EMAs all float state-dict entries, which
includes BN running stats). Functional: state lives in the TrainState pytree
and the update is jit-fused with the train step."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ModelEMA:
    decay: float = 0.9999
    tau: float = 2000.0

    def init(self, variables) -> dict:
        return {"ema": jax.tree_util.tree_map(jnp.asarray, variables),
                "updates": jnp.zeros((), jnp.int32)}

    def update(self, state: dict, variables) -> dict:
        updates = state["updates"] + 1
        d = self.decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / self.tau))

        leaves = jax.tree_util.tree_leaves(state["ema"])
        if leaves and all(jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
                          for l in leaves):
            # all-float tree (the usual case: params + BN stats): blend over
            # ONE raveled vector — a single fused lerp kernel instead of one
            # per leaf (~300 tiny kernels on the yolov5s-seg tree)
            from jax.flatten_util import ravel_pytree
            fe, unravel = ravel_pytree(state["ema"])
            fv, _ = ravel_pytree(variables)
            ema = unravel(fe * d + (1.0 - d) * fv.astype(fe.dtype))
        else:
            def blend(e, v):
                if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
                    return e * d + (1.0 - d) * v
                return v

            ema = jax.tree_util.tree_map(blend, state["ema"], variables)
        return {"ema": ema, "updates": updates}
