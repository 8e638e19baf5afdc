"""AutoBatch: pick the largest batch that fits device memory.

Capability parity with reference utils/autobatch.py:18-72 (linear fit of
memory vs batch size, target fraction of total). The TPU version uses XLA's
compile-time memory analysis (`Compiled.memory_analysis()`), which is exact
and free — no probe forwards needed (the reference runs 5 real forwards).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def device_memory_bytes(default: int = 16 * 2 ** 30) -> int:
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return default


def autobatch(model, variables, imgsz: int = 640, fraction: float = 0.8,
              candidates=(1, 2, 4, 8, 16, 32, 64, 128)) -> int:
    """Largest candidate batch whose compiled forward fits `fraction` of HBM."""
    limit = device_memory_bytes() * fraction
    best = candidates[0]
    for bs in candidates:
        try:
            x = jax.ShapeDtypeStruct((bs, imgsz, imgsz, 3), jnp.float32)
            compiled = jax.jit(lambda v, xx: model.module.apply(v, xx, train=False)) \
                .lower(variables, x).compile()
            mem = compiled.memory_analysis()
            total = (getattr(mem, "temp_size_in_bytes", 0)
                     + getattr(mem, "argument_size_in_bytes", 0)
                     + getattr(mem, "output_size_in_bytes", 0))
            if not total:
                # unknown memory cost (backend reports no analysis): growing
                # further is a blind bet — keep the last PROVEN batch instead
                # of returning the largest candidate unchecked (advisor r2)
                LOGGER.info(f"autobatch: no memory analysis at bs={bs}; keeping {best}")
                break
            if total > limit:
                break
            best = bs
        except Exception as e:
            LOGGER.info(f"autobatch: bs={bs} failed ({e}); using {best}")
            break
    LOGGER.info(f"autobatch: using batch size {best} (limit {limit / 2**30:.1f} GiB)")
    return best
