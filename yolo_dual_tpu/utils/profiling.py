"""Profiling & model introspection.

Capability parity with reference utils/torch_utils.py:151-199 (profile:
per-op FLOPs + fwd/bwd latency), :272-295 (model_info with thop GFLOPs) and
models/yolo.py:127-138 (_profile_one_layer) — using XLA's own cost analysis
(exact, no thop) and jax.profiler traces for deep dives.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def flops_of(fn, *args) -> Optional[float]:
    """Total FLOPs of a jitted callable via XLA cost analysis."""
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return None


def model_info(model, variables, imgsz: int = 640, verbose: bool = False):
    """Layer/param/GFLOPs summary (reference model_info, utils/torch_utils.py:272)."""
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(variables.get("params", {})))
    n_layers = len(model.spec.layers)
    x = jnp.zeros((1, imgsz, imgsz, model.spec.ch_in), jnp.float32)
    fl = flops_of(lambda v, xx: model.module.apply(v, xx, train=False, decode=False),
                  variables, x)
    gflops = (fl or 0.0) / 1e9
    LOGGER.info(f"Model summary: {n_layers} layers, {n_params:,} parameters, "
                f"{gflops:.1f} GFLOPs @ {imgsz}x{imgsz}")
    if verbose:
        for i, layer in enumerate(model.spec.layers):
            LOGGER.info(f"{i:>3} {layer.name:<18} f={layer.f} c2={layer.c2}")
    return n_layers, n_params, gflops


def profile(fn, *args, n: int = 10, warmup: int = 2, label: str = ""):
    """Latency profile of a jitted callable (reference profile(),
    utils/torch_utils.py:151): compile, warm, report min/median ms."""
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # full completion incl. transfer
    for _ in range(warmup):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    fl = flops_of(fn, *args)
    LOGGER.info(f"profile {label}: min {min(ts) * 1e3:.2f} ms, "
                f"median {np.median(ts) * 1e3:.2f} ms"
                + (f", {fl / min(ts) / 1e12:.2f} TFLOP/s" if fl else ""))
    return min(ts), np.median(ts), fl


def trace(fn, *args, log_dir: str = "runs/profile"):
    """Capture a jax.profiler trace around one execution (view with
    tensorboard / xprof) — the TPU analog of torch profiler traces."""
    import jax.profiler
    with jax.profiler.trace(log_dir):
        r = fn(*args)
        jax.block_until_ready(r)
    LOGGER.info(f"profiler trace written to {log_dir}")
    return r


def check_bf16(model, variables, imgsz: int = 256, atol: float = 0.5) -> bool:
    """bf16-vs-f32 numerical probe, the AMP sanity check analog
    (reference check_amp, utils/general.py:566-593)."""
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)), jnp.float32)
    out32 = model.module.apply(variables, x, train=False, decode=False)
    lead32 = jax.tree_util.tree_leaves(out32)[0]
    v16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.asarray(p).dtype == jnp.float32 else p,
        variables["params"])
    out16 = model.module.apply({"params": v16, **{k: v for k, v in variables.items() if k != "params"}},
                               x.astype(jnp.bfloat16), train=False, decode=False)
    lead16 = jax.tree_util.tree_leaves(out16)[0].astype(jnp.float32)
    ok = bool(jnp.allclose(lead32, lead16, atol=atol, rtol=0.1))
    LOGGER.info(f"bf16 check: {'PASS' if ok else 'FAIL'} "
                f"(max abs diff {float(jnp.abs(lead32 - lead16).max()):.4f})")
    return ok
