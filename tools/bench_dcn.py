"""DCNv3 sampling benchmark: lax-gather core vs Pallas one-hot-MXU kernel,
forward AND forward+backward, at every shape the config zoo produces
(VERDICT r2 next-#4; reference CUDA kernel
models/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh).

Methodology: tunnel-safe loop-slope (see bench.py docstring) — N iterations
inside one jitted lax.fori_loop at two different N, report the slope.

Run on the real TPU:  python tools/bench_dcn.py
Emits a markdown table (paste into docs/PARITY.md) + a suggested use_pallas
threshold derived from the crossover.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

# (h, w, c, group): DCN layer shapes the zoo instantiates at 640px input --
# C3_DCNV3/C3_DCN sit at P3/P4/P5 of the n/s scales (gc = c/group)
SHAPES = [
    (80, 80, 64, 4),
    (80, 80, 128, 4),
    (80, 80, 256, 8),
    (40, 40, 128, 4),
    (40, 40, 256, 8),
    (20, 20, 256, 8),
    (20, 20, 512, 8),
    (16, 16, 256, 8),
]
BATCH = 16
KERNEL, STRIDE, PAD, DIL = 3, 1, 1, 1


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def _slope(run, n1=2, n2=20, repeats=3):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def bench_shape(h, w, c, group, impl: str, bwd: bool):
    from yolo_dual_tpu.kernels.dcn_sampling import dcnv3_sampling
    gc = c // group
    kk = KERNEL * KERNEL
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, h, w, c)).astype(np.float32))
    off = jnp.asarray(rng.normal(0, 1, (BATCH, h, w, group * kk * 2)).astype(np.float32))
    m = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 1, (BATCH, h, w, group * kk)).astype(np.float32))
        .reshape(BATCH, h, w, group, kk), axis=-1).reshape(BATCH, h, w, group * kk)

    def fwd(xx, oo, mm):
        return dcnv3_sampling(xx, oo, mm, KERNEL, STRIDE, PAD, DIL, group, gc,
                              1.0, impl).astype(jnp.float32).sum()

    f = (jax.grad(fwd, argnums=(0, 1, 2)) if bwd else fwd)

    @jax.jit
    def loop(xx, oo, mm, iters):
        def body(i, acc):
            # perturb the OFFSETS: sampling is LINEAR in x, so an x
            # perturbation lets XLA hoist the whole grad out of the loop
            # (measured: bwd slope collapsed to ~0)
            oi = oo + i.astype(jnp.float32) * 1e-5
            out = f(xx, oi, mm)
            leaf = out[0] if isinstance(out, tuple) else out
            return acc + (leaf.sum() if hasattr(leaf, "sum") else leaf)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # keep timed calls bounded at the slow (big-map) cells
    n2 = 6 if h * w >= 80 * 80 else 20
    return _slope(lambda n: loop(x, off, m, n), n2=n2)


def main():
    print(f"device: {jax.devices()[0]}")
    rows = ["| shape (h,w,c,g) | fwd lax ms | fwd pallas ms | fwd+bwd lax ms | fwd+bwd pallas ms |",
            "|---|---|---|---|---|"]
    for (h, w, c, g) in SHAPES:
        vals = []
        for bwd in (False, True):
            for impl in ("lax", "pallas"):
                try:
                    t = bench_shape(h, w, c, g, impl, bwd) * 1e3
                except Exception as e:
                    print(f"  {h}x{w}x{c}/g{g} impl={impl} bwd={bwd}: FAILED {e}",
                          file=sys.stderr)
                    t = float("nan")
                vals.append(t)
                print(f"  {h}x{w}x{c}/g{g} impl={impl} bwd={bwd}: {t:.3f} ms")
        rows.append(f"| {h}x{w}x{c}/g{g} | {vals[0]:.3f} | {vals[1]:.3f} "
                    f"| {vals[2]:.3f} | {vals[3]:.3f} |")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
