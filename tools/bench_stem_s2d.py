"""Measure space-to-depth reformulations of the yolov5 stem convs on TPU.

The HLO cost model + prefix timing (tools/bench_fwd_layers.py) put model_0
(6x6/2 conv, 3ch in) + model_1 (3x3/2, 32ch in) at ~37% of the whole fused
forward — tiny channel counts starve the MXU lanes. Candidates reformulate the
SAME math as denser convs on space-to-depth inputs (weight scatter done
offline). This tool times raw lax formulations (random weights — layout/perf
only); the winner gets an exact weight-transform implementation in nn/common.py.
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

BS = 32


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def slope(run, n1=2, n2=60, repeats=3):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def s2d(x, b):
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // b, w // b, b * b * c)


def conv(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def loopify(fn, x):
    # x flows in as a jit ARGUMENT: closure-captured arrays become giant HLO
    # constants and blow compile time up ~10x (measured 133 s for one conv)
    @jax.jit
    def loop(xx, iters):
        def body(i, acc):
            xi = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            return acc + fn(xi).astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return lambda iters: loop(x, iters)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BS, 640, 640, 3)).astype(np.float32)).astype(jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(0, 0.1, (6, 6, 3, 32)).astype(np.float32)).astype(jnp.bfloat16)

    cases = {}

    # --- conv0 formulations (output (bs,320,320,32) or an s2d repack of it) ---
    cases["conv0 baseline 6x6s2 3ch"] = loopify(lambda xi: conv(xi, w0, 2), x)

    w0_s2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 32)).astype(np.float32)).astype(jnp.bfloat16)
    cases["conv0 s2d2: 3x3s1 12->32"] = loopify(lambda xi: conv(s2d(xi, 2), w0_s2, 1), x)

    w0_s4 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 48, 128)).astype(np.float32)).astype(jnp.bfloat16)
    cases["conv0 s2d4: 3x3s1 48->128"] = loopify(lambda xi: conv(s2d(xi, 4), w0_s4, 1), x)

    w0_s8 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 192, 512)).astype(np.float32)).astype(jnp.bfloat16)
    cases["conv0 s2d8: 3x3s1 192->512"] = loopify(lambda xi: conv(s2d(xi, 8), w0_s8, 1), x)

    # --- conv1 formulations (input (bs,320,320,32), output (bs,160,160,64)) ---
    y = jnp.asarray(rng.uniform(-1, 1, (BS, 320, 320, 32)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 64)).astype(np.float32)).astype(jnp.bfloat16)
    cases["conv1 baseline 3x3s2 32->64"] = loopify(lambda yi: conv(yi, w1, 2), y)

    w1_s2 = jnp.asarray(rng.normal(0, 0.1, (2, 2, 128, 64)).astype(np.float32)).astype(jnp.bfloat16)
    cases["conv1 s2d2: 2x2 128->64 asympad"] = loopify(
        lambda yi: jax.lax.conv_general_dilated(
            s2d(yi, 2), w1_s2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16), y)

    # --- fused stem: s2d4 conv0 -> silu -> 2x2 conv1 (stays in s2d domain) ---
    def stem_fused(xi):
        h = jax.nn.silu(conv(s2d(xi, 4), w0_s4, 1))        # (160,160,128) = s2d2 of conv0 out
        return jax.lax.conv_general_dilated(
            h, w1_s2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
    cases["stem fused s2d4+2x2 (conv0+silu+conv1)"] = loopify(stem_fused, x)

    def stem_baseline(xi):
        return conv(jax.nn.silu(conv(xi, w0, 2)), w1, 2)
    cases["stem baseline (conv0+silu+conv1)"] = loopify(stem_baseline, x)

    for name, loop in cases.items():
        t = slope(loop)
        print(f"{name:42s}: {t * 1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
