"""Phase 2 of the stem space-to-depth study (see bench_stem_s2d.py): the
explicit s2d transpose costs ~2.5 ms, so fold the repack INTO conv0 instead:
a 6x6/2 conv emitting 2x2 output blocks as channels is exactly an 8x8/4 conv
(pad 2) with scattered weights — (b,640,640,3) -> (b,160,160,128), no
transpose op anywhere. conv1 (3x3/2, 32->64) then reads the blocked layout as
a 2x2/1 conv with asymmetric pad -> native (160,160,64).

Also times the C3(64)@160² stage in an s2d(2) domain (1x1 -> block-diag,
3x3 -> 2x2 block conv) with a 3x3/2 in-domain entry, to see if extending the
domain past the stem pays. Random weights — perf only."""

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


def conv(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def conv_sp(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)

    def W(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape).astype(np.float32)).astype(jnp.bfloat16)

    x = jnp.asarray(rng.uniform(0, 1, (BS, 640, 640, 3)).astype(np.float32)).astype(jnp.bfloat16)

    # ---------- native ----------
    w0 = W(6, 6, 3, 32)
    w1 = W(3, 3, 32, 64)
    cv1 = W(1, 1, 64, 32)
    cv2 = W(1, 1, 64, 32)
    m1 = W(1, 1, 32, 32)
    m2 = W(3, 3, 32, 32)
    cv3 = W(1, 1, 64, 64)
    w3 = W(3, 3, 64, 128)

    def native_stem(xi):
        h = jax.nn.silu(conv(xi, w0, 2))                     # 320² x32
        return jax.nn.silu(conv(h, w1, 2))                   # 160² x64

    def native_c3down(h):
        a = jax.nn.silu(conv(h, cv1))                        # 160² x32
        b = jax.nn.silu(conv(h, cv2))
        m = jax.nn.silu(conv(jax.nn.silu(conv(a, m1)), m2, 1)) + a
        h = jax.nn.silu(conv(jnp.concatenate([m, b], -1), cv3))
        return conv(h, w3, 2)                                # 80² x128

    # ---------- blocked stem: conv0 as 8x8/4 (emits s2d2 of 320²x32) ----------
    w0b = W(8, 8, 3, 128)
    w1x = W(2, 2, 128, 64)        # exit-to-native conv1

    def blocked_stem(xi):
        h = jax.nn.silu(conv_sp(xi, w0b, 4, ((2, 2), (2, 2))))   # 160² x128
        return jax.nn.silu(conv_sp(h, w1x, 1, ((1, 0), (1, 0)))) # 160² x64 native

    # ---------- blocked stem + in-domain C3 ----------
    w1d = W(3, 3, 128, 256)       # in-domain conv1: s2d2(320²x32) -> s2d2(160²x64)
    cv1s = W(1, 1, 256, 128)
    cv2s = W(1, 1, 256, 128)
    m1s = W(1, 1, 128, 128)
    m2s = W(2, 2, 128, 128)
    cv3s = W(1, 1, 256, 256)
    # in-domain exit: native 3x3/2 over 160² reads s2d2 blocks {i-1, i} ->
    # 2x2/1 conv, asym pad (1,0) -> native 80²x128
    w3s = W(2, 2, 256, 128)

    def blocked_chain(xi):
        h = jax.nn.silu(conv_sp(xi, w0b, 4, ((2, 2), (2, 2))))       # 160² x128
        h = jax.nn.silu(conv_sp(h, w1d, 2, ((1, 1), (1, 1))))        # 80² x256
        a = jax.nn.silu(conv(h, cv1s))                               # 80² x128
        b = jax.nn.silu(conv(h, cv2s))
        m = jax.nn.silu(conv_sp(jax.nn.silu(conv(a, m1s)), m2s, 1, ((1, 0), (1, 0)))) + a
        h = jax.nn.silu(conv(jnp.concatenate([m, b], -1), cv3s))     # 80² x256
        return conv_sp(h, w3s, 1, ((1, 0), (1, 0)))                  # 80² x128 native

    def native_full(xi):
        return native_c3down(native_stem(xi))

    def blocked_stem_native_c3(xi):
        return native_c3down(blocked_stem(xi))

    cases = [
        ("native stem only", native_stem),
        ("blocked stem only (8x8/4 + 2x2)", blocked_stem),
        ("native stem+C3+down", native_full),
        ("blocked stem -> native C3+down", blocked_stem_native_c3),
        ("blocked chain (in-domain C3)", blocked_chain),
    ]
    for name, fn in cases:
        @jax.jit
        def loop(xx, iters, fn=fn):
            def body(i, acc):
                xi = xx + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
                return acc + fn(xi).astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        t = slope(lambda n: loop(x, n))
        print(f"{name:36s}: {t * 1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
