"""Blocked-layout (space-to-depth) rewrite of the yolov5 stem for TPU inference.

The first four layers of the v5 family — Conv(6x6/2, 3ch in) -> Conv(3x3/2)
-> C3 -> Conv(3x3/2) — run at 320²/160² with 16-64 channels: far below the
128-lane vector width, so the MXU runs at a few percent utilization and these
layers dominate the fused forward (measured 8.6 of 13.9 ms at bs32@640;
tools/bench_fwd_layers.py, tools/bench_stem_s2d*.py).

The rewrite keeps EXACTLY the same math but carries every 160²-resolution
tensor in an s2d(2) "blocked" layout — (h, w, c) as (h/2, w/2, 4c), channel
index (pi*2+pj)*c + o for the 2x2 sub-pixel (pi, pj):

  - conv0 (6x6/4->s2d out) becomes a single 8x8/4 conv emitting the blocked
    layout directly from the raw image (no transpose op anywhere),
  - 1x1 convs become block-diagonal 1x1 convs (4c in, 4c out),
  - 3x3 convs become 3x3 convs over blocks with half-zero weights,
  - the stride-2 convs entering/leaving the domain become 3x3/2 (pad 1) and
    2x2/1 (pad (1,0)) block convs,

all with weights scattered (zeros elsewhere) from the original kernels at
fuse time, so outputs match the native graph bit-for-bit up to float
reassociation. Measured 8.13 -> ~3.0 ms for the stem+C3+down chain at
bs32@640 (tools/bench_stem_s2d2.py).

This is an inference-only transform applied by BaseModel.fuse() after
conv+BN folding; training keeps the native graph. Reference provenance: the
layers being rewritten are models/common.py:47-64 (Conv) and :161-172 (C3)
in /root/reference — the rewrite is a TPU-specific lowering, not a model
change (cf. Ultralytics' historical Focus<->6x6-conv equivalence, reversed:
here the 6x6 conv becomes a space-to-depth form because TPU lanes, not GPU
memory coalescing, set the constraint).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


def _kw(layer) -> dict:
    return dict(layer.kwargs)


def eligible(spec) -> bool:
    """True when layers 0-3 are the v5 stem pattern this rewrite understands."""
    ls = spec.layers
    if len(ls) < 5:
        return False
    l0, l1, l2, l3 = ls[0], ls[1], ls[2], ls[3]
    k0, k1, k2, k3 = _kw(l0), _kw(l1), _kw(l2), _kw(l3)
    ok = (
        l0.name == "Conv" and k0.get("k") == 6 and k0.get("s") == 2
        and k0.get("p") == 2 and k0.get("g", 1) == 1 and k0.get("d", 1) == 1
        and l0.f == -1 and l0.n == 1
        and l1.name == "Conv" and k1.get("k") == 3 and k1.get("s") == 2
        and k1.get("p") in (None, 1) and k1.get("g", 1) == 1 and l1.f == -1 and l1.n == 1
        and l2.name == "C3" and l2.f == -1 and l2.n == 1
        and k2.get("shortcut", True) is True and k2.get("g", 1) == 1
        and float(k2.get("e", 0.5)) == 0.5
        and l3.name == "Conv" and k3.get("k") == 3 and k3.get("s") == 2
        and k3.get("p") in (None, 1) and k3.get("g", 1) == 1 and l3.f == -1 and l3.n == 1
        and not any(i in spec.save for i in (0, 1, 2))
    )
    return bool(ok)


def rewrite_spec(spec):
    """Return a copy of `spec` whose layers 0-3 are the blocked equivalents."""
    ls = list(spec.layers)
    l0, l1, l2, l3 = ls[0], ls[1], ls[2], ls[3]
    k0, k1, k2, k3 = _kw(l0), _kw(l1), _kw(l2), _kw(l3)
    c0, c1, c2 = k0["c2"], k1["c2"], k2["c2"]

    def mk(layer, name, kw, c2_new):
        kwargs = tuple(sorted(kw.items(), key=lambda p: p[0]))
        return dataclasses.replace(layer, name=name, kwargs=kwargs, c2=c2_new)

    def carry_act(src, kw):
        if "act" in src:
            kw["act"] = src["act"]
        return kw

    ls[0] = mk(l0, "Conv", carry_act(k0, dict(c2=4 * c0, k=8, s=4, p=2)), 4 * c0)
    ls[1] = mk(l1, "Conv", carry_act(k1, dict(c2=4 * c1, k=3, s=2, p=1)), 4 * c1)
    ls[2] = mk(l2, "C3", carry_act(k2, dict(c2=4 * c2, n=k2.get("n", 1))), 4 * c2)
    ls[3] = mk(l3, "Conv", carry_act(k3, dict(c2=k3["c2"], k=2, s=1,
                                              p=((1, 0), (1, 0)))), k3["c2"])
    return dataclasses.replace(spec, layers=tuple(ls))


# ---------------------------------------------------------------------------
# Weight scatters. All take fused (kernel HWIO, bias) numpy arrays and return
# the blocked equivalents. Sub-pixel packing is (pi*2+pj)*c + o throughout.
# ---------------------------------------------------------------------------

def scatter_stem(w: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(6,6,cin,c) 6x6/2 -> (8,8,cin,4c) 8x8/4 pad 2, output blocked."""
    _, _, cin, c = w.shape
    out = np.zeros((8, 8, cin, 4, c), w.dtype)
    for r in (0, 1):
        for s in (0, 1):
            out[2 * r:2 * r + 6, 2 * s:2 * s + 6, :, r * 2 + s, :] = w
    return out.reshape(8, 8, cin, 4 * c), np.tile(b, 4)


def scatter_down_in(w: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(3,3,c,o) 3x3/2, blocked in AND out -> (3,3,4c,4o) 3x3/2 pad 1 on blocks."""
    _, _, c, o = w.shape
    out = np.zeros((3, 3, 4, c, 4, o), w.dtype)
    for r in (0, 1):
        for s in (0, 1):
            for u in range(3):
                tu = 2 * r - 1 + u
                au, pi = tu // 2 + 1, tu % 2
                for v in range(3):
                    tv = 2 * s - 1 + v
                    av, pj = tv // 2 + 1, tv % 2
                    out[au, av, pi * 2 + pj, :, r * 2 + s, :] = w[u, v]
    return out.reshape(3, 3, 4 * c, 4 * o), np.tile(b, 4)


def scatter_1x1(w: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(1,1,c,o) -> (1,1,4c,4o) block-diagonal."""
    _, _, c, o = w.shape
    out = np.zeros((1, 1, 4, c, 4, o), w.dtype)
    for p in range(4):
        out[0, 0, p, :, p, :] = w[0, 0]
    return out.reshape(1, 1, 4 * c, 4 * o), np.tile(b, 4)


def scatter_3x3(w: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(3,3,c,o) stride-1 pad-1, blocked in/out -> (3,3,4c,4o) pad 1 on blocks."""
    _, _, c, o = w.shape
    out = np.zeros((3, 3, 4, c, 4, o), w.dtype)
    for r in (0, 1):
        for s in (0, 1):
            for u in range(3):
                tu = r - 1 + u
                au, pi = tu // 2 + 1, tu % 2
                for v in range(3):
                    tv = s - 1 + v
                    av, pj = tv // 2 + 1, tv % 2
                    out[au, av, pi * 2 + pj, :, r * 2 + s, :] = w[u, v]
    return out.reshape(3, 3, 4 * c, 4 * o), np.tile(b, 4)


def scatter_concat_1x1(w: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """C3.cv3: native input concat(y1(c_), y2(c_)); blocked input is
    concat(y1_blk(4c_), y2_blk(4c_)) -> (1,1,8c_,4o) with per-part diagonals."""
    _, _, c2_, o = w.shape
    c_ = c2_ // 2
    out = np.zeros((1, 1, 8 * c_, 4, o), w.dtype)
    for p in range(4):
        out[0, 0, p * c_:(p + 1) * c_, p, :] = w[0, 0, :c_]
        out[0, 0, 4 * c_ + p * c_:4 * c_ + (p + 1) * c_, p, :] = w[0, 0, c_:]
    return out.reshape(1, 1, 8 * c_, 4 * o), np.tile(b, 4)


def scatter_down_out(w: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(3,3,c,o) 3x3/2, blocked in, NATIVE out -> (2,2,4c,o) /1, pad (1,0)."""
    _, _, c, o = w.shape
    out = np.zeros((2, 2, 4, c, o), w.dtype)
    for u in range(3):
        au, pi = (u + 1) // 2, (u + 1) % 2
        for v in range(3):
            av, pj = (v + 1) // 2, (v + 1) % 2
            out[au, av, pi * 2 + pj, :, :] = w[u, v]
    return out.reshape(2, 2, 4 * c, o), b


def rewrite_variables(variables: dict, spec) -> dict:
    """Rewrite fused (conv+BN folded) variables for the blocked spec. `spec`
    is the ORIGINAL spec (used for the C3 repeat count)."""
    import copy

    import jax.numpy as jnp

    k2 = _kw(spec.layers[2])
    n_inner = int(k2.get("n", 1))

    variables = copy.deepcopy(variables)
    params = variables["params"]

    def swap(tree, fn):
        w = np.asarray(tree["conv"]["kernel"], np.float32)
        b = np.asarray(tree["conv"]["bias"], np.float32)
        w2, b2 = fn(w, b)
        tree["conv"]["kernel"] = jnp.asarray(w2)
        tree["conv"]["bias"] = jnp.asarray(b2)

    swap(params["model_0"], scatter_stem)
    swap(params["model_1"], scatter_down_in)
    c3 = params["model_2"]
    swap(c3["cv1"], scatter_1x1)
    swap(c3["cv2"], scatter_1x1)
    for i in range(n_inner):
        swap(c3[f"m_{i}"]["cv1"], scatter_1x1)
        swap(c3[f"m_{i}"]["cv2"], scatter_3x3)
    swap(c3["cv3"], scatter_concat_1x1)
    swap(params["model_3"], scatter_down_out)
    return variables
