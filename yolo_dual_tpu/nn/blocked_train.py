"""Blocked (space-to-depth) stem for the TRAINING path.

`nn/blocked.py` rewrites the v5 stem into an s2d(2) blocked layout at fuse
time — inference only, because it bakes scattered weights and folded BN into
new parameters. This module brings the same ~2.7× stem speedup to training
while keeping the NATIVE parameter tree (checkpoints, EMA, optimizer state
and torch import/export are all unchanged):

  - every native conv kernel is scattered into its blocked equivalent
    *inside the jitted step* (`jnp` versions of the nn/blocked.py scatters;
    the weights are tiny, so this costs microseconds and autodiff routes the
    kernel gradients back through the scatter — the transpose is a gather),
  - BatchNorm runs block-aware (`BlockedBN`): the 2×2 sub-pixel planes
    partition the native spatial grid exactly, so reducing batch statistics
    over (batch, space, block) per native channel yields bit-identical
    statistics to the native layout (up to float reassociation), and the
    running `batch_stats` keep their native per-channel shape,
  - activations are elementwise and layout-blind.

The math is therefore EXACTLY the native graph's — verified by
tests/test_blocked_train.py for forward, batch-stats updates, and gradients —
only the schedule changes: the 320²/160² stages run as 160²/80² tensors with
4× the channels, which keeps the 128-wide MXU lanes fed (see nn/blocked.py
module docstring for the measured inference numbers).

Reference provenance: the rewritten layers are models/common.py:47-64 (Conv)
and :161-172 (C3) in /root/reference; this lowering has no reference
counterpart (it is TPU-specific scheduling, not a model change).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# ---------------------------------------------------------------------------
# jnp kernel scatters (no bias: BN is separate in training). Sub-pixel packing
# is (pi*2+pj)*c + o throughout, matching nn/blocked.py. Each scatter is ONE
# einsum against a tiny constant 0/1 placement tensor (the placement depends
# only on spatial taps and sub-pixel planes, never on channels) — a single op
# that XLA compiles/partitions quickly, instead of dozens of
# dynamic-update-slices, and whose transpose (the kernel-gradient gather) is
# the same einsum transposed.
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(None)
def _t_stem() -> np.ndarray:
    t = np.zeros((6, 6, 8, 8, 4), np.float32)
    for r in (0, 1):
        for s in (0, 1):
            for u in range(6):
                for v in range(6):
                    t[u, v, 2 * r + u, 2 * s + v, r * 2 + s] = 1.0
    return t


@lru_cache(None)
def _t_3x3(stride: int) -> np.ndarray:
    """Placement for a 3x3 conv over blocks: stride 2 (down_in) or 1 (3x3)."""
    t = np.zeros((3, 3, 3, 3, 4, 4), np.float32)
    for r in (0, 1):
        for s in (0, 1):
            for u in range(3):
                tu = stride * r - 1 + u
                au, pi = tu // 2 + 1, tu % 2
                for v in range(3):
                    tv = stride * s - 1 + v
                    av, pj = tv // 2 + 1, tv % 2
                    t[u, v, au, av, pi * 2 + pj, r * 2 + s] = 1.0
    return t


@lru_cache(None)
def _t_down_out() -> np.ndarray:
    t = np.zeros((3, 3, 2, 2, 4), np.float32)
    for u in range(3):
        au, pi = (u + 1) // 2, (u + 1) % 2
        for v in range(3):
            av, pj = (v + 1) // 2, (v + 1) % 2
            t[u, v, au, av, pi * 2 + pj] = 1.0
    return t


def scatter_stem_j(w: jnp.ndarray) -> jnp.ndarray:
    """(6,6,cin,c) 6x6/2 -> (8,8,cin,4c) 8x8/4 pad 2, output blocked."""
    _, _, cin, c = w.shape
    out = jnp.einsum("uvco,uvabp->abcpo", w, jnp.asarray(_t_stem(), w.dtype))
    return out.reshape(8, 8, cin, 4 * c)


def scatter_down_in_j(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,c,o) 3x3/2 -> (3,3,4c,4o) 3x3/2 pad 1, blocked in and out."""
    _, _, c, o = w.shape
    out = jnp.einsum("uvco,uvabpq->abpcqo", w, jnp.asarray(_t_3x3(2), w.dtype))
    return out.reshape(3, 3, 4 * c, 4 * o)


def scatter_1x1_j(w: jnp.ndarray) -> jnp.ndarray:
    """(1,1,c,o) -> (1,1,4c,4o) block-diagonal."""
    _, _, c, o = w.shape
    out = jnp.einsum("co,pq->pcqo", w[0, 0], jnp.eye(4, dtype=w.dtype))
    return out.reshape(1, 1, 4 * c, 4 * o)


def scatter_3x3_j(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,c,o) stride-1 pad-1 -> (3,3,4c,4o) pad 1, blocked in/out."""
    _, _, c, o = w.shape
    out = jnp.einsum("uvco,uvabpq->abpcqo", w, jnp.asarray(_t_3x3(1), w.dtype))
    return out.reshape(3, 3, 4 * c, 4 * o)


def scatter_concat_1x1_j(w: jnp.ndarray) -> jnp.ndarray:
    """(1,1,2c_,o) over native concat(y1,y2) -> (1,1,8c_,4o) per-part diagonal."""
    _, _, c2_, o = w.shape
    c_ = c2_ // 2
    eye = jnp.eye(4, dtype=w.dtype)
    w1 = jnp.einsum("co,pq->pcqo", w[0, 0, :c_], eye).reshape(4 * c_, 4 * o)
    w2 = jnp.einsum("co,pq->pcqo", w[0, 0, c_:], eye).reshape(4 * c_, 4 * o)
    return jnp.concatenate([w1, w2], axis=0).reshape(1, 1, 8 * c_, 4 * o)


def scatter_down_out_j(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,c,o) 3x3/2, blocked in, NATIVE out -> (2,2,4c,o) /1, pad (1,0)."""
    _, _, c, o = w.shape
    out = jnp.einsum("uvco,uvabp->abpco", w, jnp.asarray(_t_down_out(), w.dtype))
    return out.reshape(2, 2, 4 * c, o)


# kind -> (scatter fn, strides, padding)
_KINDS = {
    "stem": (scatter_stem_j, (4, 4), ((2, 2), (2, 2))),
    "down_in": (scatter_down_in_j, (2, 2), ((1, 1), (1, 1))),
    "one": (scatter_1x1_j, (1, 1), ((0, 0), (0, 0))),
    "three": (scatter_3x3_j, (1, 1), ((1, 1), (1, 1))),
    "concat": (scatter_concat_1x1_j, (1, 1), ((0, 0), (0, 0))),
    "down_out": (scatter_down_out_j, (1, 1), ((1, 0), (1, 0))),
}


class _Kernel(nn.Module):
    """Declares the NATIVE conv kernel param (name 'conv'/'kernel', same path,
    shape, and initializer as flax nn.Conv in the native graph, so init RNG
    streams and checkpoints are identical)."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class BlockedBN(nn.Module):
    """BatchNorm over a blocked tensor with NATIVE per-channel params/stats.

    Input channels are laid out block-major: index = p*c + o for sub-pixel
    plane p in [0,4) and native channel o. The 4 planes partition the native
    spatial grid, so per-(o) statistics reduced over (batch, space, plane)
    equal the native BatchNorm's statistics exactly. Matches flax
    nn.BatchNorm semantics (f32 stats, E[x²]-µ² variance, running update
    ra = m*ra + (1-m)*batch) with the repo's _BN_CTX eps/momentum profile
    and f32 normalize precision (see nn/common.py batch_norm)."""

    c: int
    blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_dual_tpu.nn.common import _BN_CTX
        eps, mom = _BN_CTX["eps"], _BN_CTX["momentum"]
        scale = self.param("scale", nn.initializers.ones, (self.c,))
        bias = self.param("bias", nn.initializers.zeros, (self.c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((self.c,), jnp.float32), None)
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((self.c,), jnp.float32), None)
        if train:
            xf = x.astype(jnp.float32)
            xr = xf.reshape(xf.shape[:-1] + (self.blocks, self.c))
            axes = tuple(range(xr.ndim - 1))
            m = xr.mean(axes)
            v = (xr * xr).mean(axes) - m * m
            if not self.is_initializing():
                ra_mean.value = mom * ra_mean.value + (1.0 - mom) * m
                ra_var.value = mom * ra_var.value + (1.0 - mom) * v
        else:
            m, v = ra_mean.value, ra_var.value
        mul = scale.astype(jnp.float32) * jax.lax.rsqrt(v + eps)
        y = (x.astype(jnp.float32) - jnp.tile(m, self.blocks)) * jnp.tile(mul, self.blocks) \
            + jnp.tile(bias.astype(jnp.float32), self.blocks)
        return y.astype(x.dtype)


class BlockedConvBN(nn.Module):
    """One native Conv(+BN+act) evaluated in the blocked layout: scatter the
    native kernel to its blocked equivalent (inside jit — differentiable),
    conv on the half-resolution 4c tensor, block-aware BN, activation."""

    native_shape: Tuple[int, int, int, int]   # (kh, kw, cin_native, cout_native)
    kind: str                                  # key into _KINDS
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_dual_tpu.nn.common import batch_norm, resolve_act
        scatter, strides, padding = _KINDS[self.kind]
        w = _Kernel(self.native_shape, name="conv")()
        wb = scatter(w)
        x, wb = nn.dtypes.promote_dtype(x, wb, dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, wb.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, wb, strides, padding, dimension_numbers=dn)
        if self.kind == "down_out":   # native-layout output: plain BN
            y = batch_norm(train)(y).astype(y.dtype)
        else:
            y = BlockedBN(self.native_shape[-1], name="bn")(y, train).astype(y.dtype)
        return resolve_act(self.act)(y)


class BlockedBottleneck(nn.Module):
    """Native Bottleneck(shortcut=True, g=1, e=1.0) in the blocked layout."""

    c: int                                     # native channels (in == out)
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BlockedConvBN((1, 1, self.c, self.c), "one", act=self.act,
                          dtype=self.dtype, name="cv1")(x, train)
        y = BlockedConvBN((3, 3, self.c, self.c), "three", act=self.act,
                          dtype=self.dtype, name="cv2")(y, train)
        return x + y


class BlockedC3(nn.Module):
    """Native C3(shortcut=True, g=1, e=0.5) in the blocked layout."""

    c2: int                                    # native out channels
    c_in: int                                  # native in channels
    n: int = 1
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * 0.5)
        y1 = BlockedConvBN((1, 1, self.c_in, c_), "one", act=self.act,
                           dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = BlockedBottleneck(c_, act=self.act, dtype=self.dtype,
                                   name=f"m_{i}")(y1, train)
        y2 = BlockedConvBN((1, 1, self.c_in, c_), "one", act=self.act,
                           dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return BlockedConvBN((1, 1, 2 * c_, self.c2), "concat", act=self.act,
                             dtype=self.dtype, name="cv3")(y, train)


def build_blocked_layer(layer, ch_in: int, prev_c2: Tuple[int, ...], dtype, name: str,
                        remat: bool = False):
    """Blocked module for stem layer `layer.i` in [0, 3]. `prev_c2[i]` is the
    native output channel count of layer i; `ch_in` the image channels.
    ``remat=True`` wraps the module in nn.remat (per-layer activation
    rematerialization for the HBM-bound train step)."""
    import flax.linen as nn
    kw = dict(layer.kwargs)
    act = kw.get("act", True)
    i = layer.i

    def cls(c):
        return nn.remat(c, static_argnums=(2,)) if remat else c

    if i == 0:
        return cls(BlockedConvBN)((6, 6, ch_in, kw["c2"]), "stem", act=act,
                                  dtype=dtype, name=name)
    if i == 1:
        return cls(BlockedConvBN)((3, 3, prev_c2[0], kw["c2"]), "down_in", act=act,
                                  dtype=dtype, name=name)
    if i == 2:
        return cls(BlockedC3)(kw["c2"], prev_c2[1], n=int(kw.get("n", 1)), act=act,
                              dtype=dtype, name=name)
    if i == 3:
        return cls(BlockedConvBN)((3, 3, prev_c2[2], kw["c2"]), "down_out", act=act,
                                  dtype=dtype, name=name)
    raise ValueError(f"layer {i} is not part of the blocked stem")
