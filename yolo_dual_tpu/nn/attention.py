"""Local-window self-attention conv blocks.

Capability parity with reference models/common.py:1509-1627 (AttentionConv:
per-pixel k×k window QKV attention with relative-position embeddings rel_h/
rel_w; AttentionStem: m-branch value mixing for stems). The torch versions
build windows with unfold; here windows come from k² shifted slices of the
padded map, which XLA fuses — no gather/im2col materialization.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _windows(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """NHWC -> (B, H', W', k*k, C) local windows (torch unfold semantics)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    cols = []
    for i in range(k):
        for j in range(k):
            cols.append(xp[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :])
    return jnp.stack(cols, axis=3)  # (B, oh, ow, k*k, C)


class AttentionConv(nn.Module):
    """Window attention: out[p] = Σ_w softmax_w(q·k_w) v_w (reference :1509-1562).

    Args follow the YAML convention [c2, k, s, p, groups]."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    groups: int = 1
    bias: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, k, g = self.c2, self.k, self.groups
        assert c2 % g == 0
        q = nn.Conv(c2, (1, 1), use_bias=self.bias, dtype=self.dtype, name="query_conv")(x)
        kk = nn.Conv(c2, (1, 1), use_bias=self.bias, dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(c2, (1, 1), use_bias=self.bias, dtype=self.dtype, name="value_conv")(x)

        k_win = _windows(kk, k, self.s, self.p)   # (B, H, W, k*k, C)
        v_win = _windows(v, k, self.s, self.p)
        b, oh, ow, kk2, _ = k_win.shape

        # relative position: rel_h added to first half channels (varies along
        # window rows), rel_w to second half (varies along window cols)
        rel_h = self.param("rel_h", nn.initializers.normal(1.0), (k, 1, c2 // 2))
        rel_w = self.param("rel_w", nn.initializers.normal(1.0), (1, k, c2 // 2))
        rel = jnp.concatenate([
            jnp.broadcast_to(rel_h, (k, k, c2 // 2)),
            jnp.broadcast_to(rel_w, (k, k, c2 // 2)),
        ], axis=-1).reshape(1, 1, 1, k * k, c2)
        k_win = k_win + rel.astype(k_win.dtype)

        if self.s > 1:
            q = q[:, ::1, ::1][:, :oh * self.s:self.s, :ow * self.s:self.s]
        q = q[:, :oh, :ow]
        # grouped attention: logits per channel, softmax over window
        logits = q[:, :, :, None, :] * k_win  # (B, H, W, k*k, C)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=3).astype(logits.dtype)
        out = (attn * v_win).sum(axis=3)
        return out


class AttentionStem(nn.Module):
    """Stem attention with m value branches mixed by learned window embeddings
    (reference models/common.py:1565-1627)."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 0
    groups: int = 1
    m: int = 4
    bias: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, k, g, m = self.c2, self.k, self.groups, self.m
        cg = c2 // g
        q = nn.Conv(c2, (1, 1), use_bias=self.bias, dtype=self.dtype, name="query_conv")(x)
        kk = nn.Conv(c2, (1, 1), use_bias=self.bias, dtype=self.dtype, name="key_conv")(x)
        vs = [nn.Conv(c2, (1, 1), use_bias=self.bias, dtype=self.dtype, name=f"value_conv_{i}")(x)
              for i in range(m)]

        emb_a = self.param("emb_a", nn.initializers.normal(1.0), (cg, k))
        emb_b = self.param("emb_b", nn.initializers.normal(1.0), (cg, k))
        emb_mix = self.param("emb_mix", nn.initializers.normal(1.0), (m, cg))
        la = jnp.einsum("mc,ca->ma", emb_mix, emb_a)
        lb = jnp.einsum("mc,cb->mb", emb_mix, emb_b)
        emb = la[:, :, None] + lb[:, None, :]            # (m, k, k)
        emb = jax.nn.softmax(emb.reshape(m, -1), axis=0).reshape(m, 1, 1, 1, k * k, 1)

        k_win = _windows(kk, k, self.s, self.p)
        b, oh, ow, kk2, _ = k_win.shape
        v_win = jnp.stack([_windows(v, k, self.s, self.p) for v in vs], axis=0)  # (m,B,H,W,k*k,C)
        v_win = (emb.astype(v_win.dtype) * v_win).sum(axis=0)

        q = q[:, :oh, :ow]
        logits = q[:, :, :, None, :] * k_win
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=3).astype(logits.dtype)
        return (attn * v_win).sum(axis=3)
