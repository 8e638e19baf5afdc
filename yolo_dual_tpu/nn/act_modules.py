"""Parameterized activation modules.

Capability parity with reference utils/activations.py:11-103: the
function-style activations (SiLU/Hardswish/Mish) live in nn/activations.py
(XLA fuses them; no "memory-efficient" variants needed); the ones below carry
parameters and are modules: FReLU (funnel activation with a depthwise conv),
AconC and MetaAconC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class FReLU(nn.Module):
    """Funnel ReLU: max(x, depthwise_conv_bn(x)) (reference utils/activations.py:45-55)."""

    k: int = 3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p = self.k // 2
        t = nn.Conv(c, (self.k, self.k), padding=((p, p), (p, p)), feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        t = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(t).astype(t.dtype)
        return jnp.maximum(x, t)


class AconC(nn.Module):
    """ACON-C: (p1−p2)·x·σ(β·(p1−p2)·x) + p2·x with learnable p1,p2,β
    (reference utils/activations.py:58-71)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, c))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, c))
        beta = self.param("beta", nn.initializers.ones, (1, 1, 1, c))
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x


class MetaAconC(nn.Module):
    """Meta-ACON: β generated per-sample by a small channel bottleneck
    (reference utils/activations.py:74-103)."""

    r: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c_mid = max(self.r, c // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, c))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, c))
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(c_mid, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(y)
        y = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(y)
        beta = jax.nn.sigmoid(y)
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x
