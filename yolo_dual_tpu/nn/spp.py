"""Extra spatial-pyramid-pooling zoo.

Capability parity with the reference's SPP extras (reference
models/common.py:1275-1492: SimConv/SimSPPF from YOLOv6, ASPP, BasicConv/RFB,
SPPCSPC/SPPCSPC_group from YOLOv7, SimCSPSPPF from YOLOv6 v0.3), selected via
the `models/SPP/*.yaml` config family.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from yolo_dual_tpu.nn.common import Conv, max_pool_same, resize_bilinear

Dtype = Any


class SimConv(Conv):
    """Conv+BN+ReLU (reference models/common.py:1292-1313)."""

    act: Any = "relu"


class SimSPPF(nn.Module):
    """SPPF with ReLU convs (reference models/common.py:1315-1331)."""

    c2: int
    k: int = 5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = SimConv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return SimConv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([x, y1, y2, y3], -1), train)


class ASPP(nn.Module):
    """Atrous SPP, BN-free raw convs with bias + image-pool branch
    (reference models/common.py:1336-1363)."""

    c2: int = 256
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        img = x.mean(axis=(1, 2), keepdims=True)
        img = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv")(img)
        img = resize_bilinear(img, size)
        b1 = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="atrous1")(x)
        bs = [img, b1]
        for rate in (6, 12, 18):
            bs.append(nn.Conv(self.c2, (3, 3), padding=((rate, rate), (rate, rate)),
                              kernel_dilation=(rate, rate), dtype=self.dtype, name=f"atrous{rate}")(x))
        return nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="out")(jnp.concatenate(bs, -1))


class BasicConv(nn.Module):
    """Conv with optional BN (eps 1e-5) and optional ReLU (reference models/common.py:1366-1384)."""

    c2: int
    k: Any = 1
    s: int = 1
    p: Any = 0
    d: int = 1
    g: int = 1
    relu: bool = True
    bn: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.k, self.k) if isinstance(self.k, int) else tuple(self.k)
        p = (self.p, self.p) if isinstance(self.p, int) else tuple(self.p)
        x = nn.Conv(self.c2, k, strides=(self.s, self.s),
                    padding=((p[0], p[0]), (p[1], p[1])),
                    kernel_dilation=(self.d, self.d), feature_group_count=self.g,
                    use_bias=not self.bn, dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5,
                             dtype=jnp.float32, name="bn")(x).astype(x.dtype)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class RFB(nn.Module):
    """Receptive-field block (reference models/common.py:1386-1427)."""

    c2: int
    stride: int = 1
    scale: float = 0.1
    map_reduce: int = 8
    vision: int = 1
    groups: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        ip = c1 // self.map_reduce
        g, v, s = self.groups, self.vision, self.stride

        b0 = BasicConv(ip, 1, 1, g=g, relu=False, dtype=self.dtype, name="b0_0")(x, train)
        b0 = BasicConv(2 * ip, 3, s, 1, g=g, dtype=self.dtype, name="b0_1")(b0, train)
        b0 = BasicConv(2 * ip, 3, 1, v + 1, d=v + 1, relu=False, g=g, dtype=self.dtype, name="b0_2")(b0, train)

        b1 = BasicConv(ip, 1, 1, g=g, relu=False, dtype=self.dtype, name="b1_0")(x, train)
        b1 = BasicConv(2 * ip, 3, s, 1, g=g, dtype=self.dtype, name="b1_1")(b1, train)
        b1 = BasicConv(2 * ip, 3, 1, v + 2, d=v + 2, relu=False, g=g, dtype=self.dtype, name="b1_2")(b1, train)

        b2 = BasicConv(ip, 1, 1, g=g, relu=False, dtype=self.dtype, name="b2_0")(x, train)
        b2 = BasicConv((ip // 2) * 3, 3, 1, 1, g=g, dtype=self.dtype, name="b2_1")(b2, train)
        b2 = BasicConv(2 * ip, 3, s, 1, g=g, dtype=self.dtype, name="b2_2")(b2, train)
        b2 = BasicConv(2 * ip, 3, 1, v + 4, d=v + 4, relu=False, g=g, dtype=self.dtype, name="b2_3")(b2, train)

        out = BasicConv(self.c2, 1, 1, relu=False, dtype=self.dtype, name="linear")(
            jnp.concatenate([b0, b1, b2], -1), train)
        short = BasicConv(self.c2, 1, s, relu=False, dtype=self.dtype, name="shortcut")(x, train)
        return jax.nn.relu(out * self.scale + short)


class SPPCSPC(nn.Module):
    """YOLOv7 CSP-SPP (reference models/common.py:1430-1448)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: Sequence[int] = (5, 9, 13)
    groups: int = 1  # SPPCSPC_group sets 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        g = self.groups
        x1 = Conv(c_, 1, 1, g=g, dtype=self.dtype, name="cv1")(x, train)
        x1 = Conv(c_, 3, 1, g=g, dtype=self.dtype, name="cv3")(x1, train)
        x1 = Conv(c_, 1, 1, g=g, dtype=self.dtype, name="cv4")(x1, train)
        pools = [x1] + [max_pool_same(x1, k) for k in self.k]
        y1 = Conv(c_, 1, 1, g=g, dtype=self.dtype, name="cv5")(jnp.concatenate(pools, -1), train)
        y1 = Conv(c_, 3, 1, g=g, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c_, 1, 1, g=g, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, g=g, dtype=self.dtype, name="cv7")(jnp.concatenate([y1, y2], -1), train)


class SPPCSPC_group(SPPCSPC):
    groups: int = 4


class SimCSPSPPF(nn.Module):
    """YOLOv6 v0.3 CSP-SPPF (reference models/common.py:1478-1498)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: int = 5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv3")(x1, train)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv4")(x1, train)
        x2 = max_pool_same(x1, self.k)
        x3 = max_pool_same(x2, self.k)
        x4 = max_pool_same(x3, self.k)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate([x1, x2, x3, x4], -1), train)
        y1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv7")(jnp.concatenate([y1, y2], -1), train)
