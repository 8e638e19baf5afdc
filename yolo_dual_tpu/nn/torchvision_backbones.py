"""Torchvision-architecture backbone stages, native Flax.

Capability parity with reference models/common.py:866-1273: 12 torchvision
models each chopped into 3 sequential stage modules (<name>1/2/3) so the YAML
graph can tap three feature scales. The reference slices a live torchvision
model; here each architecture is implemented natively (NHWC) with the same
structure and stage boundaries:

  resnet18/34/50, wide_resnet50_2 : children[:6] / [6] / [7]
  mobilenet_v3_small              : features[:4] / [4:9] / [9:]
  efficientnet_b0 / b1            : features[:4] / [4:6] / [6:]
  efficientnet_v2_s               : features[:4] / [4:6] / [6:]
  mobilenet_v2                    : features[:7] / [7:14] / [14:19]
  vgg11_bn                        : features[:14] / [14:21] / [21:28]
  convnext_tiny                   : features[:4] / [4:6] / [6:]
  regnet_y_400mf                  : stem+trunk[:2] / trunk[2] / trunk[3]

BatchNorm hyperparameters follow each torchvision family (mnv3/efficientnet:
eps 1e-3 momentum 0.01; others: torch defaults).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _bn(train, eps=1e-5, momentum=0.9, name="bn"):
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=eps, dtype=jnp.float32, name=name)


def _conv(c, k, s=1, p=None, g=1, bias=False, dtype=None, name="conv"):
    p = k // 2 if p is None else p
    return nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                   feature_group_count=g, use_bias=bias, dtype=dtype, name=name)


def _maxpool(x, k, s, p):
    return nn.max_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


class SqueezeExcite(nn.Module):
    """SE block; `squeeze_ch` is the bottleneck width; gate is sigmoid or
    hardsigmoid depending on family."""

    squeeze_ch: int
    gate: str = "sigmoid"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_ch, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.hard_sigmoid(s) if self.gate == "hard" else jax.nn.sigmoid(s)
        return x * s


# ---------------------------------------------------------------------------
# ResNet family
# ---------------------------------------------------------------------------


class TVBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        y = _conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, name="bn1")(y).astype(y.dtype)
        y = jax.nn.relu(y)
        y = _conv(self.planes, 3, 1, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, name="bn2")(y).astype(y.dtype)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _conv(self.planes, 1, self.stride, 0, dtype=self.dtype, name="down_conv")(x)
            x = _bn(train, name="down_bn")(x).astype(y.dtype)
        return jax.nn.relu(x + y)


class TVBottleneck(nn.Module):
    planes: int           # mid width
    out: int              # planes * 4
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        y = _conv(self.planes, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(_bn(train, name="bn1")(y).astype(y.dtype))
        y = _conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(_bn(train, name="bn2")(y).astype(y.dtype))
        y = _conv(self.out, 1, 1, 0, dtype=self.dtype, name="conv3")(y)
        y = _bn(train, name="bn3")(y).astype(y.dtype)
        if self.stride != 1 or x.shape[-1] != self.out:
            x = _conv(self.out, 1, self.stride, 0, dtype=self.dtype, name="down_conv")(x)
            x = _bn(train, name="down_bn")(x).astype(y.dtype)
        return jax.nn.relu(x + y)


class _ResNetStage(nn.Module):
    """One of the 3 YAML stages for a resnet-family backbone."""

    arch: str            # resnet18 | resnet34 | resnet50 | wide_resnet50_2
    stage: int           # 1, 2, 3
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfgs = {
            "resnet18": ("basic", [2, 2, 2, 2], 64),
            "resnet34": ("basic", [3, 4, 6, 3], 64),
            "resnet50": ("bottleneck", [3, 4, 6, 3], 64),
            "wide_resnet50_2": ("bottleneck", [3, 4, 6, 3], 128),
        }
        kind, depths, width = cfgs[self.arch]

        def layer(x, idx, stride):
            mid = width * (2 ** idx)          # bottleneck mid width (64- or 128-base)
            out = mid if kind == "basic" else 256 * (2 ** idx)  # expansion x4 on 64-base
            for bi in range(depths[idx]):
                s = stride if bi == 0 else 1
                if kind == "basic":
                    x = TVBasicBlock(out, s, self.dtype, name=f"layer{idx + 1}_{bi}")(x, train)
                else:
                    x = TVBottleneck(mid, out, s, self.dtype, name=f"layer{idx + 1}_{bi}")(x, train)
            return x

        if self.stage == 1:
            x = _conv(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
            x = jax.nn.relu(_bn(train, name="bn1")(x).astype(x.dtype))
            x = _maxpool(x, 3, 2, 1)
            x = layer(x, 0, 1)
            x = layer(x, 1, 2)
        elif self.stage == 2:
            x = layer(x, 2, 2)
        else:
            x = layer(x, 3, 2)
        return x


# ---------------------------------------------------------------------------
# MobileNetV2 / V3
# ---------------------------------------------------------------------------


class InvertedResidualV2(nn.Module):
    c2: int
    stride: int
    expand: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        hid = cin * self.expand
        y = x
        if self.expand != 1:
            y = _conv(hid, 1, 1, 0, dtype=self.dtype, name="pw")(y)
            y = jax.nn.relu6(_bn(train, name="pw_bn")(y).astype(y.dtype))
        y = _conv(hid, 3, self.stride, g=hid, dtype=self.dtype, name="dw")(y)
        y = jax.nn.relu6(_bn(train, name="dw_bn")(y).astype(y.dtype))
        y = _conv(self.c2, 1, 1, 0, dtype=self.dtype, name="proj")(y)
        y = _bn(train, name="proj_bn")(y).astype(y.dtype)
        return x + y if (self.stride == 1 and cin == self.c2) else y


class InvertedResidualV3(nn.Module):
    c2: int
    k: int
    stride: int
    exp_ch: int
    use_se: bool
    act: str  # 'relu' | 'hard'
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        a = jax.nn.relu if self.act == "relu" else jax.nn.hard_swish
        y = x
        if self.exp_ch != cin:
            y = _conv(self.exp_ch, 1, 1, 0, dtype=self.dtype, name="pw")(y)
            y = a(_bn(train, 1e-3, 0.99, name="pw_bn")(y).astype(y.dtype))
        y = _conv(self.exp_ch, self.k, self.stride, g=self.exp_ch, dtype=self.dtype, name="dw")(y)
        y = a(_bn(train, 1e-3, 0.99, name="dw_bn")(y).astype(y.dtype))
        if self.use_se:
            sq = max(8, (self.exp_ch // 4 + 4) // 8 * 8)
            y = SqueezeExcite(sq, "hard", self.dtype, name="se")(y)
        y = _conv(self.c2, 1, 1, 0, dtype=self.dtype, name="proj")(y)
        y = _bn(train, 1e-3, 0.99, name="proj_bn")(y).astype(y.dtype)
        return x + y if (self.stride == 1 and cin == self.c2) else y


# mobilenet_v3_small feature config: (k, exp, out, se, act, stride)
MNV3_SMALL = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hard", 2),
    (5, 240, 40, True, "hard", 1),
    (5, 240, 40, True, "hard", 1),
    (5, 120, 48, True, "hard", 1),
    (5, 144, 48, True, "hard", 1),
    (5, 288, 96, True, "hard", 2),
    (5, 576, 96, True, "hard", 1),
    (5, 576, 96, True, "hard", 1),
]

# mobilenet_v2 features 1..17: (expand, out, stride)
MNV2 = [
    (1, 16, 1),
    (6, 24, 2), (6, 24, 1),
    (6, 32, 2), (6, 32, 1), (6, 32, 1),
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
    (6, 96, 1), (6, 96, 1), (6, 96, 1),
    (6, 160, 2), (6, 160, 1), (6, 160, 1),
    (6, 320, 1),
]


class _MNV3Stage(nn.Module):
    stage: int
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hs = jax.nn.hard_swish
        if self.stage == 1:  # features[:4] = stem + blocks 0..2
            x = _conv(16, 3, 2, dtype=self.dtype, name="stem")(x)
            x = hs(_bn(train, 1e-3, 0.99, name="stem_bn")(x).astype(x.dtype))
            blocks = MNV3_SMALL[:3]
            start = 0
        elif self.stage == 2:  # features[4:9] = blocks 3..7
            blocks = MNV3_SMALL[3:8]
            start = 3
        else:                  # features[9:] = blocks 8..10 + 1x1 conv 576
            blocks = MNV3_SMALL[8:]
            start = 8
        for i, (k, e, c, se, act, s) in enumerate(blocks):
            x = InvertedResidualV3(c, k, s, e, se, act, self.dtype,
                                   name=f"block{start + i}")(x, train)
        if self.stage == 3:
            x = _conv(576, 1, 1, 0, dtype=self.dtype, name="head")(x)
            x = hs(_bn(train, 1e-3, 0.99, name="head_bn")(x).astype(x.dtype))
        return x


class _MNV2Stage(nn.Module):
    stage: int
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stage == 1:  # features[:7] = stem + IR 1..6
            x = _conv(32, 3, 2, dtype=self.dtype, name="stem")(x)
            x = jax.nn.relu6(_bn(train, name="stem_bn")(x).astype(x.dtype))
            blocks, start = MNV2[:6], 0
        elif self.stage == 2:  # features[7:14] = IR 7..13
            blocks, start = MNV2[6:13], 6
        else:                  # features[14:19] = IR 14..17 + conv 1280
            blocks, start = MNV2[13:], 13
        for i, (e, c, s) in enumerate(blocks):
            x = InvertedResidualV2(c, s, e, self.dtype, name=f"block{start + i}")(x, train)
        if self.stage == 3:
            x = _conv(1280, 1, 1, 0, dtype=self.dtype, name="head")(x)
            x = jax.nn.relu6(_bn(train, name="head_bn")(x).astype(x.dtype))
        return x


# ---------------------------------------------------------------------------
# EfficientNet B0/B1 and V2-S
# ---------------------------------------------------------------------------


class MBConv(nn.Module):
    c2: int
    k: int
    stride: int
    expand: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        hid = cin * self.expand
        y = x
        if self.expand != 1:
            y = _conv(hid, 1, 1, 0, dtype=self.dtype, name="pw")(y)
            y = jax.nn.silu(_bn(train, 1e-3, 0.99, name="pw_bn")(y).astype(y.dtype))
        y = _conv(hid, self.k, self.stride, g=hid, dtype=self.dtype, name="dw")(y)
        y = jax.nn.silu(_bn(train, 1e-3, 0.99, name="dw_bn")(y).astype(y.dtype))
        y = SqueezeExcite(max(1, cin // 4), "sigmoid", self.dtype, name="se")(y)
        y = _conv(self.c2, 1, 1, 0, dtype=self.dtype, name="proj")(y)
        y = _bn(train, 1e-3, 0.99, name="proj_bn")(y).astype(y.dtype)
        return x + y if (self.stride == 1 and cin == self.c2) else y


class FusedMBConv(nn.Module):
    c2: int
    k: int
    stride: int
    expand: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        hid = cin * self.expand
        y = x
        if self.expand != 1:
            y = _conv(hid, self.k, self.stride, dtype=self.dtype, name="fused")(y)
            y = jax.nn.silu(_bn(train, 1e-3, 0.99, name="fused_bn")(y).astype(y.dtype))
            y = _conv(self.c2, 1, 1, 0, dtype=self.dtype, name="proj")(y)
            y = _bn(train, 1e-3, 0.99, name="proj_bn")(y).astype(y.dtype)
        else:
            y = _conv(self.c2, self.k, self.stride, dtype=self.dtype, name="fused")(y)
            y = jax.nn.silu(_bn(train, 1e-3, 0.99, name="fused_bn")(y).astype(y.dtype))
        return x + y if (self.stride == 1 and cin == self.c2) else y


# efficientnet-b0 stages: (expand, c, repeats, stride, k); b1 repeats differ
EFF_B0 = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
          (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]
EFF_B1 = [(1, 16, 2, 1, 3), (6, 24, 3, 2, 3), (6, 40, 3, 2, 5), (6, 80, 4, 2, 3),
          (6, 112, 4, 1, 5), (6, 192, 5, 2, 5), (6, 320, 2, 1, 3)]
# efficientnet_v2_s: (block, expand, c, repeats, stride, k)
EFF_V2S = [("fused", 1, 24, 2, 1, 3), ("fused", 4, 48, 4, 2, 3),
           ("fused", 4, 64, 4, 2, 3), ("mb", 4, 128, 6, 2, 3),
           ("mb", 6, 160, 9, 1, 3), ("mb", 6, 256, 15, 2, 3)]


class _EffStage(nn.Module):
    arch: str   # b0 | b1 | v2s
    stage: int
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = {"b0": EFF_B0, "b1": EFF_B1, "v2s": EFF_V2S}[self.arch]
        stem_ch = {"b0": 32, "b1": 32, "v2s": 24}[self.arch]
        head_ch = 1280
        # feature index -> stage slicing: features[0]=stem, features[1..n]=stages,
        # features[-1]=head conv. [:4] -> stem+stages0..2; [4:6] -> stages 3..4;
        # [6:] -> stages 5..(+head)
        groups = {1: (0, 3), 2: (3, 5), 3: (5, len(cfg))}[self.stage]
        if self.stage == 1:
            x = _conv(stem_ch, 3, 2, dtype=self.dtype, name="stem")(x)
            x = jax.nn.silu(_bn(train, 1e-3, 0.99, name="stem_bn")(x).astype(x.dtype))
        for si in range(*groups):
            entry = cfg[si]
            if self.arch == "v2s":
                kind, e, c, r, s, k = entry
            else:
                e, c, r, s, k = entry
                kind = "mb"
            for bi in range(r):
                stride = s if bi == 0 else 1
                cls = FusedMBConv if kind == "fused" else MBConv
                x = cls(c, k, stride, e, self.dtype, name=f"s{si}_b{bi}")(x, train)
        if self.stage == 3:
            x = _conv(head_ch, 1, 1, 0, dtype=self.dtype, name="head")(x)
            x = jax.nn.silu(_bn(train, 1e-3, 0.99, name="head_bn")(x).astype(x.dtype))
        return x


# ---------------------------------------------------------------------------
# RegNet-Y 400MF
# ---------------------------------------------------------------------------


class RegNetYBlock(nn.Module):
    c2: int
    stride: int
    group_width: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        g = max(1, self.c2 // self.group_width)
        y = _conv(self.c2, 1, 1, 0, dtype=self.dtype, name="a")(x)
        y = jax.nn.relu(_bn(train, name="a_bn")(y).astype(y.dtype))
        y = _conv(self.c2, 3, self.stride, g=g, dtype=self.dtype, name="b")(y)
        y = jax.nn.relu(_bn(train, name="b_bn")(y).astype(y.dtype))
        y = SqueezeExcite(max(1, cin // 4), "sigmoid", self.dtype, name="se")(y)
        y = _conv(self.c2, 1, 1, 0, dtype=self.dtype, name="c")(y)
        y = _bn(train, name="c_bn")(y).astype(y.dtype)
        if self.stride != 1 or cin != self.c2:
            x = _conv(self.c2, 1, self.stride, 0, dtype=self.dtype, name="down")(x)
            x = _bn(train, name="down_bn")(x).astype(y.dtype)
        return jax.nn.relu(x + y)


REGNET_Y400 = [(48, 1), (104, 3), (208, 6), (440, 6)]  # (width, depth), gw=8


class _RegNetStage(nn.Module):
    stage: int
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        gw = 8
        if self.stage == 1:  # stem + trunk stages 0,1
            x = _conv(32, 3, 2, dtype=self.dtype, name="stem")(x)
            x = jax.nn.relu(_bn(train, name="stem_bn")(x).astype(x.dtype))
            groups = [0, 1]
        elif self.stage == 2:
            groups = [2]
        else:
            groups = [3]
        for si in groups:
            w, d = REGNET_Y400[si]
            for bi in range(d):
                x = RegNetYBlock(w, 2 if bi == 0 else 1, gw, self.dtype,
                                 name=f"t{si}_b{bi}")(x, train)
        return x


# ---------------------------------------------------------------------------
# VGG11-BN and ConvNeXt-tiny
# ---------------------------------------------------------------------------


class _VGG11Stage(nn.Module):
    stage: int
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(x, c, name):
            x = _conv(c, 3, 1, dtype=self.dtype, name=f"{name}_conv")(x)
            return jax.nn.relu(_bn(train, name=f"{name}_bn")(x).astype(x.dtype))
        if self.stage == 1:  # features[:14]: 64 P, 128 P, 256 256
            x = cbr(x, 64, "c0")
            x = _maxpool(x, 2, 2, 0)
            x = cbr(x, 128, "c1")
            x = _maxpool(x, 2, 2, 0)
            x = cbr(x, 256, "c2")
            x = cbr(x, 256, "c3")
        elif self.stage == 2:  # features[14:21]: P, 512, 512
            x = _maxpool(x, 2, 2, 0)
            x = cbr(x, 512, "c4")
            x = cbr(x, 512, "c5")
        else:                  # features[21:28]: P, 512, 512
            x = _maxpool(x, 2, 2, 0)
            x = cbr(x, 512, "c6")
            x = cbr(x, 512, "c7")
        return x


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        y = _conv(self.dim, 7, 1, 3, g=self.dim, bias=True, dtype=self.dtype, name="dw")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(y).astype(y.dtype)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp1")(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + y * gamma


CONVNEXT_T = [(96, 3), (192, 3), (384, 9), (768, 3)]


class _ConvNeXtStage(nn.Module):
    stage: int
    c2: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def down(x, c, k, s, name):
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"{name}_ln")(x).astype(x.dtype)
            return nn.Conv(c, (k, k), strides=(s, s), padding="VALID", use_bias=True,
                           dtype=self.dtype, name=f"{name}_conv")(x)
        if self.stage == 1:  # features[:4]: stem + stage0 + ds + stage1
            x = nn.Conv(96, (4, 4), strides=(4, 4), padding="VALID", use_bias=True,
                        dtype=self.dtype, name="stem_conv")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_ln")(x).astype(x.dtype)
            for i in range(CONVNEXT_T[0][1]):
                x = ConvNeXtBlock(96, self.dtype, name=f"s0_b{i}")(x, train)
            x = down(x, 192, 2, 2, "ds1")
            for i in range(CONVNEXT_T[1][1]):
                x = ConvNeXtBlock(192, self.dtype, name=f"s1_b{i}")(x, train)
        elif self.stage == 2:  # features[4:6]: ds + stage2
            x = down(x, 384, 2, 2, "ds2")
            for i in range(CONVNEXT_T[2][1]):
                x = ConvNeXtBlock(384, self.dtype, name=f"s2_b{i}")(x, train)
        else:                  # features[6:]: ds + stage3
            x = down(x, 768, 2, 2, "ds3")
            for i in range(CONVNEXT_T[3][1]):
                x = ConvNeXtBlock(768, self.dtype, name=f"s3_b{i}")(x, train)
        return x


# ---------------------------------------------------------------------------
# Registry of <family><1|2|3> stage modules
# ---------------------------------------------------------------------------


STAGE_MODULES = {}
for _i in (1, 2, 3):
    for _arch in ("resnet18", "resnet34", "resnet50", "wide_resnet50_2"):
        STAGE_MODULES[f"{_arch}{_i}"] = (lambda arch, i: (lambda c2=0, dtype=None, name=None:
                                         _ResNetStage(arch, i, c2, dtype, name=name)))(_arch, _i)
    STAGE_MODULES[f"MobileNetV3s{_i}"] = (lambda i: (lambda c2=0, dtype=None, name=None:
                                          _MNV3Stage(i, c2, dtype, name=name)))(_i)
    STAGE_MODULES[f"mobilenet_v2{_i}"] = (lambda i: (lambda c2=0, dtype=None, name=None:
                                          _MNV2Stage(i, c2, dtype, name=name)))(_i)
    for _arch in ("b0", "b1", "v2s"):
        key = {"b0": "efficientnet_b0", "b1": "efficientnet_b1", "v2s": "efficientnet_v2_s"}[_arch]
        STAGE_MODULES[f"{key}{_i}"] = (lambda arch, i: (lambda c2=0, dtype=None, name=None:
                                       _EffStage(arch, i, c2, dtype, name=name)))(_arch, _i)
    STAGE_MODULES[f"RegNety400{_i}"] = (lambda i: (lambda c2=0, dtype=None, name=None:
                                        _RegNetStage(i, c2, dtype, name=name)))(_i)
    STAGE_MODULES[f"vgg11_bn{_i}"] = (lambda i: (lambda c2=0, dtype=None, name=None:
                                      _VGG11Stage(i, c2, dtype, name=name)))(_i)
    STAGE_MODULES[f"convnext_tiny{_i}"] = (lambda i: (lambda c2=0, dtype=None, name=None:
                                           _ConvNeXtStage(i, c2, dtype, name=name)))(_i)
