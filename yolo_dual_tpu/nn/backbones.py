"""Hand-built backbone stages for the semantic-segmentation path.

Capability parity with the per-script backbone zoos (reference
unet-lite/Resnet50/seg_diceloss_Resnet50.py:405-470 ResNetStem/BottleneckBlock/
ResNet50Layer, unet-lite/Resnet18/seg_diceloss_resnet18.py:216-239 BasicBlock,
unet-lite/Vgg16/seg_diceloss_vgg16.py:401-415 VGGBlock).

The activation flavor differs per reference script (ReLU vs SiLU); it is an
explicit `act` attribute here and is set by the model config.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from yolo_dual_tpu.nn.common import Conv

Dtype = Any


class MaxPool2d(nn.Module):
    """Torch-style max pool with explicit symmetric padding."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.max_pool(x, window_shape=(self.k, self.k), strides=(self.s, self.s),
                           padding=((self.p, self.p), (self.p, self.p)))


class ResNetStem(nn.Module):
    """7×7/2 conv + 3×3/2 max pool (reference seg_diceloss_Resnet50.py:438-448)."""

    c2: int = 64
    act: Any = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 7, 2, 3, act=self.act, dtype=self.dtype, name="conv")(x, train)
        return MaxPool2d(3, 2, 1, name="pool")(x)


class BasicBlock(nn.Module):
    """ResNet18/34 basic residual block (reference seg_diceloss_resnet18.py:216-239)."""

    c2: int
    stride: int = 1
    act: Any = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 3, self.stride, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        y = Conv(self.c2, 3, 1, 1, act=False, dtype=self.dtype, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.c2:
            x = Conv(self.c2, 1, self.stride, 0, act=False, dtype=self.dtype, name="downsample")(x, train)
        from yolo_dual_tpu.nn.activations import resolve_act
        return resolve_act(self.act)(x + y)


class BottleneckBlock(nn.Module):
    """ResNet50 bottleneck block, 4× channel expansion
    (reference seg_diceloss_Resnet50.py:405-435)."""

    mid: int
    stride: int = 1
    act: Any = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.mid * 4
        y = Conv(self.mid, 1, 1, 0, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        y = Conv(self.mid, 3, self.stride, 1, act=self.act, dtype=self.dtype, name="conv2")(y, train)
        y = Conv(c2, 1, 1, 0, act=False, dtype=self.dtype, name="conv3")(y, train)
        if self.stride != 1 or x.shape[-1] != c2:
            x = Conv(c2, 1, self.stride, 0, act=False, dtype=self.dtype, name="downsample")(x, train)
        from yolo_dual_tpu.nn.activations import resolve_act
        return resolve_act(self.act)(x + y)


class ResNetLayer(nn.Module):
    """A ResNet stage: `n` blocks, first carries the stride/downsample.

    `block='bottleneck'` -> ResNet50Layer (reference seg_diceloss_Resnet50.py:450-470);
    `block='basic'` -> ResNet18Layer/ResNet34Layer (reference seg_diceloss_resnet18.py:241+).
    Args follow the YAML convention [out_channels, num_blocks, stride].
    """

    c2: int
    n: int = 1
    stride: int = 1
    block: str = "bottleneck"
    act: Any = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.block == "bottleneck":
            mid = self.c2 // 4
            x = BottleneckBlock(mid, self.stride, self.act, self.dtype, name="block0")(x, train)
            for i in range(1, self.n):
                x = BottleneckBlock(mid, 1, self.act, self.dtype, name=f"block{i}")(x, train)
        else:
            x = BasicBlock(self.c2, self.stride, self.act, self.dtype, name="block0")(x, train)
            for i in range(1, self.n):
                x = BasicBlock(self.c2, 1, self.act, self.dtype, name=f"block{i}")(x, train)
        return x


def resize_bilinear_ac(x: jnp.ndarray, size):
    """Bilinear resize with align_corners=True semantics (torch F.interpolate
    align_corners=True), NHWC. Used by SegmentHead (reference
    seg_diceloss_resnet18.py:313-318 uses align_corners=True upsampling)."""
    import jax
    b, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class SegmentHead(nn.Module):
    """Shared U-Net-style semantic head: per-scale lateral 1×1 convs, bilinear
    upsample (align_corners=True) to the finest scale, concat, 3×3 + 1×1 convs
    (reference unet-lite/Resnet18/seg_diceloss_resnet18.py:300-349; the same
    head pairs with every interchangeable backbone family)."""

    nc: int = 12
    width: int = 128
    act: Any = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        target = feats[0].shape[1:3]
        processed = []
        for i, f in enumerate(feats):
            f = Conv(self.width, 1, 1, act=self.act, dtype=self.dtype, name=f"lateral{i}")(f, train)
            if f.shape[1:3] != target:
                f = resize_bilinear_ac(f, target)
            processed.append(f)
        y = jnp.concatenate(processed, axis=-1)
        y = Conv(2 * self.width, 3, 1, act=self.act, dtype=self.dtype, name="final0")(y, train)
        return Conv(self.nc, 1, 1, act=False, dtype=self.dtype, name="final1")(y, train)


class VGGBlock(nn.Module):
    """`n` 3×3 convs then optional 2×2/2 pool (reference seg_diceloss_vgg16.py:401-415)."""

    c2: int
    n: int = 2
    pool: bool = True
    act: Any = "relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            x = Conv(self.c2, 3, 1, act=self.act, dtype=self.dtype, name=f"conv{i}")(x, train)
        if self.pool:
            x = MaxPool2d(2, 2, 0, name="pool")(x)
        return x
