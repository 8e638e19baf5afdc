"""Core conv-op library as Flax modules, NHWC layout.

Capability parity with the reference's op zoo (reference models/common.py:47-317
Conv/C3/SPPF family, :838-864 Proto/Classify, plus the per-script C2f
(yolov8/seg_jaccardloss_yolov8.py:401-414), C3k2/GAM
(unet-lite/yolo9-seg/seg_diceloss_yolov9.py:451-510)) — re-designed TPU-first:

- NHWC data layout (TPU conv native layout); channel concat axis is -1.
- Explicit symmetric padding replicating torch's conv arithmetic so imported
  PyTorch weights are bit-comparable (XLA "SAME" pads asymmetrically and would
  break parity for stride-2 convs).
- BatchNorm runs in float32 with running stats in a `batch_stats` collection;
  under pjit with a sharded batch the statistics are global-batch (SyncBN
  semantics) by construction.
- Inference supports explicit conv+BN weight folding (the reference's
  `model.fuse()`, utils/torch_utils.py fuse_conv_and_bn): under the
  `fused_inference` context every Conv skips its BN and reads a folded bias
  instead, so the affine + f32 cast chain disappears from the compiled graph
  entirely (see models/model.py `BaseModel.fuse`).

All modules accept `train: bool` in `__call__` (controls BN stat updates) and a
`dtype` attribute for bf16 compute with f32 params.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from yolo_dual_tpu.nn.activations import resolve_act

Dtype = Any

# BatchNorm hyperparameters differ between the reference's two paths: the
# detection/segment models run initialize_weights which sets eps=1e-3,
# momentum=0.03 (reference utils/torch_utils.py:217-219), while the semantic
# standalone scripts keep torch defaults eps=1e-5, momentum=0.1. GraphModel
# selects the profile per compiled spec via `bn_config`.
import contextlib

_BN_CTX = {"eps": 1e-3, "momentum": 0.97}  # flax momentum = 1 - torch momentum


@contextlib.contextmanager
def bn_config(eps: float, momentum: float):
    old = dict(_BN_CTX)
    _BN_CTX.update(eps=eps, momentum=momentum)
    try:
        yield
    finally:
        _BN_CTX.clear()
        _BN_CTX.update(old)


def batch_norm(train: bool, name: str = "bn", dtype=None, act_fold=None):
    """BatchNorm with f32 running stats. `dtype` sets the NORMALIZE precision
    (flax computes batch statistics in f32 regardless — verified identical for
    dtype=f32/bf16). Callers deliberately do NOT pass bf16 here: measured on
    v5e (tools/bench_train_breakdown.py, bs16@640 yolov5s-seg), bf16 normalize
    cuts fwd(train) 13.1->11.2 ms but the XLA-autodiff BN backward regresses
    18.7->29.3 ms, net train throughput 401->369 img/s. f32 normalize wins
    end-to-end *under autodiff*; `fused_bn_vjp` (below) instead hand-writes
    the minimal closed-form backward so the bf16 forward win is kept without
    the backward regression. The inference path avoids BN entirely via
    conv+BN folding (model.fuse)."""
    if train and _BN_CTX.get("fused_vjp"):
        return FusedBatchNorm(momentum=_BN_CTX["momentum"], epsilon=_BN_CTX["eps"],
                              dtype=_BN_CTX.get("fused_dtype") or jnp.bfloat16,
                              act_fold=act_fold, name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=_BN_CTX["momentum"],
                        epsilon=_BN_CTX["eps"],
                        dtype=jnp.float32 if dtype is None else dtype, name=name)


@contextlib.contextmanager
def fused_bn_vjp(on: bool = True, dtype=None, fold_act=None):
    """Enable the custom-VJP train-mode BatchNorm for modules built inside.
    dtype=None keeps any normalize-dtype already set on the context (default
    bf16), so callers/tests can pre-pin f32 for exact-parity checks.
    fold_act=True additionally folds a trailing SiLU into the same custom
    VJP (`_bn_silu`): the BN output is recomputed in the backward instead of
    stashed, cutting one full activation tensor of HBM traffic per Conv
    block (the r4 roofline's byte lever — the step is bandwidth-bound)."""
    old_on, old_dt = _BN_CTX.get("fused_vjp"), _BN_CTX.get("fused_dtype")
    old_fa = _BN_CTX.get("fused_act")
    _BN_CTX["fused_vjp"] = on
    if dtype is not None:
        _BN_CTX["fused_dtype"] = dtype
    if fold_act is not None:
        _BN_CTX["fused_act"] = fold_act
    try:
        yield
    finally:
        _BN_CTX.update(fused_vjp=old_on, fused_dtype=old_dt, fused_act=old_fa)


@jax.custom_vjp
def _bn_norm(x, mean, rstd, scale, bias):
    """y = ((x - mean) * rstd) * scale + bias, elementwise in x.dtype."""
    dt = x.dtype
    xhat = (x - mean.astype(dt)) * rstd.astype(dt)
    return xhat * scale.astype(dt) + bias.astype(dt)


def _bn_norm_fwd(x, mean, rstd, scale, bias):
    return _bn_norm(x, mean, rstd, scale, bias), (x, mean, rstd, scale)


def _bn_norm_bwd(res, g):
    """Closed-form BatchNorm backward (stats' dependence on x folded in):
        dx = scale·rstd · (g − mean(g) − x̂·mean(g·x̂))
    Elementwise passes stay in x.dtype (bf16 under the mixed policy); the two
    per-channel reductions accumulate in f32. This is the minimal 3-pass form
    the reference gets from cuDNN; XLA's autodiff of the f32 formulation emits
    more HBM traffic (the measured 18.7→29.3 ms bf16 regression)."""
    x, mean, rstd, scale = res
    dt = x.dtype
    f32 = jnp.float32
    axes = tuple(range(x.ndim - 1))
    n = jnp.float32(math.prod(x.shape[a] for a in axes) or 1)
    xhat = (x - mean.astype(dt)) * rstd.astype(dt)
    gsum = jnp.sum(g.astype(f32), axes)                       # == dbias
    gxsum = jnp.sum((g * xhat).astype(f32), axes)             # == dscale
    coef = (scale.astype(f32) * rstd.astype(f32)).astype(dt)
    dx = coef * (g - (gsum / n).astype(dt) - xhat * (gxsum / n).astype(dt))
    zeros_c = jnp.zeros_like(mean)
    return dx, zeros_c, zeros_c, gxsum, gsum


_bn_norm.defvjp(_bn_norm_fwd, _bn_norm_bwd)


@jax.custom_vjp
def _bn_silu(x, mean, rstd, scale, bias):
    """silu(bn(x)) in one VJP: only x (+ per-channel stats) is stashed; the
    BN output is recomputed in the backward. Under autodiff (or with separate
    _bn_norm + silu) the pre-activation tensor is also saved for silu's
    backward — a full extra activation of HBM write+read per Conv block.
    Measured on v5e (tools/bench_bn_act.py, bs16@640, back-to-back):
    530.4 -> 553.2 img/s (+4.3%)."""
    dt = x.dtype
    y = ((x - mean.astype(dt)) * rstd.astype(dt)) * scale.astype(dt) + bias.astype(dt)
    return y * jax.nn.sigmoid(y)


def _bn_silu_fwd(x, mean, rstd, scale, bias):
    return _bn_silu(x, mean, rstd, scale, bias), (x, mean, rstd, scale, bias)


def _bn_silu_bwd(res, g):
    """BN backward (closed form, as _bn_norm_bwd) chained through silu':
    silu'(y) = s·(1 + y·(1−s)), s = σ(y), with y recomputed from x."""
    x, mean, rstd, scale, bias = res
    dt = x.dtype
    f32 = jnp.float32
    axes = tuple(range(x.ndim - 1))
    n = jnp.float32(math.prod(x.shape[a] for a in axes) or 1)
    xhat = (x - mean.astype(dt)) * rstd.astype(dt)
    y = xhat * scale.astype(dt) + bias.astype(dt)
    s = jax.nn.sigmoid(y)
    gbn = g * (s * (1 + y * (1 - s)))
    gsum = jnp.sum(gbn.astype(f32), axes)                     # == dbias
    gxsum = jnp.sum((gbn * xhat).astype(f32), axes)           # == dscale
    coef = (scale.astype(f32) * rstd.astype(f32)).astype(dt)
    dx = coef * (gbn - (gsum / n).astype(dt) - xhat * (gxsum / n).astype(dt))
    zeros_c = jnp.zeros_like(mean)
    return dx, zeros_c, zeros_c, gxsum, gsum


_bn_silu.defvjp(_bn_silu_fwd, _bn_silu_bwd)


@jax.custom_vjp
def _bn_relu(x, mean, rstd, scale, bias):
    """relu(bn(x)) in one VJP — same recompute-in-backward strategy as
    _bn_silu, for the ReLU zoos (semantic ResNet/VGG flagships)."""
    dt = x.dtype
    y = ((x - mean.astype(dt)) * rstd.astype(dt)) * scale.astype(dt) + bias.astype(dt)
    return jnp.maximum(y, jnp.zeros((), dt))


def _bn_relu_fwd(x, mean, rstd, scale, bias):
    return _bn_relu(x, mean, rstd, scale, bias), (x, mean, rstd, scale, bias)


def _bn_relu_bwd(res, g):
    x, mean, rstd, scale, bias = res
    dt = x.dtype
    f32 = jnp.float32
    axes = tuple(range(x.ndim - 1))
    n = jnp.float32(math.prod(x.shape[a] for a in axes) or 1)
    xhat = (x - mean.astype(dt)) * rstd.astype(dt)
    y = xhat * scale.astype(dt) + bias.astype(dt)
    gbn = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    gsum = jnp.sum(gbn.astype(f32), axes)
    gxsum = jnp.sum((gbn * xhat).astype(f32), axes)
    coef = (scale.astype(f32) * rstd.astype(f32)).astype(dt)
    dx = coef * (gbn - (gsum / n).astype(dt) - xhat * (gxsum / n).astype(dt))
    zeros_c = jnp.zeros_like(mean)
    return dx, zeros_c, zeros_c, gxsum, gsum


_bn_relu.defvjp(_bn_relu_fwd, _bn_relu_bwd)


class FusedBatchNorm(nn.Module):
    """Train-mode BatchNorm, variable-compatible with flax nn.BatchNorm
    (params scale/bias, batch_stats mean/var — checkpoints, fuse() and torch
    import are unaffected), with the normalize in `dtype` and the backward
    hand-written (`_bn_norm_bwd`). Batch statistics are always f32; under a
    sharded global batch the stats reduction is global by construction
    (SyncBN semantics, SURVEY §2.4)."""

    momentum: float = 0.97
    epsilon: float = 1e-3
    dtype: Optional[Dtype] = jnp.bfloat16
    act_fold: Optional[str] = None  # fold trailing act into the VJP: "silu"|"relu"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axes)
        # flax convention: biased variance via E[x²] − E[x]²
        var = jnp.maximum(jnp.mean(xf * xf, axes) - mean * mean, 0.0)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        rstd = jax.lax.rsqrt(var + self.epsilon)
        dt = self.dtype or x.dtype
        norm = {"silu": _bn_silu, "relu": _bn_relu, None: _bn_norm}[self.act_fold]
        y = norm(x.astype(dt), jax.lax.stop_gradient(mean),
                 jax.lax.stop_gradient(rstd), scale, bias)
        return y.astype(x.dtype)


# Inference-time conv+BN folding (the reference's model.fuse()). When the flag
# is on, `Conv` builds its nn.Conv with a bias and skips the BatchNorm module —
# the caller must supply variables transformed by models.model.fuse_conv_bn.
_FUSE_CTX = {"on": False}


@contextlib.contextmanager
def fused_inference(on: bool = True):
    old = _FUSE_CTX["on"]
    _FUSE_CTX["on"] = on
    try:
        yield
    finally:
        _FUSE_CTX["on"] = old


def autopad(k, p=None, d: int = 1):
    """Torch-style 'same' padding: p = k // 2 (per spatial dim), dilation-aware."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _pair(x) -> Tuple[int, int]:
    return (x, x) if isinstance(x, int) else tuple(x)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor nearest upsample on NHWC via repeat (exact torch semantics)."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize on NHWC, half-pixel centers (== torch align_corners=False)."""
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear").astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(x, (b, size[0], size[1], c), method="nearest")


def max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k×k stride-1 max pool with torch-style symmetric padding (pads with -inf)."""
    p = k // 2
    return nn.max_pool(x, window_shape=(k, k), strides=(1, 1), padding=((p, p), (p, p)))


class Conv(nn.Module):
    """Conv2d(+BN+act). Args mirror the reference Conv(c1, c2, k, s, p, g, d, act);
    c1 is inferred from the input. Reference: models/common.py:47-64."""

    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    p: Optional[Union[int, Tuple[int, int]]] = None
    g: int = 1
    d: int = 1
    act: Any = True
    bn: bool = True
    bias: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.k)
        s = _pair(self.s)
        p = autopad(self.k, self.p, self.d)
        p = _pair(p)
        fused = _FUSE_CTX["on"] and self.bn
        x = nn.Conv(
            features=self.c2,
            kernel_size=k,
            strides=s,
            padding=(p if isinstance(p[0], tuple) else ((p[0], p[0]), (p[1], p[1]))),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=self.bias or fused,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.bn and not fused:
            fold = None
            if train and _BN_CTX.get("fused_vjp") and _BN_CTX.get("fused_act"):
                key = "silu" if self.act is True else (
                    self.act.strip().lower() if isinstance(self.act, str) else None)
                fold = key if key in ("silu", "relu") else None
            x = batch_norm(train, act_fold=fold)(x).astype(x.dtype)
            if fold:
                return x
        return resolve_act(self.act)(x)


class DWConv(nn.Module):
    """Depth-wise conv: groups = gcd(c1, c2). Reference models/common.py:67-70."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, None, g, self.d, self.act, dtype=self.dtype, name="dw")(x, train)


class ConvTranspose(nn.Module):
    """nn.ConvTranspose2d equivalent (used by hub configs). p is torch-style padding."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    g: int = 1
    bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d output: (H-1)*s - 2p + k. flax ConvTranspose with
        # padding=((k-1-p, k-1-p),)*2 and transpose_kernel=True reproduces it.
        pad = self.k - 1 - self.p
        return nn.ConvTranspose(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.bias,
            transpose_kernel=True,
            feature_group_count=self.g,
            dtype=self.dtype,
            name="conv",
        )(x)


class DWConvTranspose2d(ConvTranspose):
    pass


class Bottleneck(nn.Module):
    """Standard residual bottleneck (reference models/common.py:115-125)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck, v4-style with raw convs + shared BN (reference models/common.py:128-144)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = batch_norm(train)(y).astype(y.dtype)
        y = jax.nn.silu(y)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class CrossConv(nn.Module):
    """Cross-convolution downsample: 1×k then k×1 (reference models/common.py:147-158)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, (1, self.k), (1, self.s), dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, (self.k, 1), (self.s, 1), g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference models/common.py:161-172)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = True
    dtype: Dtype = None

    def inner(self, c_: int):
        """Override point for C3x/C3TR/C3SPP/C3Ghost variants."""
        return [Bottleneck(c_, self.shortcut, self.g, e=1.0, act=self.act, dtype=self.dtype, name=f"m_{i}")
                for i in range(self.n)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        for blk in self.inner(c_):
            y1 = blk(y1, train)
        y2 = Conv(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv(self.c2, 1, act=self.act, dtype=self.dtype, name="cv3")(y, train)


class C3Conv(C3):
    """C3 skeleton whose inner blocks are plain 3×3 convs — the semantic-seg
    scripts' file-local "C3" (reference seg_diceloss_Resnet50.py:522-535,
    seg_diceloss_vgg16.py C3). With n=0 it degenerates to split+merge only,
    which the reference builders actually produce for rows like
    ``[-1, 3, C3, [512, False]]`` (int(False) == 0 inner blocks)."""

    def inner(self, c_: int):
        return [Conv(c_, 3, 1, g=self.g, act=self.act, dtype=self.dtype, name=f"m_{i}")
                for i in range(self.n)]


class C3x(C3):
    """C3 with cross-convolutions (reference models/common.py:175-180)."""

    def inner(self, c_: int):
        return [CrossConv(c_, 3, 1, self.g, 1.0, self.shortcut, dtype=self.dtype, name=f"m_{i}")
                for i in range(self.n)]


class SPP(nn.Module):
    """Spatial pyramid pooling (reference models/common.py:207-220)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [x] + [max_pool_same(x, k) for k in self.k]
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class SPPF(nn.Module):
    """SPP-Fast: 3 chained k×k pools == SPP(5,9,13) (reference models/common.py:223-238)."""

    c2: int
    k: int = 5
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return Conv(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(jnp.concatenate([x, y1, y2, y3], -1), train)


class C3SPP(C3):
    """C3 with an SPP inner block (reference models/common.py:191-196)."""

    k: Sequence[int] = (5, 9, 13)

    def inner(self, c_: int):
        return [SPP(c_, self.k, dtype=self.dtype, name="m_spp")]


class Focus(nn.Module):
    """Space-to-depth stem: 2×2 pixel de-interleave then conv (reference models/common.py:241-250).

    Channel order matches torch cat((even,even),(odd,even),(even,odd),(odd,odd))
    where indices are (h, w)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1
        )
        return Conv(self.c2, self.k, self.s, self.p, self.g, act=self.act, dtype=self.dtype, name="conv")(y, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference models/common.py:253-263)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference models/common.py:266-279)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="gc2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype, name="sc_dw")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottleneck inner blocks (reference models/common.py:199-204)."""

    def inner(self, c_: int):
        return [GhostBottleneck(c_, dtype=self.dtype, name=f"m_{i}") for i in range(self.n)]


class C2f(nn.Module):
    """This fork's YOLOv8-style C2f: split + n plain 3×3 convs + merge, residual at
    the end when c1 == c2 (reference yolov8/seg_jaccardloss_yolov8.py:401-414 —
    NOTE: differs from upstream ultralytics C2f, which uses Bottlenecks)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Conv(c, 3, 1, g=self.g, act=self.act, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        out = Conv(self.c2, 1, act=self.act, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        if self.shortcut and x.shape[-1] == self.c2:
            out = out + x
        return out


class C3k2(nn.Module):
    """This fork's YOLOv9-style C3k2: C3 skeleton with plain 3×3 conv stack and a
    trailing residual (reference unet-lite/yolo9-seg/seg_diceloss_yolov9.py:451-472)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Conv(c_, 3, 1, g=self.g, act=self.act, dtype=self.dtype, name=f"m_{i}")(y1, train)
        y2 = Conv(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(x, train)
        out = Conv(self.c2, 1, act=self.act, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)
        if self.shortcut and x.shape[-1] == self.c2:
            out = out + x
        return out


class GAM(nn.Module):
    """Global aggregation channel attention: avg+max pooled gating
    (reference unet-lite/yolo9-seg/seg_diceloss_yolov9.py:475-510)."""

    c: int
    k: int = 1
    s: int = 1
    e: float = 0.25
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c * self.e)
        conv1 = Conv(c_, self.k, self.s, dtype=self.dtype, name="conv1")
        y1 = conv1(x, train).mean(axis=(1, 2), keepdims=True)
        y1 = Conv(self.c, self.k, self.s, act=False, dtype=self.dtype, name="conv2")(y1, train)
        y2 = conv1(x, train).max(axis=(1, 2), keepdims=True)
        y2 = Conv(self.c, self.k, self.s, act=False, dtype=self.dtype, name="conv3")(y2, train)
        gate = jax.nn.sigmoid(y1 + y2)
        return x * gate


class Contract(nn.Module):
    """Width/height into channels, torch channel ordering (reference models/common.py:282-293)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // s, w // s, s * s * c)


class Expand(nn.Module):
    """Channels into width/height, torch channel ordering (reference models/common.py:296-307)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h, w, s, s, c // (s * s))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * s, w * s, c // (s * s))


class Concat(nn.Module):
    """Channel concat; `align=True` bilinear-resizes inputs to the first input's
    spatial size (the semantic-seg scripts' auto-aligning variant, reference
    yolov8/seg_jaccardloss_yolov8.py Concat; stock variant models/common.py:310-317)."""

    d: int = 1  # torch dim 1 == channels == our axis -1
    align: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        axis = -1 if self.d == 1 else self.d
        if self.align:
            size = xs[0].shape[1:3]
            xs = [resize_bilinear(t, size) if t.shape[1:3] != size else t for t in xs]
        return jnp.concatenate(xs, axis=axis)


class Sum(nn.Module):
    """Weighted sum of n inputs (BiFPN-style fusion, arXiv:1911.09070;
    reference models/experimental.py:14-32). With `weight=True`, inputs past
    the first are scaled by learned gates 2·sigmoid(w_i), initialized to the
    reference's -arange(1, n)/2 ramp."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = xs[0]
        if self.weight:
            w = 2.0 * jax.nn.sigmoid(self.param(
                "w", lambda rng: -jnp.arange(1.0, self.n) / 2.0))
            for i, x in enumerate(xs[1:]):
                y = y + x * w[i]
        else:
            for x in xs[1:]:
                y = y + x
        return y


class MixConv2d(nn.Module):
    """Mixed depthwise kernel sizes (MixConv, arXiv:1907.09595; reference
    models/experimental.py:35-57): output channels split across parallel
    grouped convs of different kernel sizes, concatenated, then BN+SiLU.

    Channel split: `equal_ch=True` gives each branch an equal share (the
    remainder lands on the last branches, matching the reference's
    linspace-floor);
    otherwise shares are proportional to 1/k² so every branch holds roughly
    the same number of weights — same intent as the reference's
    least-squares formulation, stated directly.
    """

    c2: int
    k: Sequence[int] = (1, 3)
    s: int = 1
    equal_ch: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import numpy as np
        c1, n = x.shape[-1], len(self.k)
        if self.equal_ch:
            # the reference assigns output channel j to branch floor(j·n/c2)
            # (remainder lands on the LAST branches) — matched exactly so
            # imported weights line up
            splits = np.bincount(
                np.floor(np.linspace(0, n - 1e-6, self.c2)).astype(int),
                minlength=n).tolist()
        else:
            # equal weight count per branch: c_g ∝ 1/k_g², rounded — the
            # closed form of the reference's least-squares system (which can
            # round a branch to zero channels; we then skip that conv)
            inv = 1.0 / np.asarray(self.k, np.float64) ** 2
            splits = np.round(self.c2 * inv / inv.sum()).astype(int)
            # independent rounding can drift from c2; put the residual on the
            # largest split so the concat always emits exactly c2 channels
            splits[int(np.argmax(splits))] += self.c2 - int(splits.sum())
            splits = splits.tolist()
        outs = []
        for i, (kk, cc) in enumerate(zip(self.k, splits)):
            if cc == 0:
                continue
            p = kk // 2
            outs.append(nn.Conv(int(cc), (kk, kk), (self.s, self.s),
                                padding=((p, p), (p, p)),
                                feature_group_count=math.gcd(c1, int(cc)),
                                use_bias=False, dtype=self.dtype, name=f"m_{i}")(x))
        y = jnp.concatenate(outs, axis=-1)
        return nn.silu(batch_norm(train, dtype=self.dtype)(y))


class Upsample(nn.Module):
    """nn.Upsample equivalent: nearest uses exact repeat for integer factors."""

    size: Optional[Tuple[int, int]] = None
    scale_factor: Optional[float] = 2.0
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.size is not None:
            tgt = tuple(self.size)
        else:
            sf = self.scale_factor
            tgt = (int(x.shape[1] * sf), int(x.shape[2] * sf))
        if self.mode == "nearest":
            sf = self.scale_factor
            if sf is not None and float(sf).is_integer() and self.size is None:
                return upsample_nearest(x, int(sf))
            return resize_nearest(x, tgt)
        return resize_bilinear(x, tgt)


class BatchNorm2d(nn.Module):
    """Standalone BN layer (YAML `nn.BatchNorm2d` rows)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return batch_norm(train)(x).astype(x.dtype)


class ZeroPad2d(nn.Module):
    """nn.ZeroPad2d equivalent: padding (left, right, top, bottom)."""

    padding: tuple = (0, 1, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class Softmax(nn.Module):
    """Standalone channel softmax (semantic-seg YAML tail row `nn.Softmax`)."""

    dim: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        axis = -1 if self.dim == 1 else self.dim
        return jax.nn.softmax(x, axis=axis)


class TransformerLayer(nn.Module):
    """LayerNorm-free transformer layer (reference models/common.py:79-93).

    q/k/v projections without bias feed a standard multi-head attention
    (with its own in/out projections, matching torch nn.MultiheadAttention)."""

    c: int
    num_heads: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, seq, c)
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        # torch MHA: joint in_proj (with bias) then scaled dot-product per head, out_proj.
        qp = nn.Dense(self.c, dtype=self.dtype, name="in_q")(q)
        kp = nn.Dense(self.c, dtype=self.dtype, name="in_k")(k)
        vp = nn.Dense(self.c, dtype=self.dtype, name="in_v")(v)
        b, s, _ = qp.shape
        hd = self.c // self.num_heads
        qh = qp.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh).transpose(0, 2, 1, 3).reshape(b, s, self.c)
        out = nn.Dense(self.c, dtype=self.dtype, name="out_proj")(out)
        x = out + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """Vision-transformer block over a feature map (reference models/common.py:96-112)."""

    c2: int
    num_heads: int
    num_layers: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(self.c2, dtype=self.dtype, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p, train)
        return p.reshape(b, h, w, self.c2)


class C3TR(C3):
    """C3 with a TransformerBlock inner (reference models/common.py:183-188)."""

    def inner(self, c_: int):
        return [TransformerBlock(c_, 4, self.n, dtype=self.dtype, name="m_tr")]


class Proto(nn.Module):
    """Mask prototype head for Segment (reference models/common.py:838-848).
    Output (b, h*2, w*2, c2) protos in NHWC."""

    c_: int = 256
    c2: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        x = upsample_nearest(x, 2)
        x = Conv(self.c_, k=3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, dtype=self.dtype, name="cv3")(x, train)


class Classify(nn.Module):
    """Classification head: conv -> GAP -> [dropout] -> linear (reference
    models/common.py:851-864; dropout rate = the reference's --dropout flag,
    classify/train.py:124-125)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    dropout: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        x = Conv(1280, self.k, self.s, self.p, self.g, dtype=self.dtype, name="conv")(x, train)
        x = x.mean(axis=(1, 2))
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.c2, dtype=self.dtype, name="linear")(x)
