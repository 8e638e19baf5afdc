"""Deformable convolutions v2/v3 — the reference's only native-code component,
rebuilt TPU-native.

Capability parity with:
- DCNv2 block (reference models/common.py:1629-1692, torchvision
  deform_conv2d op) + Bottleneck_DCN/C3_DCN (:1694-1710)
- DCNv3 (reference models/ops_dcnv3: CUDA kernels src/cuda/dcnv3_im2col_cuda.cuh,
  module build/.../modules/dcnv3.py:50-135, pure-torch reference
  dcnv3_core_pytorch functions/dcnv3_func.py:148-189) + YOLO glue
  DCNV3_YoLo/Bottleneck_DCNV3/C3_DCNV3 ("common and yolo.py":1-38)
- C2f_DCN (reference yolov8/seg_jaccardloss_yolov8.py:431-457)

The sampling core here is jax.lax (gather-based bilinear, zero padding) —
the same role as the reference's dcnv3_core_pytorch debug path. Production
dispatch goes through `kernels.dcn_sampling.dcnv3_sampling`, a custom_vjp op
whose forward picks the Pallas one-hot-MXU kernel or this lax core by shape
heuristic, and whose backward is the hand-derived input-scatter /
offset / mask gradient (`dcnv3_core_bwd` below — the TPU counterpart of the
reference's dcnv3_col2im CUDA backward). All offset/mask channel layouts
byte-match the torch originals so imported weights behave identically.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from yolo_dual_tpu.nn.common import C3, Conv, batch_norm

Dtype = Any


def bilinear_sample_nhwc(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded bilinear sampling. img (B,H,W,C); sx/sy (B,P) pixel coords
    (center convention: integer coords hit pixel centers). Returns (B,P,C)."""
    b, h, w, c = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def corner(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = yi_c * w + xi_c                                  # (B,P)
        vals = jnp.take_along_axis(img.reshape(b, h * w, c), flat[..., None], axis=1)
        return vals * inb[..., None].astype(img.dtype)

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def deform_conv2d_v2(x, offset, mask, weight, bias, stride=1, padding=1, dilation=1,
                     groups=1, deformable_groups=1):
    """torchvision deform_conv2d semantics on NHWC.

    x (B,H,W,Cin); offset (B,Ho,Wo,dg*kk*2) in torchvision channel order
    ([2p]=Δy, [2p+1]=Δx for position p=g*kk+k); mask (B,Ho,Wo,dg*kk) already
    sigmoided; weight (kh,kw,Cin//groups,Cout); bias (Cout,)."""
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    kk = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deformable_groups
    cpg = cin // dg  # channels per deformable group

    offs = offset.reshape(b, ho, wo, dg, kk, 2)
    msk = mask.reshape(b, ho, wo, dg, kk)

    oy = jnp.arange(ho, dtype=x.dtype) * stride - padding
    ox = jnp.arange(wo, dtype=x.dtype) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh, dtype=x.dtype) * dilation,
                          jnp.arange(kw, dtype=x.dtype) * dilation, indexing="ij")
    ky = ky.reshape(kk)
    kx = kx.reshape(kk)

    # sampling coords (B, ho, wo, dg, kk)
    sy = oy[None, :, None, None, None] + ky[None, None, None, None, :] + offs[..., 0]
    sx = ox[None, None, :, None, None] + kx[None, None, None, None, :] + offs[..., 1]

    xg = x.reshape(b, h, w, dg, cpg).transpose(0, 3, 1, 2, 4).reshape(b * dg, h, w, cpg)
    syf = sy.transpose(0, 3, 1, 2, 4).reshape(b * dg, ho * wo * kk)
    sxf = sx.transpose(0, 3, 1, 2, 4).reshape(b * dg, ho * wo * kk)
    samp = bilinear_sample_nhwc(xg, sxf, syf)                     # (b*dg, P*kk, cpg)
    samp = samp.reshape(b, dg, ho, wo, kk, cpg)
    samp = samp * msk.transpose(0, 3, 1, 2, 4)[..., None].astype(samp.dtype)
    # (B, ho, wo, kk, cin)
    samp = samp.transpose(0, 2, 3, 4, 1, 5).reshape(b, ho, wo, kk, cin)

    wmat = weight.reshape(kh * kw, cin_g, cout)
    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo", samp, wmat)
    else:
        cg = cin // groups
        og = cout // groups
        samp_g = samp.reshape(b, ho, wo, kk, groups, cg)
        wg = wmat.reshape(kk, cg, groups, og)  # cout index = g*og + o
        out = jnp.einsum("bhwkgc,kcgo->bhwgo", samp_g, wg)
        out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def dcnv3_coords(offset, kernel: int, stride: int, pad: int, dilation: int,
                 group: int, h: int, w: int, offset_scale: float = 1.0):
    """Pixel-space sampling coordinates shared by the lax core, the Pallas
    kernel, and the hand-written backward (so they cannot diverge).

    offset (B,Ho,Wo,g*kk*2) as (Δx,Δy) pairs. Returns sx, sy of shape
    (B·g, Ho·Wo·kk) — kk minor — in padded-input pixel coords:
    s = base + offset_scale·(grid + offset) − 0.5, which is the reference's
    (ref + grid·scale/size + off·scale/size)·size − 0.5 (grid_sample
    align_corners=False). ∂s/∂offset = offset_scale — used by the backward."""
    b, ho, wo = offset.shape[:3]
    kk = kernel * kernel
    # reference points (ref _get_reference_points) in padded pixel coords
    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride + (dilation * (kernel - 1)) // 2 + 0.5)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride + (dilation * (kernel - 1)) // 2 + 0.5)
    # kernel-point ordering is X-MAJOR: p = ix*kh + iy (reference
    # _generate_dilation_grids flattens meshgrid(x, y) row-major)
    vals = -((dilation * (kernel - 1)) // 2) + jnp.arange(kernel, dtype=jnp.float32) * dilation
    kx2, ky2 = jnp.meshgrid(vals, vals, indexing="ij")  # (kw, kh): x varies on dim 0
    gx = kx2.reshape(kk)
    gy = ky2.reshape(kk)

    offs = offset.reshape(b, ho, wo, group, kk, 2)
    sx = base_x[None, None, :, None, None] \
        + offset_scale * (gx[None, None, None, None, :] + offs[..., 0]) - 0.5
    sy = base_y[None, :, None, None, None] \
        + offset_scale * (gy[None, None, None, None, :] + offs[..., 1]) - 0.5
    sxf = sx.transpose(0, 3, 1, 2, 4).reshape(b * group, ho * wo * kk)
    syf = sy.transpose(0, 3, 1, 2, 4).reshape(b * group, ho * wo * kk)
    return sxf, syf


def dcnv3_core(x, offset, mask, kernel: int, stride: int, pad: int, dilation: int,
               group: int, group_channels: int, offset_scale: float):
    """DCNv3 sampling (reference functions/dcnv3_func.py:148-189 formulation):
    channels-last input, per-group offsets + softmaxed masks, grid_sample
    align_corners=False with zero padding.

    x (B,H,W,C=g*gc); offset (B,Ho,Wo,g*kk*2) as (Δx,Δy) pairs; mask
    (B,Ho,Wo,g*kk) softmaxed over kk. Returns (B,Ho,Wo,C)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hin, win = h + 2 * pad, w + 2 * pad
    ho, wo = offset.shape[1:3]

    sxf, syf = dcnv3_coords(offset, kernel, stride, pad, dilation, group,
                            h, w, offset_scale)
    xg = xp.reshape(b, hin, win, group, group_channels).transpose(0, 3, 1, 2, 4) \
        .reshape(b * group, hin, win, group_channels)
    kk = kernel * kernel
    samp = bilinear_sample_nhwc(xg, sxf, syf).reshape(b, group, ho, wo, kk, group_channels)
    m = mask.reshape(b, ho, wo, group, kk).transpose(0, 3, 1, 2, 4)[..., None]
    out = (samp * m.astype(samp.dtype)).sum(axis=4)               # (b, g, ho, wo, gc)
    return out.transpose(0, 2, 3, 1, 4).reshape(b, ho, wo, c)


def dcnv3_core_bwd(x, offset, mask, g_out, kernel: int, stride: int, pad: int,
                   dilation: int, group: int, group_channels: int,
                   offset_scale: float):
    """Hand-derived DCNv3 sampling gradients — the TPU counterpart of the
    reference's CUDA backward (dcnv3_col2im in
    models/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh):

    - d/dx: scatter-add of (bilinear corner weight × mask × ḡ) into the four
      corner positions (XLA scatter — the right TPU primitive for this).
    - d/doffset: chain through the bilinear weights,
      ∂samp/∂sx = (1−wy)(v01−v00) + wy(v11−v10), × offset_scale.
    - d/dmask: ⟨sampled value, ḡ⟩ per kernel point.

    Verified against jax.grad of dcnv3_core in tests/test_dcn.py."""
    b, h, w, c = x.shape
    gc = group_channels
    kk = kernel * kernel
    hin, win = h + 2 * pad, w + 2 * pad
    ho, wo = offset.shape[1:3]
    bg = b * group
    P = ho * wo * kk

    f32 = jnp.float32
    xp = jnp.pad(x.astype(f32), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xg = xp.reshape(b, hin, win, group, gc).transpose(0, 3, 1, 2, 4) \
        .reshape(bg, hin * win, gc)
    sxf, syf = dcnv3_coords(offset.astype(f32), kernel, stride, pad, dilation,
                            group, h, w, offset_scale)
    x0 = jnp.floor(sxf)
    y0 = jnp.floor(syf)
    wx = sxf - x0
    wy = syf - y0

    def corner(dy, dx):
        yi = y0 + dy
        xi = x0 + dx
        inb = (xi >= 0) & (xi < win) & (yi >= 0) & (yi < hin)
        yc = jnp.clip(yi, 0, hin - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, win - 1).astype(jnp.int32)
        flat = yc * win + xc                                     # (bg, P)
        v = jnp.take_along_axis(xg, flat[..., None], axis=1) * inb[..., None]
        return v, flat, inb

    v00, f00, i00 = corner(0, 0)
    v01, f01, i01 = corner(0, 1)   # +x
    v10, f10, i10 = corner(1, 0)   # +y
    v11, f11, i11 = corner(1, 1)
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy

    gr = g_out.astype(f32).reshape(b, ho, wo, group, gc).transpose(0, 3, 1, 2, 4) \
        .reshape(bg, ho * wo, gc)
    gk = jnp.broadcast_to(gr[:, :, None, :], (bg, ho * wo, kk, gc)).reshape(bg, P, gc)
    m = mask.astype(f32).reshape(b, ho, wo, group, kk).transpose(0, 3, 1, 2, 4) \
        .reshape(bg, P)
    dsamp = gk * m[..., None]                                    # (bg, P, gc)

    samp = (v00 * w00[..., None] + v01 * w01[..., None] +
            v10 * w10[..., None] + v11 * w11[..., None])
    dmask_flat = (samp * gk).sum(-1)                             # (bg, P)

    dd_dwx = (1 - wy)[..., None] * (v01 - v00) + wy[..., None] * (v11 - v10)
    dd_dwy = (1 - wx)[..., None] * (v10 - v00) + wx[..., None] * (v11 - v01)
    dsx = (dsamp * dd_dwx).sum(-1) * offset_scale                # (bg, P)
    dsy = (dsamp * dd_dwy).sum(-1) * offset_scale

    dxg = jnp.zeros((bg, hin * win, gc), f32)
    bidx = jnp.arange(bg)[:, None]
    for flat, inb, wgt in ((f00, i00, w00), (f01, i01, w01),
                           (f10, i10, w10), (f11, i11, w11)):
        dxg = dxg.at[bidx, flat].add(dsamp * (wgt * inb)[..., None])
    dxp = dxg.reshape(b, group, hin, win, gc).transpose(0, 2, 3, 1, 4) \
        .reshape(b, hin, win, c)
    dx = dxp[:, pad:hin - pad, pad:win - pad, :]

    def unflat(t):   # (bg, P) -> (b, ho, wo, group, kk)
        return t.reshape(b, group, ho, wo, kk).transpose(0, 2, 3, 1, 4)

    doff = jnp.stack([unflat(dsx), unflat(dsy)], axis=-1) \
        .reshape(b, ho, wo, group * kk * 2)
    dmask = unflat(dmask_flat).reshape(b, ho, wo, group * kk)
    return dx.astype(x.dtype), doff.astype(offset.dtype), dmask.astype(mask.dtype)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class DCNv2(nn.Module):
    """Deformable conv v2 block: offset/mask conv + deform conv + BN + SiLU
    (reference models/common.py:1629-1692)."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    g: int = 1
    d: int = 1
    deformable_groups: int = 1
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        kk = self.k * self.k
        dg = self.deformable_groups
        om = nn.Conv(dg * 3 * kk, (self.k, self.k), strides=(self.s, self.s),
                     padding=((self.p, self.p), (self.p, self.p)), use_bias=True,
                     kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(x)
        o1 = om[..., : dg * kk]
        o2 = om[..., dg * kk: 2 * dg * kk]
        mask = jax.nn.sigmoid(om[..., 2 * dg * kk:])
        offset = jnp.concatenate([o1, o2], axis=-1)

        n = cin * kk
        std = 1.0 / math.sqrt(n)

        def _uniform_sym(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -std, std)

        weight = self.param("weight", _uniform_sym, (self.k, self.k, cin // self.g, self.c2))
        bias = self.param("bias", nn.initializers.zeros, (self.c2,))
        y = deform_conv2d_v2(x, offset, mask, weight, bias, self.s, self.p, self.d,
                             self.g, dg)
        y = batch_norm(train)(y).astype(y.dtype)
        from yolo_dual_tpu.nn.activations import resolve_act
        return resolve_act(self.act)(y)


class Bottleneck_DCN(nn.Module):
    """Bottleneck with DCNv2 second conv (reference models/common.py:1694-1704)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = DCNv2(self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class C3_DCN(C3):
    """C3 with Bottleneck_DCN inners (reference models/common.py:1706-1710)."""

    def inner(self, c_: int):
        return [Bottleneck_DCN(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m_{i}")
                for i in range(self.n)]


class C2f_DCN(nn.Module):
    """C2f whose inner blocks are conv->offset-conv->deform-conv->BN+SiLU
    (reference yolov8/seg_jaccardloss_yolov8.py:431-457)."""

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
            z = Conv(c, 3, 1, g=self.g, act=False, dtype=self.dtype, name=f"m_{i}_pre")(ys[-1], train)
            off = Conv(2 * 9, 3, 1, g=self.g, act=True, dtype=self.dtype, name=f"m_{i}_offset")(z, train)
            weight = self.param(f"m_{i}_dcn_weight", nn.initializers.lecun_normal(),
                                (3, 3, c // self.g, c))
            ones_mask = jnp.ones(off.shape[:3] + (9,), z.dtype)
            z = deform_conv2d_v2(z, off, ones_mask, weight, None, 1, 1, 1, self.g, 1)
            z = batch_norm(train, name=f"m_{i}_bn")(z).astype(z.dtype)
            z = jax.nn.silu(z)
            ys.append(z)
        out = Conv(self.c2, 1, act=self.act, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        if self.shortcut and x.shape[-1] == self.c2:
            out = out + x
        return out


class DCNv3(nn.Module):
    """InternImage DCNv3 (reference build/.../modules/dcnv3.py:50-135):
    input_proj, depthwise conv -> linear offset/mask heads (mask softmaxed per
    group), deformable sampling, output_proj. Channels-last throughout."""

    channels: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 1
    offset_scale: float = 1.0
    impl: str = "auto"   # sampling impl: auto | pallas | lax
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolo_dual_tpu.kernels.dcn_sampling import dcnv3_sampling
        c, k, g = self.channels, self.kernel_size, self.group
        assert c % g == 0
        gc = c // g
        kk = k * k
        proj = nn.Dense(c, dtype=self.dtype, name="input_proj")(x)
        x1 = Conv(c, k, 1, g=c, dtype=self.dtype, name="dw_conv")(x, train)
        offset = nn.Dense(g * kk * 2, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, dtype=self.dtype, name="offset")(x1)
        mask = nn.Dense(g * kk, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, dtype=self.dtype, name="mask")(x1)
        b, h, w, _ = mask.shape
        mask = jax.nn.softmax(mask.reshape(b, h, w, g, kk).astype(jnp.float32), axis=-1)
        mask = mask.reshape(b, h, w, g * kk).astype(proj.dtype)
        out = dcnv3_sampling(proj, offset, mask, k, self.stride, self.pad,
                             self.dilation, g, gc, self.offset_scale, self.impl)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class DCNV3_YoLo(nn.Module):
    """1x1 Conv + DCNv3, NHWC native (reference "common and yolo.py":2-13 —
    which permutes to channels-last around DCNv3; we are already NHWC)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, act=self.act, dtype=self.dtype, name="conv")(x, train)
        pad = (self.k - 1) // 2 * self.d
        return DCNv3(self.c2, self.k, self.s, pad, self.d, self.g,
                     dtype=self.dtype, name="dcnv3")(x, train)


class Bottleneck_DCNV3(nn.Module):
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = DCNV3_YoLo(self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class C3_DCNV3(C3):
    """C3 with DCNv3 bottlenecks (reference "common and yolo.py":26-38)."""

    def inner(self, c_: int):
        return [Bottleneck_DCNV3(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m_{i}")
                for i in range(self.n)]
