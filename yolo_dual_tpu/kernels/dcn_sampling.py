"""Pallas TPU kernel: DCNv3 deformable sampling.

The TPU-native replacement for the reference's CUDA extension
(reference models/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh, 1044 LoC): the
same role its `dcnv3_im2col` kernel plays on GPU, with
`yolo_dual_tpu.nn.dcn.dcnv3_core` (jax.lax) as the readable reference
implementation for parity tests — mirroring the reference's own
kernel-vs-`dcnv3_core_pytorch` test strategy (ops_dcnv3/test.py).

Kernel strategy (TPU has no fast per-lane gather; scatter/gather is the
weakest primitive — SURVEY §7 hard-parts #2):

- Grid over (batch·group, row-blocks of the output).
- The padded input feature slab for one (batch, group) lives in VMEM
  (H·W·gc ≤ a few MB for every config in the zoo at ≤80×80×256).
- For each of the K = k² kernel points, the kernel computes the four bilinear
  corner addresses for a whole (BLOCK_H·W) row-block at once and resolves the
  gather as DYNAMIC ROW SLICES + a one-hot column matmul on the MXU:
  rows are contiguous in VMEM (cheap dynamic slice), and the column gather
  becomes sel(P, W) @ slab(W, gc) — MXU work instead of scalar loads.
- Masks multiply in VMEM and accumulate over K in a f32 scratch.

This file provides `dcnv3_core_pallas` with the identical signature/semantics
as the lax core, plus `use_pallas()` heuristics. Out-of-scope shapes fall back
to the lax path automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def _supported(x, kernel, stride, dilation, pad=1):
    b, h, w, c = x.shape
    kk = kernel * kernel
    hin, win = h + 2 * pad, w + 2 * pad  # padded extents scale with the
    # layer's actual pad (kernel 5 -> pad 2, etc.), not a hardcoded 1 —
    # otherwise the VMEM estimate under-counts and the gate admits shapes
    # whose sel matrix blows the budget (compile fails + per-call retry)
    onehot_bytes = (w * kk) * (hin * win) * 4
    return stride == 1 and dilation == 1 and onehot_bytes <= 6 * 1024 * 1024


def use_pallas(x, kernel: int, stride: int, dilation: int,
               group: int, group_channels: int, pad: int = 1) -> bool:
    """Dispatch heuristic for impl='auto'.

    The one-hot-MXU gather does hin·win/4 redundant FLOPs per corner versus
    an ideal gather; it wins only where the map is small enough that the MXU
    would otherwise idle and the sel matrix fits VMEM. Measured on a real
    v5e (tools/bench_dcn.py, r2): the XLA-gather lax core wins at every zoo
    shape ≥40×40, so 'auto' selects Pallas only for small maps on TPU."""
    import jax as _jax
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    b, h, w, c = x.shape
    return _supported(x, kernel, stride, dilation, pad) and h * w <= 40 * 40


def dcnv3_core_pallas(x, offset, mask, kernel: int, stride: int, pad: int,
                      dilation: int, group: int, group_channels: int,
                      offset_scale: float, interpret: bool = False):
    """Pallas DCNv3 sampling; falls back to the lax core when unsupported."""
    from yolo_dual_tpu.nn.dcn import dcnv3_core
    if not _supported(x, kernel, stride, dilation, pad):
        return dcnv3_core(x, offset, mask, kernel, stride, pad, dilation, group,
                          group_channels, offset_scale)
    try:
        return _dcnv3_pallas_impl(x, offset, mask, kernel, pad, group,
                                  group_channels, offset_scale, interpret)
    except Exception as e:  # pragma: no cover - compile-support fallback
        LOGGER.warning(f"pallas dcnv3 kernel unavailable ({e}); using lax core")
        return dcnv3_core(x, offset, mask, kernel, stride, pad, dilation, group,
                          group_channels, offset_scale)


# ---------------------------------------------------------------------------
# Production entry point: custom-VJP sampling op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def dcnv3_sampling(x, offset, mask, kernel, stride, pad, dilation, group,
                   group_channels, offset_scale, impl="auto"):
    """Differentiable DCNv3 sampling with implementation dispatch.

    Forward: Pallas one-hot-MXU kernel (`_dcnv3_pallas_impl`) or lax core by
    the `use_pallas` heuristic (impl='auto'), or forced with impl='pallas' /
    impl='lax'. Backward: the hand-derived `nn.dcn.dcnv3_core_bwd`
    (input scatter-add + offset/mask chain rule — the TPU counterpart of the
    reference's dcnv3_col2im CUDA backward), identical for both forwards
    since they compute the same function. This is what `nn.dcn.DCNv3` calls
    in production, so C3_DCNV3 models train through it."""
    from yolo_dual_tpu.nn.dcn import dcnv3_core
    if impl == "pallas" or (impl == "auto" and use_pallas(
            x, kernel, stride, dilation, group, group_channels, pad)):
        return dcnv3_core_pallas(x, offset, mask, kernel, stride, pad, dilation,
                                 group, group_channels, offset_scale)
    return dcnv3_core(x, offset, mask, kernel, stride, pad, dilation, group,
                      group_channels, offset_scale)


def _dcnv3_sampling_fwd(x, offset, mask, kernel, stride, pad, dilation, group,
                        group_channels, offset_scale, impl="auto"):
    out = dcnv3_sampling(x, offset, mask, kernel, stride, pad, dilation, group,
                         group_channels, offset_scale, impl)
    return out, (x, offset, mask)


def _dcnv3_sampling_bwd(kernel, stride, pad, dilation, group, group_channels,
                        offset_scale, impl, res, g):
    from yolo_dual_tpu.nn.dcn import dcnv3_core_bwd
    x, offset, mask = res
    return dcnv3_core_bwd(x, offset, mask, g, kernel, stride, pad, dilation,
                          group, group_channels, offset_scale)


dcnv3_sampling.defvjp(_dcnv3_sampling_fwd, _dcnv3_sampling_bwd)


@functools.partial(jax.jit, static_argnames=("kernel", "pad", "group",
                                             "group_channels", "offset_scale", "interpret"))
def _dcnv3_pallas_impl(x, offset, mask, kernel, pad, group, group_channels,
                       offset_scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    kk = kernel * kernel
    gc = group_channels
    hin, win = h + 2 * pad, w + 2 * pad

    # Precompute padded input per (batch, group): (b*g, hin, win, gc)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xg = xp.reshape(b, hin, win, group, gc).transpose(0, 3, 1, 2, 4) \
        .reshape(b * group, hin, win, gc)

    # Sampling pixel coords from the shared helper (pure element-wise),
    # guaranteeing bit-identical coordinates with the lax core and backward
    from yolo_dual_tpu.nn.dcn import dcnv3_coords
    sxf, syf = dcnv3_coords(offset, kernel, 1, pad, 1, group, h, w, offset_scale)
    sx = sxf.reshape(b * group, h, w, kk)
    sy = syf.reshape(b * group, h, w, kk)
    m = mask.reshape(b, h, w, group, kk).transpose(0, 3, 1, 2, 4) \
        .reshape(b * group, h, w, kk).astype(jnp.float32)

    def body(xg_ref, sx_ref, sy_ref, m_ref, out_ref):
        # one (batch·group, output-row) per program: W output pixels
        slab = xg_ref[...]                        # (hin, win, gc) in VMEM
        slab2d = slab.reshape(hin * win, gc)
        sxr = sx_ref[...].reshape(w, kk)
        syr = sy_ref[...].reshape(w, kk)
        mr = m_ref[...].reshape(w, kk)
        acc = jnp.zeros((w, gc), jnp.float32)
        x0 = jnp.floor(sxr)
        y0 = jnp.floor(syr)
        wx = (sxr - x0)
        wy = (syr - y0)
        for dy in (0, 1):
            for dx in (0, 1):
                yi = y0 + dy
                xi = x0 + dx
                inb = (xi >= 0) & (xi < win) & (yi >= 0) & (yi < hin)
                yc = jnp.clip(yi, 0, hin - 1).astype(jnp.int32)
                xc = jnp.clip(xi, 0, win - 1).astype(jnp.int32)
                flat = yc * win + xc                       # (w, kk)
                wgt = (jnp.where(dy == 1, wy, 1 - wy) *
                       jnp.where(dx == 1, wx, 1 - wx))
                wgt = jnp.where(inb, wgt, 0.0) * mr        # (w, kk)
                # one-hot matmul gather: (w*kk, hin*win) @ (hin*win, gc) on MXU
                sel = jax.nn.one_hot(flat.reshape(-1), hin * win, dtype=jnp.float32)
                gathered = jax.lax.dot_general(
                    sel, slab2d.astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(w, kk, gc)
                acc = acc + (gathered * wgt[..., None]).sum(axis=1)
        out_ref[...] = acc.astype(out_ref.dtype).reshape(1, 1, w, gc)

    grid = (b * group, h)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hin, win, gc), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, w, gc), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * group, h, w, gc), x.dtype),
        interpret=interpret,
    )(xg, sx, sy, m)
    return out.reshape(b, group, h, w, gc).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
