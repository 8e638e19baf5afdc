"""Pallas TPU kernel: DCNv3 deformable sampling.

The TPU-native replacement for the reference's CUDA extension
(reference models/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh, 1044 LoC): the
same role its `dcnv3_im2col` kernel plays on GPU, with
`yolo_dual_tpu.nn.dcn.dcnv3_core` (jax.lax) as the readable reference
implementation for parity tests — mirroring the reference's own
kernel-vs-`dcnv3_core_pytorch` test strategy (ops_dcnv3/test.py).

Kernel strategy (r3 — replaces the r2 one-hot-per-corner kernel, which lost
to XLA everywhere ≥40×40 and failed to compile on some shapes):

**Banded gather-matrix formulation.** TPU has no per-lane gather, but XLA's
own gather lowering at these shapes is ~60x off the memory bound (measured
319 ms for one bs16 80×80×256 layer). Instead, for each output row j the
kernel materializes a small gather matrix

    A (wo, B·win):  A[p, y_local·win + x] = Σ_{kernel pts, corners}
                                            bilinear_wgt · softmax_mask

over a BAND of B input rows centered on j (every sample of output row j lands
within ±B/2 rows for any offset the band covers — verified at trace time by a
runtime predicate, with `lax.cond` falling back to the exact lax core when a
wild offset escapes the band). The entire row's sampling then collapses to ONE
MXU matmul  A @ band(B·win, gc): ~7 MFLOP per (row, batch·group) program at
80×80/gc32 — ~34 GFLOP per bs16 batch, i.e. milliseconds, with the (hin, win,
gc) slab resident in VMEM (≤2 MB for every zoo shape). Folding the kk kernel
points into A (a VPU scatter-free accumulation of one-hots) is what removes
the kk factor from the matmul.

The backward uses the same banded formulation (`_dcnv3_banded_bwd`): per-row
corner values come back as H @ band matmuls and the input-gradient scatter is
its transpose H^T @ (g·w·mask) accumulated into a revisited VMEM output block.
Measured (tools/bench_dcn.py, v5e bs16, table in docs/PARITY.md): forward wins
4-6x over the lax core at EVERY zoo shape; backward wins 1.7-3x at 80x80 maps
(lax scatter 0.9-3.3 s/layer there) but loses at <=40x40, so bwd dispatch is
gated on `_BWD_MIN_AREA` and `impl='auto'` composes pallas-fwd + lax-bwd at
small maps. Both paths share `nn.dcn.dcnv3_core_bwd` math and are
parity-tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def _band_geometry(kernel: int, dilation: int):
    """(band_size B, center offset c): sampling rows for output row j span
    j + [0, dil·(k−1)] + offset_y; the band [j+c−B/2, j+c+B/2) is centered on
    that span."""
    extent = dilation * (kernel - 1)
    c = extent // 2 + 1
    b = max(16, ((extent + 12) + 7) // 8 * 8)
    return b, c


def _supported(x, kernel, stride, dilation, group_channels, pad=1):
    b, h, w, c = x.shape
    hin, win = h + 2 * pad, w + 2 * pad
    band = min(_band_geometry(kernel, dilation)[0], hin)
    slab_bytes = hin * win * group_channels * 4
    a_bytes = w * band * win * 4
    return (stride == 1
            and slab_bytes <= 8 * 1024 * 1024 and a_bytes <= 4 * 1024 * 1024)


def use_pallas(x, kernel: int, stride: int, dilation: int,
               group: int, group_channels: int, pad: int = 1) -> bool:
    """Dispatch heuristic for impl='auto': the banded kernel applies wherever
    its slab fits VMEM; tools/bench_dcn.py holds the measured table."""
    import jax as _jax
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    return _supported(x, kernel, stride, dilation, group_channels, pad)


def dcnv3_core_pallas(x, offset, mask, kernel: int, stride: int, pad: int,
                      dilation: int, group: int, group_channels: int,
                      offset_scale: float, interpret: bool = False):
    """Banded Pallas DCNv3 sampling with exact fallback.

    Escape hatch semantics: the banded kernel is exact whenever every sampling
    row lies within its band (true for any offset_y in roughly ±(B/2−2) px —
    trained DCN offsets are a few px). A runtime `lax.cond` checks the actual
    offsets and runs the lax core for the (rare, untrained-extreme) batches
    that escape, so the op is ALWAYS exact."""
    from yolo_dual_tpu.nn.dcn import dcnv3_core
    if not _supported(x, kernel, stride, dilation, group_channels, pad):
        return dcnv3_core(x, offset, mask, kernel, stride, pad, dilation, group,
                          group_channels, offset_scale)
    try:
        return _dcnv3_banded_dispatch(x, offset, mask, kernel, pad, dilation,
                                      group, group_channels, offset_scale,
                                      interpret)
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

    Forward: banded Pallas kernel (`_dcnv3_banded_dispatch`) or lax core by
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
    if impl == "lax":
        return dcnv3_core_bwd(x, offset, mask, g, kernel, stride, pad, dilation,
                              group, group_channels, offset_scale)
    return dcnv3_bwd_dispatch(x, offset, mask, g, kernel, stride, pad, dilation,
                              group, group_channels, offset_scale)


dcnv3_sampling.defvjp(_dcnv3_sampling_fwd, _dcnv3_sampling_bwd)


@functools.partial(jax.jit, static_argnames=("kernel", "pad", "dilation", "group",
                                             "group_channels", "offset_scale",
                                             "interpret"))
def _dcnv3_banded_dispatch(x, offset, mask, kernel, pad, dilation, group,
                           group_channels, offset_scale, interpret=False):
    """Runtime band check + cond between the banded kernel and the lax core."""
    from yolo_dual_tpu.nn.dcn import dcnv3_coords, dcnv3_core

    b, h, w, c = x.shape
    kk = kernel * kernel
    gc = group_channels
    hin, win = h + 2 * pad, w + 2 * pad
    band, center = _band_geometry(kernel, dilation)
    band = min(band, hin)  # small maps: the band IS the whole slab (no escapes)

    sxf, syf = dcnv3_coords(offset, kernel, 1, pad, dilation, group, h, w,
                            offset_scale)
    sx = sxf.reshape(b * group, h, w, kk)
    sy = syf.reshape(b * group, h, w, kk)
    m = mask.reshape(b, h, w, group, kk).transpose(0, 3, 1, 2, 4) \
        .reshape(b * group, h, w, kk).astype(jnp.float32)

    # band-escape predicate: any corner row that is INSIDE the padded image
    # but OUTSIDE its output row's band (out-of-image corners contribute 0)
    j_rows = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    r0 = jnp.clip(j_rows + center - band // 2, 0, hin - band)
    y0 = jnp.floor(sy)
    esc = jnp.zeros((), bool)
    for dy in (0.0, 1.0):
        yi = y0 + dy
        esc = esc | jnp.any((yi >= 0) & (yi < hin)
                            & ((yi < r0) | (yi >= r0 + band)))

    def run_banded(args):
        xx, sxx, syy, mm = args
        return _dcnv3_banded_impl(xx, sxx, syy, mm, kernel, pad, group, gc,
                                  band, center, interpret)

    def run_lax(args):
        xx, _sxx, _syy, _mm = args
        return dcnv3_core(xx, offset, mask, kernel, 1, pad, dilation, group,
                          gc, offset_scale)

    return jax.lax.cond(esc, run_lax, run_banded, (x, sx, sy, m))


def _dcnv3_banded_impl(x, sx, sy, m, kernel, pad, group, gc, band, center,
                       interpret=False):
    from jax.experimental import pallas as pl

    b, h, w, c = x.shape
    kk = kernel * kernel
    hin, win = h + 2 * pad, w + 2 * pad
    bw = band * win

    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xg = xp.reshape(b, hin, win, group, gc).transpose(0, 3, 1, 2, 4) \
        .reshape(b * group, hin, win, gc).astype(jnp.float32)

    def body(xg_ref, sx_ref, sy_ref, m_ref, out_ref):
        j = pl.program_id(1)
        r0 = jnp.clip(j + center - band // 2, 0, hin - band)
        band_rows = xg_ref[0, pl.ds(r0, band)]            # (band, win, gc)
        band2d = band_rows.reshape(bw, gc)
        sxr = sx_ref[...].reshape(w, kk)
        syr = sy_ref[...].reshape(w, kk)
        mr = m_ref[...].reshape(w, kk)
        x0 = jnp.floor(sxr)
        y0 = jnp.floor(syr)
        wx = sxr - x0
        wy = syr - y0
        a = jnp.zeros((w, bw), jnp.float32)
        r0f = r0.astype(jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                yi = y0 + dy
                xi = x0 + dx
                inb = (xi >= 0) & (xi < win) & (yi >= 0) & (yi < hin)
                yl = yi - r0f
                inband = (yl >= 0) & (yl < band)
                wgt = (jnp.where(dy == 1, wy, 1 - wy)
                       * jnp.where(dx == 1, wx, 1 - wx))
                wgt = jnp.where(inb & inband, wgt, 0.0) * mr      # (w, kk)
                flat = (jnp.clip(yl, 0, band - 1).astype(jnp.int32) * win
                        + jnp.clip(xi, 0, win - 1).astype(jnp.int32))
                # accumulate all kk kernel points into the (w, bw) gather
                # matrix — the kk axis disappears before the matmul
                for q in range(kk):
                    a = a + jax.nn.one_hot(flat[:, q], bw,
                                           dtype=jnp.float32) * wgt[:, q:q + 1]
        # HIGHEST: the one-hot select must not round band values to bf16
        # (default MXU precision costs ~2e-3 relative error, measured)
        out = jax.lax.dot_general(a, band2d,
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        out_ref[...] = out.astype(out_ref.dtype).reshape(1, 1, w, gc)

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


# ---------------------------------------------------------------------------
# Banded BACKWARD kernel — the TPU counterpart of the reference's
# dcnv3_col2im CUDA backward (src/cuda/dcnv3_im2col_cuda.cuh). The lax
# scatter backward measured ~1000 ms for one bs16 80x80 layer (tools/
# bench_dcn.py); here every per-row gather/scatter is a small MXU matmul
# against the band: values v_c = H @ band, input grad dx_band += H^T @ (g·w·m)
# with H the per-(corner, kernel-point) one-hot matrix — built on the VPU,
# never touching HBM.
# ---------------------------------------------------------------------------


# Measured crossover (tools/bench_dcn.py, v5e, bs16, 2026-08-19): the banded
# backward wins 1.7-3x at 80x80 maps (lax scatter 0.9-3.0 s/layer there) but
# LOSES ~2-4x at <=40x40, where its per-row VPU work (w·kk one-hot builds,
# serial fori over kk) dominates while the lax scatter is already cheap.
_BWD_MIN_AREA = 80 * 80


def dcnv3_bwd_dispatch(x, offset, mask, g_out, kernel, stride, pad, dilation,
                       group, group_channels, offset_scale, interpret=False):
    """(dx, doffset, dmask) via the banded kernel when shapes+offsets allow,
    else the exact lax backward (`nn.dcn.dcnv3_core_bwd`)."""
    from yolo_dual_tpu.nn.dcn import dcnv3_core_bwd
    if (stride != 1
            or not _supported(x, kernel, stride, dilation, group_channels, pad)
            or (x.shape[1] * x.shape[2] < _BWD_MIN_AREA and not interpret)
            or jax.default_backend() not in ("tpu", "axon") and not interpret):
        return dcnv3_core_bwd(x, offset, mask, g_out, kernel, stride, pad,
                              dilation, group, group_channels, offset_scale)
    return _dcnv3_banded_bwd(x, offset, mask, g_out, kernel, pad, dilation,
                             group, group_channels, offset_scale, interpret)


@functools.partial(jax.jit, static_argnames=("kernel", "pad", "dilation", "group",
                                             "group_channels", "offset_scale",
                                             "interpret"))
def _dcnv3_banded_bwd(x, offset, mask, g_out, kernel, pad, dilation, group,
                      group_channels, offset_scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from yolo_dual_tpu.nn.dcn import dcnv3_coords, dcnv3_core_bwd

    b, h, w, c = x.shape
    kk = kernel * kernel
    gc = group_channels
    hin, win = h + 2 * pad, w + 2 * pad
    band, center = _band_geometry(kernel, dilation)
    band = min(band, hin)
    bw = band * win
    bg = b * group
    f32 = jnp.float32

    sxf, syf = dcnv3_coords(offset.astype(f32), kernel, 1, pad, dilation, group,
                            h, w, offset_scale)
    sx = sxf.reshape(bg, h, w, kk)
    sy = syf.reshape(bg, h, w, kk)
    m = mask.astype(f32).reshape(b, h, w, group, kk).transpose(0, 3, 1, 2, 4) \
        .reshape(bg, h, w, kk)
    gg = g_out.astype(f32).reshape(b, h, w, group, gc).transpose(0, 3, 1, 2, 4) \
        .reshape(bg, h, w, gc)
    xp = jnp.pad(x.astype(f32), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xg = xp.reshape(b, hin, win, group, gc).transpose(0, 3, 1, 2, 4) \
        .reshape(bg, hin, win, gc)

    # band-escape predicate (same geometry as the forward dispatch)
    j_rows = jnp.arange(h, dtype=f32)[None, :, None, None]
    r0v = jnp.clip(j_rows + center - band // 2, 0, hin - band)
    y0v = jnp.floor(sy)
    esc = jnp.zeros((), bool)
    for dy in (0.0, 1.0):
        yi = y0v + dy
        esc = esc | jnp.any((yi >= 0) & (yi < hin)
                            & ((yi < r0v) | (yi >= r0v + band)))

    # Grid (bg, h): one program per output row, mirroring the forward kernel —
    # an earlier lax.fori_loop-over-rows formulation kept every unrolled
    # one-hot temp live across the loop body and blew the 16 MB scoped-VMEM
    # stack at 80×80 (61 MB allocation, measured); per-row grid programs let
    # Mosaic reuse the stack the same way the forward does. dx accumulates
    # directly into a REVISITED output block (index map constant in j, so the
    # slab stays in VMEM for the whole row sweep of each batch·group program).
    def body(xg_ref, sx_ref, sy_ref, m_ref, gg_ref, dx_ref, dsx_ref, dsy_ref,
             dm_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dx_ref[...] = jnp.zeros((1, hin, win, gc), f32)

        r0 = jnp.clip(j + center - band // 2, 0, hin - band)
        band2d = xg_ref[0, pl.ds(r0, band)].reshape(bw, gc)
        sxr = sx_ref[...].reshape(w, kk)
        syr = sy_ref[...].reshape(w, kk)
        mr = m_ref[...].reshape(w, kk)
        g_row = gg_ref[...].reshape(w, gc)
        x0 = jnp.floor(sxr)
        y0 = jnp.floor(syr)
        wx = sxr - x0
        wy = syr - y0
        r0f = r0.astype(f32)
        # per (q, corner): the same (w, bw) one-hot the forward builds serves
        # both the value gather (H @ band) and the input-grad scatter
        # (H^T @ g·m·wgt). The q loop is a lax.fori_loop, NOT unrolled: with
        # 36 unrolled one-hot temps Mosaic allocates them all on the kernel
        # stack (no cross-iteration reuse) and blows the 16 MB scoped-VMEM
        # limit at 80×80 (37.6 MB, measured); the fori body keeps one
        # iteration's temps live. Lane-q selection is a masked reduce
        # (iota==q), because Mosaic supports neither dynamic lane slicing nor
        # the scatter that .at[:, q].set would lower to.
        qiota = jax.lax.broadcasted_iota(jnp.int32, (w, kk), 1)

        def qstep(q, carry):
            dband, dsx_acc, dsy_acc, dm_acc = carry
            qsel = (qiota == q).astype(f32)                   # (w, kk)

            def lane(t):
                return (t * qsel).sum(axis=1, keepdims=True)  # (w, 1)

            x0q, y0q = lane(x0), lane(y0)
            wxq, wyq = lane(wx), lane(wy)
            mq = lane(mr)
            dsamp_q = g_row * mq                              # (w, gc)
            vals = {}
            for dy in (0, 1):
                for dx_ in (0, 1):
                    yi = y0q + dy                             # (w, 1)
                    xi = x0q + dx_
                    ok = ((xi >= 0) & (xi < win) & (yi >= 0) & (yi < hin)
                          & (yi - r0f >= 0) & (yi - r0f < band))
                    flat = (jnp.clip(yi - r0f, 0, band - 1).astype(jnp.int32)
                            * win
                            + jnp.clip(xi, 0, win - 1).astype(jnp.int32))
                    hmat = (jax.nn.one_hot(flat[:, 0], bw, dtype=f32)
                            * ok.astype(f32))                 # (w, bw)
                    v = jax.lax.dot_general(
                        hmat, band2d,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)  # (w, gc)
                    vals[(dy, dx_)] = v
                    wgt = (jnp.where(dy == 1, wyq, 1 - wyq)
                           * jnp.where(dx_ == 1, wxq, 1 - wxq))
                    dband = dband + jax.lax.dot_general(
                        hmat, dsamp_q * wgt,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)  # (bw, gc)
            v00, v01 = vals[(0, 0)], vals[(0, 1)]
            v10, v11 = vals[(1, 0)], vals[(1, 1)]
            samp_q = (v00 * (1 - wxq) * (1 - wyq) + v01 * wxq * (1 - wyq)
                      + v10 * (1 - wxq) * wyq + v11 * wxq * wyq)
            dd_dwx = (1 - wyq) * (v01 - v00) + wyq * (v11 - v10)
            dd_dwy = (1 - wxq) * (v10 - v00) + wxq * (v11 - v01)
            dsx_acc = dsx_acc + ((dsamp_q * dd_dwx).sum(-1, keepdims=True)
                                 * offset_scale) * qsel
            dsy_acc = dsy_acc + ((dsamp_q * dd_dwy).sum(-1, keepdims=True)
                                 * offset_scale) * qsel
            dm_acc = dm_acc + (samp_q * g_row).sum(-1, keepdims=True) * qsel
            return dband, dsx_acc, dsy_acc, dm_acc

        zcol = jnp.zeros((w, kk), f32)
        dband, dsx_acc, dsy_acc, dm_acc = jax.lax.fori_loop(
            0, kk, qstep, (jnp.zeros((bw, gc), f32), zcol, zcol, zcol))
        dsx_ref[...] = dsx_acc.reshape(1, 1, w, kk)
        dsy_ref[...] = dsy_acc.reshape(1, 1, w, kk)
        dm_ref[...] = dm_acc.reshape(1, 1, w, kk)
        dx_ref[0, pl.ds(r0, band)] += dband.reshape(band, win, gc)

    outs = pl.pallas_call(
        body,
        grid=(bg, h),
        # 18.8 MB of live stack at 80×80 (slab + dband + 4 unrolled corner
        # one-hots) exceeds the 16 MB default scoped-vmem budget; v5e has
        # 128 MB of VMEM, so raise the cap rather than shrink the band.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, hin, win, gc), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, gc), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hin, win, gc), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, kk), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, hin, win, gc), f32),
            jax.ShapeDtypeStruct((bg, h, w, kk), f32),
            jax.ShapeDtypeStruct((bg, h, w, kk), f32),
            jax.ShapeDtypeStruct((bg, h, w, kk), f32),
        ],
        interpret=interpret,
    )(xg, sx, sy, m, gg)
    dxg, dsx_o, dsy_o, dm_o = outs

    def banded_result(_):
        dxp = dxg.reshape(b, group, hin, win, gc).transpose(0, 2, 3, 1, 4) \
            .reshape(b, hin, win, c)
        dx = dxp[:, pad:hin - pad, pad:win - pad, :]

        def unflat(t):  # (bg, h, w, kk) -> (b, h, w, group, kk)
            return t.reshape(b, group, h, w, kk).transpose(0, 2, 3, 1, 4)

        doff = jnp.stack([unflat(dsx_o), unflat(dsy_o)], axis=-1) \
            .reshape(b, h, w, group * kk * 2)
        dmask = unflat(dm_o).reshape(b, h, w, group * kk)
        return (dx.astype(x.dtype), doff.astype(offset.dtype),
                dmask.astype(mask.dtype))

    def lax_result(_):
        return dcnv3_core_bwd(x, offset, mask, g_out, kernel, 1, pad, dilation,
                              group, gc, offset_scale)

    return jax.lax.cond(esc, lax_result, banded_result, None)
