"""Pallas TPU kernel: fused letterbox-resize + pad + normalize.

The device-side replacement for the reference's CPU letterbox + /255 transfer
path (reference utils/augmentations.py:111-141 letterbox + segment/val.py:
244-250 H2D+half+/255): a batch of uint8 frames becomes normalized, padded,
aspect-preserved float tensors in one pass over VMEM — the input pipeline
never materializes an intermediate on host. SURVEY §7 step 6(b).

The bilinear vertical resample is expressed as a sparse row-mixing matrix
(rows_out × rows_in) matmul on the MXU; the horizontal resample likewise —
resize-as-matmul is the TPU-idiomatic formulation (it is what XLA lowers
`jax.image.resize` to, but fused here with the cast, scale and pad so the
uint8 never round-trips through HBM as f32 at full resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear half-pixel interpolation matrix."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        wx = src - x0
        for xx, ww in ((x0, 1 - wx), (x0 + 1, wx)):
            if 0 <= xx < n_in:
                m[i, xx] += ww
            else:
                m[i, np.clip(xx, 0, n_in - 1)] += ww  # edge clamp
    return m


@functools.partial(jax.jit, static_argnames=("out_size", "fill", "interpret", "scaleup"))
def letterbox_normalize(images: jnp.ndarray, out_size: int = 640,
                        fill: float = 114.0, interpret: bool = False,
                        scaleup: bool = True) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> float32 (B, S, S, 3) in [0,1], aspect-preserving,
    centered, gray-filled — the reference letterbox semantics, on device.
    scaleup=False pads small images instead of upscaling (the reference val
    convention, utils/augmentations.py:120)."""
    from jax.experimental import pallas as pl

    b, h, w, c = images.shape
    s = out_size
    r = min(s / h, s / w)
    if not scaleup:
        r = min(r, 1.0)
    nh, nw = int(round(h * r)), int(round(w * r))
    top = (s - nh) // 2
    left = (s - nw) // 2

    rm = jnp.asarray(_resize_matrix(h, nh))          # (nh, h)
    cm = jnp.asarray(_resize_matrix(w, nw).T)        # (w, nw)

    # Mosaic TC cannot reshape/transpose a trailing 3-channel lane dim, so the
    # kernel works on 2-D channel planes: HWC -> CHW outside (a cheap uint8
    # relayout XLA fuses with the H2D path), grid over (batch, channel).
    planes = jnp.transpose(images, (0, 3, 1, 2))     # (b, c, h, w) uint8

    def body(img_ref, rm_ref, cm_ref, out_ref):
        # u8 vectors support neither reshape nor direct f32 convert on the TC;
        # widen through int32 first, then fold the leading unit dims.
        img = img_ref[...].astype(jnp.int32).astype(jnp.float32).reshape(h, w)
        resized_rows = jax.lax.dot_general(
            rm_ref[...], img, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (nh, w)
        resized = jax.lax.dot_general(
            resized_rows, cm_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (nh, nw)
        # pad to the (s, s) canvas with static concatenates — top/left are
        # Python ints, and Mosaic TC has no dynamic_update_slice lowering
        fillv = jnp.float32(fill)
        parts_w = [p for p in (
            jnp.full((nh, left), fillv), resized,
            jnp.full((nh, s - nw - left), fillv)) if p.shape[1]]
        row = parts_w[0] if len(parts_w) == 1 else jnp.concatenate(parts_w, axis=1)
        parts_h = [p for p in (
            jnp.full((top, s), fillv), row,
            jnp.full((s - nh - top, s), fillv)) if p.shape[0]]
        canvas = parts_h[0] if len(parts_h) == 1 else jnp.concatenate(parts_h, axis=0)
        out_ref[...] = (canvas / 255.0).reshape(1, 1, s, s)

    out = pl.pallas_call(
        body,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((nh, h), lambda i, j: (0, 0)),
            pl.BlockSpec((w, nw), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, s, s), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, s, s), jnp.float32),
        interpret=interpret,
    )(planes, rm, cm)
    return jnp.transpose(out, (0, 2, 3, 1))          # back to NHWC


def letterbox_geometry(h: int, w: int, out_size: int, scaleup: bool = True):
    """(ratio, (left, top)) the kernel applies — for host-side label/box
    bookkeeping (the dataset's ratio_pad metadata)."""
    r = min(out_size / h, out_size / w)
    if not scaleup:
        r = min(r, 1.0)
    nh, nw = int(round(h * r)), int(round(w * r))
    return r, ((out_size - nw) // 2, (out_size - nh) // 2)


def letterbox_normalize_reference(images: np.ndarray, out_size: int = 640,
                                  fill: float = 114.0) -> np.ndarray:
    """Readable numpy reference for parity tests (same math as the kernel)."""
    b, h, w, c = images.shape
    s = out_size
    r = min(s / h, s / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    top = (s - nh) // 2
    left = (s - nw) // 2
    rm = _resize_matrix(h, nh)
    cm = _resize_matrix(w, nw)
    out = np.full((b, s, s, c), fill, np.float32)
    for i in range(b):
        resized = np.einsum("oh,hwc->owc", rm, images[i].astype(np.float32))
        resized = np.einsum("ow,hwc->hoc", cm, resized)
        out[i, top:top + nh, left:left + nw] = resized
    return out / 255.0


def _nearest_indices(n_in: int, n_out: int) -> np.ndarray:
    """cv2.INTER_NEAREST source indices for a n_in -> n_out resize."""
    return np.clip(np.floor((np.arange(n_out) + 0.5) * (n_in / n_out)),
                   0, n_in - 1).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("out_size", "fill", "interpret"))
def semantic_preprocess(images: jnp.ndarray, masks: jnp.ndarray,
                        out_size: int = 640, fill: float = 128.0,
                        flip=None, bright=None, contr=None,
                        interpret: bool = False):
    """Device-side semantic input path: aspect-preserving resize + center pad
    (+ optional per-sample hflip/brightness/contrast) for image AND dense
    mask, replacing the host cv2/PIL loop of the reference's
    JSONSegmentDataset (reference seg_diceloss_Resnet50.py:88-199 paired augs,
    :332-351 _resize_and_pad; SURVEY §3.1 names that loop the known CPU
    bottleneck). The image rides the same resize-as-matmul letterbox kernel
    the serving/val paths use (gray-128 fill, reference semantics); the mask
    is nearest-gathered and zero-filled (class 0), so labels stay crisp.

    images: (b, H, W, 3) uint8 — every sample at its NATIVE resolution (the
    loader ships raw frames; uniform shape per batch).
    masks: (b, H, W) integer class ids.
    flip/bright/contr: per-sample (b,) bool / f32 / f32 drawn by the host rng
    (None = off). Flip applies to the PADDED canvas; with odd padding this
    differs from the host path's flip-before-pad by a 1-px shift — an
    augmentation, not a parity surface.

    Returns (image f32 (b,S,S,3) in [0,1], mask (b,S,S) int32).
    """
    imgs = letterbox_normalize(images, out_size, fill=fill, interpret=interpret)
    b, h, w = masks.shape
    s = out_size
    r = min(s / h, s / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    top, left = (s - nh) // 2, (s - nw) // 2
    ry, rx = jnp.asarray(_nearest_indices(h, nh)), jnp.asarray(_nearest_indices(w, nw))
    m = masks[:, ry][:, :, rx].astype(jnp.int32)
    canvas = jnp.zeros((b, s, s), jnp.int32)
    canvas = jax.lax.dynamic_update_slice(canvas, m, (0, top, left))
    if flip is not None:
        imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)
        canvas = jnp.where(flip[:, None, None], canvas[:, :, ::-1], canvas)
    if bright is not None:
        imgs = imgs * bright[:, None, None, None]
    if contr is not None:
        mean = imgs.mean(axis=(1, 2, 3), keepdims=True)
        imgs = (imgs - mean) * contr[:, None, None, None] + mean
    if bright is not None or contr is not None:
        imgs = jnp.clip(imgs, 0.0, 1.0)
    return imgs, canvas
