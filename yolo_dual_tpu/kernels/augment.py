"""Device-side train-time augmentation: fused mosaic-composite + affine/
perspective warp + HSV jitter + flips + normalize.

The reference builds the 4-image mosaic canvas, warps it with cv2, HSV-jitters
through uint8 LUTs and flips — all on the host CPU per sample (reference
utils/dataloaders.py:431-918, utils/augmentations.py:67-237). That path is the
input-pipeline bottleneck the north star calls out. Here the HOST only decodes
JPEGs and does label geometry (cheap numpy); every PIXEL operation runs on the
TPU in one jitted pass per batch:

  out(x, y) = hsv_jitter( warp( composite(tiles) ) )(flip(x, y)) / 255

fused so the 2s x 2s mosaic canvas is NEVER materialized: for each output
pixel the inverse warp coordinate is computed, the covering mosaic tile is
selected analytically (the 4 placement rectangles are disjoint), and that tile
is sampled bilinearly. Bilinear sampling uses a gather; compositing, selection,
HSV and flips are VPU elementwise — XLA fuses the lot.

Semantics vs the reference host path: identical except (a) within 1px of an
internal mosaic seam, where the reference's bilinear taps may straddle two
tiles while we edge-clamp into the selected tile, and (b) uint8-LUT rounding
in HSV (we compute in f32 and never round to uint8 since the output is the
normalized float the model consumes anyway). Both are sub-quantization-step
effects inside a *random* augmentation. Exactness is oracle-tested against
`mosaic_warp_hsv_reference` (numpy mirror) and against the host cv2 path on
identity warps (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FILL = 114.0


def _rgb_to_hsv(rgb):
    """(..., 3) float in [0,255] -> h in [0,1), s,v in [0,255] (cv2 scaling:
    cv2 uses h in [0,180), we keep [0,1) and scale at the gain site)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.maximum(maxc, 1e-12) * 255.0, 0.0)
    safe_d = jnp.maximum(d, 1e-12)
    rc = (maxc - r) / safe_d
    gc = (maxc - g) / safe_d
    bc = (maxc - b) / safe_d
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(d == 0, 0.0, (h / 6.0) % 1.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    """h in [0,1), s,v in [0,255] -> (..., 3) float in [0,255]."""
    sn = s / 255.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - sn)
    q = v * (1.0 - sn * f)
    t = v * (1.0 - sn * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _hsv_jitter(img, gains):
    """Reference augment_hsv semantics (utils/augmentations.py:67-80): hue
    VALUE scaled by r0 mod the hue range, sat/val scaled and clipped. gains =
    (r0, r1, r2); r == (1,1,1) is an exact no-op (guarded multiplicatively)."""
    h, s, v = _rgb_to_hsv(img)
    # cv2 hue is [0,180); the LUT is (x * r0) % 180 on the uint8 hue
    h2 = (h * 180.0 * gains[0]) % 180.0 / 180.0
    s2 = jnp.clip(s * gains[1], 0.0, 255.0)
    v2 = jnp.clip(v * gains[2], 0.0, 255.0)
    out = _hsv_to_rgb(h2, s2, v2)
    identity = (gains[0] == 1.0) & (gains[1] == 1.0) & (gains[2] == 1.0)
    return jnp.where(identity, img, out)


def _bilinear_tile(tile, ys, xs):
    """Sample (s,s,3) tile at float coords (H,W) with edge clamp."""
    s = tile.shape[0]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    y1i = jnp.clip(y0i + 1, 0, s - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    x1i = jnp.clip(x0i + 1, 0, s - 1)
    v00 = tile[y0i, x0i]
    v01 = tile[y0i, x1i]
    v10 = tile[y1i, x0i]
    v11 = tile[y1i, x1i]
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def _one_sample(tiles, dst, off, inv_m, hsv_gains, flips, out_size):
    """tiles (4,s,s,3) uint8; dst (4,4) f32 canvas rects [x1,y1,x2,y2];
    off (4,2) f32 (dst->src offset, src = canvas - dst_origin + src_origin);
    inv_m (3,3) f32 inverse warp; hsv_gains (3,); flips (2,) bool (ud, lr)."""
    o = out_size
    yy = jax.lax.broadcasted_iota(jnp.float32, (o, o), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (o, o), 1)
    # flips commute to coordinate flips BEFORE the warp-read (the reference
    # flips the final image; flipping output coords is identical)
    yy = jnp.where(flips[0], (o - 1) - yy, yy)
    xx = jnp.where(flips[1], (o - 1) - xx, xx)
    # inverse warp: canvas coords (u, v) for each output pixel
    w = inv_m[2, 0] * xx + inv_m[2, 1] * yy + inv_m[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    u = (inv_m[0, 0] * xx + inv_m[0, 1] * yy + inv_m[0, 2]) / w
    v = (inv_m[1, 0] * xx + inv_m[1, 1] * yy + inv_m[1, 2]) / w

    out = jnp.full((o, o, 3), FILL, jnp.float32)
    for k in range(4):
        x1, y1, x2, y2 = dst[k, 0], dst[k, 1], dst[k, 2], dst[k, 3]
        inside = (u >= x1) & (u < x2) & (v >= y1) & (v < y2)
        us = u + off[k, 0]
        vs = v + off[k, 1]
        sample = _bilinear_tile(tiles[k].astype(jnp.float32), vs, us)
        out = jnp.where(inside[..., None], sample, out)
    out = _hsv_jitter(out, hsv_gains)
    return out / 255.0


@functools.partial(jax.jit, static_argnames=("out_size",))
def mosaic_warp_hsv(tiles, dst, off, inv_m, hsv_gains, flips, out_size: int = 640):
    """Batched device augmentation.

    tiles: (B, 4, s, s, 3) uint8 — mosaic source images, each zero-padded to
           (s, s); for the non-mosaic path pass the single image in slot 0 and
           empty dst rects for slots 1-3.
    dst:   (B, 4, 4) f32 — placement rects on the virtual canvas (the 2s x 2s
           mosaic canvas coords; reference utils/dataloaders.py:653-676).
    off:   (B, 4, 2) f32 — per-tile (src - dst) coordinate offset.
    inv_m: (B, 3, 3) f32 — INVERSE of the sampled perspective matrix
           (data/augment.py sample_perspective_matrix).
    hsv_gains: (B, 3) f32; flips: (B, 2) bool.
    Returns (B, out_size, out_size, 3) f32 in [0, 1].
    """
    return jax.vmap(functools.partial(_one_sample, out_size=out_size))(
        tiles, dst, off, inv_m, hsv_gains, flips)


# ---------------------------------------------------------------------------
# Readable numpy mirror for parity tests (same math, same seam semantics).
# ---------------------------------------------------------------------------

def mosaic_warp_hsv_reference(tiles, dst, off, inv_m, hsv_gains, flips,
                              out_size: int = 640):
    import colorsys  # noqa: F401  (documentational: mirrors _rgb_to_hsv math)
    b = tiles.shape[0]
    out = np.zeros((b, out_size, out_size, 3), np.float32)
    for n in range(b):
        yy, xx = np.mgrid[0:out_size, 0:out_size].astype(np.float64)
        if flips[n, 0]:
            yy = (out_size - 1) - yy
        if flips[n, 1]:
            xx = (out_size - 1) - xx
        w = inv_m[n, 2, 0] * xx + inv_m[n, 2, 1] * yy + inv_m[n, 2, 2]
        w = np.where(np.abs(w) < 1e-9, 1e-9, w)
        u = (inv_m[n, 0, 0] * xx + inv_m[n, 0, 1] * yy + inv_m[n, 0, 2]) / w
        v = (inv_m[n, 1, 0] * xx + inv_m[n, 1, 1] * yy + inv_m[n, 1, 2]) / w
        img = np.full((out_size, out_size, 3), FILL, np.float64)
        for k in range(4):
            x1, y1, x2, y2 = dst[n, k]
            inside = (u >= x1) & (u < x2) & (v >= y1) & (v < y2)
            us, vs = u + off[n, k, 0], v + off[n, k, 1]
            t = tiles[n, k].astype(np.float64)
            s = t.shape[0]
            y0 = np.floor(vs)
            x0 = np.floor(us)
            wy = (vs - y0)[..., None]
            wx = (us - x0)[..., None]
            y0i = np.clip(y0.astype(int), 0, s - 1)
            y1i = np.clip(y0i + 1, 0, s - 1)
            x0i = np.clip(x0.astype(int), 0, s - 1)
            x1i = np.clip(x0i + 1, 0, s - 1)
            smp = (t[y0i, x0i] * (1 - wy) * (1 - wx) + t[y0i, x1i] * (1 - wy) * wx
                   + t[y1i, x0i] * wy * (1 - wx) + t[y1i, x1i] * wy * wx)
            img = np.where(inside[..., None], smp, img)
        if not np.allclose(hsv_gains[n], 1.0):
            import cv2
            u8 = img.clip(0, 255).astype(np.uint8)
            hsvim = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float64)
            hsvim[..., 0] = (hsvim[..., 0] * hsv_gains[n, 0]) % 180
            hsvim[..., 1] = np.clip(hsvim[..., 1] * hsv_gains[n, 1], 0, 255)
            hsvim[..., 2] = np.clip(hsvim[..., 2] * hsv_gains[n, 2], 0, 255)
            img = cv2.cvtColor(hsvim.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float64)
        out[n] = img / 255.0
    return out
