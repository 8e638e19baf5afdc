"""Detection / instance-segmentation heads with anchor decode.

Capability parity with the reference heads (reference models/yolo.py:38-106
Detect/Segment, models/common.py:838-848 Proto). TPU-first design notes:

- Grids and anchor grids are compile-time constants (static shapes under jit);
  no cached-buffer rebuild logic is needed.
- Training output keeps the torch logical layout (bs, na, ny, nx, no) so the
  loss and weight-parity tests line up 1:1 with the reference.
- Inference decode `xy=(σ·2+grid)·stride`, `wh=(σ·2)²·anchor` is vectorized
  over all levels and concatenated to (bs, Σ na·ny·nx, no).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from yolo_dual_tpu.nn.common import Proto

Dtype = Any


def _level_grid(ny: int, nx: int, na: int, dtype=jnp.float32):
    """(1, na, ny, nx, 2) grid of cell top-left offsets minus 0.5 (ref models/yolo.py:81-89)."""
    yv, xv = jnp.meshgrid(jnp.arange(ny, dtype=dtype), jnp.arange(nx, dtype=dtype), indexing="ij")
    grid = jnp.stack((xv, yv), -1) - 0.5
    return jnp.broadcast_to(grid[None, None], (1, na, ny, nx, 2))


class Detect(nn.Module):
    """Anchor-based YOLO detection head (reference models/yolo.py:38-89).

    anchors: ((w,h)*na per level), in input-pixel units.
    strides: per-level stride; must be provided (computed by the model builder).
    """

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...]
    nm: int = 0   # mask coefficients (Segment sets 32)
    dtype: Dtype = None

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def no(self) -> int:
        return self.nc + 5 + self.nm

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False, decode: Optional[bool] = None):
        if decode is None:
            decode = not train
        na, no = self.na, self.no
        raw, z = [], []
        for i, x in enumerate(xs):
            bs, ny, nx, _ = x.shape
            p = nn.Conv(no * na, (1, 1), use_bias=True, dtype=self.dtype, name=f"m_{i}")(x)
            # NHWC conv output (bs, ny, nx, na*no) -> torch logical (bs, na, ny, nx, no)
            p = p.reshape(bs, ny, nx, na, no).transpose(0, 3, 1, 2, 4)
            raw.append(p)
            if decode:
                stride = float(self.strides[i])
                anchor = jnp.asarray(np.asarray(self.anchors[i], np.float32).reshape(na, 2))
                grid = _level_grid(ny, nx, na, p.dtype)
                anchor_grid = anchor.reshape(1, na, 1, 1, 2).astype(p.dtype)
                if self.nm:
                    xy, wh, conf, mask = jnp.split(p, [2, 4, 5 + self.nc], axis=-1)
                    xy = (jax.nn.sigmoid(xy) * 2 + grid) * stride
                    wh = (jax.nn.sigmoid(wh) * 2) ** 2 * anchor_grid
                    y = jnp.concatenate([xy, wh, jax.nn.sigmoid(conf), mask], -1)
                else:
                    ps = jax.nn.sigmoid(p)
                    xy = (ps[..., :2] * 2 + grid) * stride
                    wh = (ps[..., 2:4] * 2) ** 2 * anchor_grid
                    y = jnp.concatenate([xy, wh, ps[..., 4:]], -1)
                z.append(y.reshape(bs, na * ny * nx, no))
        if decode:
            return jnp.concatenate(z, axis=1), raw
        return raw


class Segment(nn.Module):
    """Segment head = Detect + 32 mask coefficients + Proto net
    (reference models/yolo.py:92-106)."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...]
    nm: int = 32
    npr: int = 256
    dtype: Dtype = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False, decode: Optional[bool] = None):
        if decode is None:
            decode = not train
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        det = Detect(self.nc, self.anchors, self.strides, nm=self.nm, dtype=self.dtype, name="detect")(
            xs, train=train, decode=decode
        )
        if decode:
            pred, raw = det
            return pred, protos, raw
        return det, protos


class DetectAux(nn.Module):
    """Dual-head Detect for AuxOTA training (reference models/yolo_AuxOTA.py):
    2·nl inputs — the first nl are the lead head, the rest auxiliary. Training
    returns raw maps for both; inference decodes the lead head only."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...]
    dtype: Dtype = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False,
                 decode: Optional[bool] = None):
        if decode is None:
            decode = not train
        nl = len(self.anchors)
        assert len(xs) == 2 * nl, f"DetectAux expects {2*nl} inputs, got {len(xs)}"
        lead = Detect(self.nc, self.anchors, self.strides, dtype=self.dtype, name="lead")
        out = lead(xs[:nl], train=train, decode=decode)
        na = len(self.anchors[0]) // 2
        no = self.nc + 5
        aux_raw = []
        for i, x in enumerate(xs[nl:]):
            bs, ny, nx, _ = x.shape
            p = nn.Conv(no * na, (1, 1), use_bias=True, dtype=self.dtype, name=f"m_aux_{i}")(x)
            aux_raw.append(p.reshape(bs, ny, nx, na, no).transpose(0, 3, 1, 2, 4))
        if decode:
            pred, raw = out
            return pred, raw + aux_raw
        return out + aux_raw
