"""Isolate the segment-loss mask branch: forward+backward time of the
scan-chunked formulation (current) vs a single-shot dense lattice, at the
bench.py operating point (bs=16, capacity=128, 6 live rows/img, P3 proto
160x160x32). Identifies whether the lax.scan+cond restructure pays for
itself in the TRAIN step (its backward is the suspect)."""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.losses.detect import bce_with_logits
from yolo_dual_tpu.ops.boxes import xywh2xyxy
from yolo_dual_tpu.ops.mask_ops import crop_mask

BS, C, NM, MH, MW = 16, 128, 32, 160, 160
LIVE = 6


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def slope(run, n1=2, n2=40, repeats=3):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def make_inputs():
    rng = np.random.default_rng(0)
    pmask = rng.normal(size=(BS, C, NM)).astype(np.float32)
    proto = rng.normal(size=(BS, MH, MW, NM)).astype(np.float32)
    tidx = np.full((BS, C), -1, np.int32)
    tidx[:, :LIVE] = rng.integers(0, 6, (BS, LIVE))
    xywhn = np.zeros((BS, C, 4), np.float32)
    xywhn[:, :LIVE] = rng.uniform(0.2, 0.6, (BS, LIVE, 4))
    val = np.zeros((BS, C), bool)
    val[:, :LIVE] = True
    masks = rng.integers(0, 7, (BS, MH, MW)).astype(np.float32)
    return (jnp.asarray(pmask), jnp.asarray(proto), jnp.asarray(tidx),
            jnp.asarray(xywhn), jnp.asarray(val), jnp.asarray(masks))


def mask_loss(pmask, proto, tidx, xywhn, val, masks, ck: int):
    cdt = jnp.bfloat16
    scalev = jnp.asarray([MW, MH, MW, MH], jnp.float32)

    def chunk_sum(pm_j, tidx_j, xywhn_j, val_j):
        pred = jnp.einsum("bkn,bhwn->bkhw", pm_j.astype(cdt), proto.astype(cdt),
                          preferred_element_type=jnp.float32).astype(cdt)
        gt = (masks[:, None] == (tidx_j + 1)[..., None, None].astype(masks.dtype)).astype(cdt)
        marea = xywhn_j[..., 2] * xywhn_j[..., 3]
        mxyxy = xywh2xyxy(xywhn_j * scalev)
        bce = bce_with_logits(pred, gt)
        per = jax.vmap(crop_mask)(bce, mxyxy.astype(jnp.float32)).astype(jnp.float32) \
            .mean(axis=(2, 3)) / jnp.maximum(marea, 1e-9)
        return jnp.where(val_j, per, 0.0).sum(axis=1)

    nch = -(-C // ck)
    pm_s = pmask.reshape(BS, nch, ck, NM).swapaxes(0, 1)
    ti_s = tidx.reshape(BS, nch, ck).swapaxes(0, 1)
    xw_s = xywhn.reshape(BS, nch, ck, 4).swapaxes(0, 1)
    v_s = val.reshape(BS, nch, ck).swapaxes(0, 1)

    if nch == 1:
        acc = chunk_sum(pmask, tidx, xywhn, val)
    else:
        def scan_body(acc, xs):
            pm_j, ti_j, xw_j, v_j = xs
            s = jax.lax.cond(jnp.any(v_j),
                             lambda: chunk_sum(pm_j, ti_j, xw_j, v_j),
                             lambda: jnp.zeros((BS,), jnp.float32))
            return acc + s, None
        acc, _ = jax.lax.scan(scan_body, jnp.zeros((BS,), jnp.float32),
                              (pm_s, ti_s, xw_s, v_s))
    cnt = jnp.maximum(val.sum(1).astype(jnp.float32), 1.0)
    return (acc / cnt).sum()


def bench(name, ck, live_cap=None):
    inputs = make_inputs()
    if live_cap is not None:
        # shrink capacity to live_cap rows before the loss (host-side gather
        # is free here; in the real loss this is the _compact capacity)
        pmask, proto, tidx, xywhn, val, masks = inputs
        inputs = (pmask[:, :live_cap], proto, tidx[:, :live_cap],
                  xywhn[:, :live_cap], val[:, :live_cap], masks)
        globals()["C_eff"] = live_cap

    c_eff = inputs[0].shape[1]

    def f(pmask, proto, tidx, xywhn, val, masks):
        return mask_loss(pmask, proto, tidx, xywhn, val, masks, ck)

    grad = jax.grad(f, argnums=(0, 1))

    @jax.jit
    def loop(pmask, proto, tidx, xywhn, val, masks, iters):
        def body(i, acc):
            g0, g1 = grad(pmask + i * 1e-6, proto, tidx, xywhn, val, masks)
            return acc + g0.sum() + g1.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    per = slope(lambda n: loop(*inputs, n))
    print(f"{name} (C={c_eff}, ck={ck}): {per * 1e3:.2f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    bench("scan-chunk ck=32", 32)
    bench("single dense chunk", 128)
    bench("dense capacity=32", 32, live_cap=32)
