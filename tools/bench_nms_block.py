"""Measure serial-greedy vs block-greedy NMS inside the production inference
path (fused forward + nms_from_raw) at the bench shape (yolov5s-seg @640,
bs32, pre_nms_topk=1024, max_det=300). Loop-slope methodology (bench.py).

Usage: python tools/bench_nms_block.py [block ...]   # default: 0 8 16 32
block=0 = the serial while_loop baseline.
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

CFG = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
BS, IMGSZ = 32, 640


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def slope(run, n1=2, n2=60, repeats=4):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def main():
    import yolo_dual_tpu.ops.nms as N
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.ops.nms import nms_from_raw

    blocks = [int(a) for a in sys.argv[1:]] or [0, 8, 16, 32]
    model = SegmentationModel(CFG, dtype=jnp.bfloat16)
    variables = model.init(imgsz=IMGSZ)
    model, variables = model.fuse(variables)
    head_kw = model.spec.layers[-1].kw()
    anchors, strides = head_kw["anchors"], head_kw["strides"]
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (BS, IMGSZ, IMGSZ, 3)).astype(np.float32))

    serial = N.nms_padded

    for blk in blocks:
        if blk == 0:
            N.nms_padded = serial
        else:
            N.nms_padded = lambda b, s, t, m, _blk=blk: N.nms_padded_block(b, s, t, m, block=_blk)
        try:  # nms_from_raw is itself jitted: drop its traced jaxprs so the
            # monkeypatched global is actually re-read on the next trace
            nms_from_raw.clear_cache()
        except AttributeError:
            pass

        @jax.jit
        def loop(variables, x, iters):
            def body(i, acc):
                xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
                levels, protos = model.module.apply(variables, xi, train=False, decode=False)
                out, nv = nms_from_raw(levels, anchors, strides, conf_thres=0.25,
                                       iou_thres=0.45, max_det=300, nm=32,
                                       pre_nms_topk=1024)
                return acc + out[:, :, 4].sum() + protos.astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        per = slope(lambda n: loop(variables, x, n))
        name = "serial" if blk == 0 else f"block={blk}"
        print(f"{name:10s} {per * 1e3:8.2f} ms/iter  {BS / per:8.1f} img/s", flush=True)
    N.nms_padded = serial


if __name__ == "__main__":
    main()
