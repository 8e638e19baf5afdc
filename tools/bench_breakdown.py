"""Stage-by-stage throughput breakdown of the inference hot path on the
current default device (TPU): unfused vs conv+BN-fused forward, then
+decode+NMS via the old full-decode path vs the fused nms_from_raw path.
Loop-slope methodology (see bench.py docstring — the axon tunnel adds ~0.8s
constant per dispatch, so only in-loop slopes are trustworthy)."""

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


def slope(run, n1=2, n2=50, repeats=3):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def main():
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.ops.nms import nms_batched, nms_from_raw

    model = SegmentationModel(CFG, dtype=jnp.bfloat16)
    variables = model.init(imgsz=IMGSZ)
    fmodel, fvars = model.fuse(variables)
    head_kw = model.spec.layers[-1].kw()
    anchors, strides = head_kw["anchors"], head_kw["strides"]
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (BS, IMGSZ, IMGSZ, 3)).astype(np.float32))

    def mk_raw(mdl, mvars):
        @jax.jit
        def loop(iters):
            def body(i, acc):
                xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
                levels, protos = mdl.module.apply(mvars, xi, train=False, decode=False)
                return acc + sum(l.astype(jnp.float32).mean() for l in levels) \
                    + protos.astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    @jax.jit
    def loop_decode_nms(iters):
        def body(i, acc):
            xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            pred, protos, _ = model.module.apply(variables, xi, train=False)
            out, nv = nms_batched(pred.astype(jnp.float32), conf_thres=0.25,
                                  iou_thres=0.45, max_det=300, nm=32, pre_nms_topk=1024)
            return acc + out[:, :, 4].sum() + protos.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def loop_raw_nms(iters):
        def body(i, acc):
            xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            levels, protos = fmodel.module.apply(fvars, xi, train=False, decode=False)
            out, nv = nms_from_raw(levels, anchors, strides, conf_thres=0.25,
                                   iou_thres=0.45, max_det=300, nm=32, pre_nms_topk=1024)
            return acc + out[:, :, 4].sum() + protos.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    cases = (("raw_fwd unfused", mk_raw(model, variables)),
             ("raw_fwd fused", mk_raw(fmodel, fvars)),
             ("old decode+nms_batched", loop_decode_nms),
             ("fused fwd+nms_from_raw", loop_raw_nms))
    for name, loop in cases:
        per = slope(loop)
        print(f"{name:24s} {per * 1e3:8.2f} ms/iter  {BS / per:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
