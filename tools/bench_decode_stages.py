"""Stage-by-stage timing of the fused inference path (yolov5s-seg @640 bs32):
forward | +conf reduce | +top_k | +gather/decode | +NMS — to locate where the
post-forward ~6-7 ms goes. Loop-slope methodology (bench.py)."""

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
BS, IMGSZ, K = 32, 640, 1024


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def slope(run, n1=2, n2=50, repeats=4):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def main():
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.ops.nms import _candidate_tables, nms_from_raw

    model = SegmentationModel(CFG, dtype=jnp.bfloat16)
    variables = model.init(imgsz=IMGSZ)
    model, variables = model.fuse(variables)
    head_kw = model.spec.layers[-1].kw()
    anchors, strides = head_kw["anchors"], head_kw["strides"]
    nm, nc = 32, 80
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (BS, IMGSZ, IMGSZ, 3)).astype(np.float32))

    def fwd(variables, xi):
        return model.module.apply(variables, xi, train=False, decode=False)

    def stage(upto):
        def f(variables, xi):
            raw, protos = fwd(variables, xi)
            acc = protos.astype(jnp.float32).mean()
            if upto == "fwd":
                return acc + sum(r.astype(jnp.float32).mean() for r in raw)
            no = raw[0].shape[-1]
            bs = raw[0].shape[0]
            flat = jnp.concatenate([p.reshape(bs, -1, no) for p in raw], axis=1)
            obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
            cls_logits = flat[..., 5:5 + nc]
            max_logit = cls_logits.max(axis=-1).astype(jnp.float32)
            cj_all = jnp.argmax(cls_logits, axis=-1).astype(jnp.float32)
            conf = jax.nn.sigmoid(max_logit) * obj
            conf = jnp.where(jnp.logical_and(conf > 0.25, obj > 0.25), conf, 0.0)
            if upto == "conf":
                return acc + conf.sum() + cj_all.sum()
            scores, cand_idx = jax.lax.top_k(conf, K)
            if upto == "topk":
                return acc + scores.sum() + cand_idx.sum() + cj_all.sum()
            shapes = tuple((p.shape[1], p.shape[2], p.shape[3]) for p in raw)
            grid, anch, strd = _candidate_tables(shapes, anchors, strides)
            rows = jnp.take_along_axis(flat, cand_idx[..., None], axis=1).astype(jnp.float32)
            g = grid[cand_idx]
            a = anch[cand_idx]
            s = strd[cand_idx][..., None]
            xy = (jax.nn.sigmoid(rows[..., :2]) * 2 + g) * s
            wh = (jax.nn.sigmoid(rows[..., 2:4]) * 2) ** 2 * a
            return acc + xy.sum() + wh.sum() + rows.sum()
        return f

    def full(variables, xi):
        raw, protos = fwd(variables, xi)
        out, nv = nms_from_raw(raw, anchors, strides, conf_thres=0.25,
                               iou_thres=0.45, max_det=300, nm=nm, pre_nms_topk=K)
        return out[:, :, 4].sum() + protos.astype(jnp.float32).mean()

    cases = [("fwd", stage("fwd")), ("fwd+conf", stage("conf")),
             ("fwd+topk", stage("topk")), ("fwd+decode", stage("decode")),
             ("full(+NMS)", full)]
    for name, f in cases:
        @jax.jit
        def loop(variables, x, iters, f=f):
            def body(i, acc):
                xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
                return acc + f(variables, xi).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        per = slope(lambda n: loop(variables, x, n))
        print(f"{name:12s} {per * 1e3:8.2f} ms/iter  {BS / per:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
