"""Op-level TPU profile of the fused inference path: captures a jax.profiler
trace of the production forward (+optional decode+NMS) and prints the top-K
HLO ops by self-time, parsed from the xplane proto via
tensorboard_plugin_profile. Localizes wall-clock to individual fusions —
follow-up to tools/bench_fwd_layers.py's prefix-level breakdown."""

import glob
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

CFG = ROOT / "yolo_dual_tpu" / "configs" / "segment" / "yolov5s-seg.yaml"
BS, IMGSZ = 32, 640
LOGDIR = "/tmp/jax_fwd_trace"


def capture(with_nms: bool):
    from yolo_dual_tpu.models.model import SegmentationModel
    from yolo_dual_tpu.ops.nms import nms_from_raw

    model = SegmentationModel(CFG, dtype=jnp.bfloat16)
    variables = model.init(imgsz=IMGSZ)
    model, variables = model.fuse(variables)
    head_kw = model.spec.layers[-1].kw()
    anchors, strides = head_kw["anchors"], head_kw["strides"]
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (BS, IMGSZ, IMGSZ, 3)).astype(np.float32))

    @jax.jit
    def loop(variables, x, iters):
        def body(i, acc):
            xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            levels, protos = model.module.apply(variables, xi, train=False, decode=False)
            if with_nms:
                out, nv = nms_from_raw(levels, anchors, strides, conf_thres=0.25,
                                       iou_thres=0.45, max_det=300, nm=32, pre_nms_topk=1024)
                return acc + out[:, :, 4].sum() + protos.astype(jnp.float32).mean()
            return acc + sum(l.astype(jnp.float32).mean() for l in levels) \
                + protos.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(loop(variables, x, 2))  # compile
    with jax.profiler.trace(LOGDIR):
        np.asarray(loop(variables, x, 20))


def report(topk: int = 45):
    """Aggregate device-lane event durations from the Chrome trace JSON."""
    import gzip
    import json
    from collections import defaultdict

    traces = sorted(glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True))
    assert traces, f"no trace.json.gz under {LOGDIR}"
    with gzip.open(traces[-1], "rt") as f:
        t = json.load(f)
    events = t["traceEvents"]
    # device lanes: pid whose process_name metadata mentions TPU / device
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    print(f"planes: { {p: names[p] for p in dev_pids} }")
    print(f"total device time: {total / 1e3:.2f} ms over {len(agg)} distinct ops")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:topk]:
        print(f"{dur / 1e3:9.3f} ms  {100 * dur / max(total, 1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    with_nms = "--nms" in sys.argv
    capture(with_nms)
    report()
