"""Cumulative per-layer-prefix timing of the FUSED inference forward on the
current default device: builds truncated copies of the yolov5s-seg graph
(layers [0..k)) and loop-slope-times each, so successive differences localize
which blocks of the network the wall-clock lives in. Loop-slope methodology —
see bench.py docstring (the axon tunnel adds ~0.8 s constant per dispatch).

Run AFTER bench.py is idle; each truncation costs one compile (~20-40 s).
"""

import dataclasses
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
    from yolo_dual_tpu.models.model import GraphModel, SegmentationModel

    full = SegmentationModel(CFG, dtype=jnp.bfloat16)
    spec = full.spec
    n_layers = len(spec.layers)
    x_np = np.random.default_rng(0).uniform(0, 1, (BS, IMGSZ, IMGSZ, 3)).astype(np.float32)
    x = jnp.asarray(x_np)

    # cut AFTER these layer indices (prefix [0..k]); last = full model
    cuts = [int(a) for a in sys.argv[1:]] or [1, 4, 6, 8, 9, 13, 17, 20, 23]
    prev_t, prev_k = 0.0, 0
    rows = []
    for k in cuts + [n_layers - 1]:
        sub_layers = spec.layers[:k + 1]
        if any(l.name in ("Detect", "Segment", "DetectAux") for l in sub_layers[:-1]):
            pass  # heads only ever appear last; prefixes are safe
        sub = dataclasses.replace(spec, layers=sub_layers)
        is_head = sub_layers[-1].name in ("Detect", "Segment", "DetectAux")
        mod = GraphModel(spec=sub, dtype=jnp.bfloat16, fused=False)
        variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, IMGSZ, IMGSZ, 3)), train=False)
        if not is_head:
            # fold conv+BN like the production path
            from yolo_dual_tpu.models.model import fuse_conv_bn
            fvars = fuse_conv_bn(variables, 1e-3)
            fmod = GraphModel(spec=sub, dtype=jnp.bfloat16, fused=True)
        else:
            from yolo_dual_tpu.models.model import fuse_conv_bn
            fvars = fuse_conv_bn(variables, 1e-3)
            fmod = GraphModel(spec=sub, dtype=jnp.bfloat16, fused=True)

        @jax.jit
        def loop(v, iters):
            def body(i, acc):
                xi = (x + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
                out = fmod.apply(v, xi, train=False, decode=False)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(l.astype(jnp.float32).mean() for l in leaves)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        t = slope(lambda n: loop(fvars, n))
        name = sub_layers[-1].name
        rows.append((k, name, t))
        print(f"layers[0..{k:2d}] ({name:12s}): {t * 1e3:7.2f} ms/iter  "
              f"(+{(t - prev_t) * 1e3:6.2f} ms for layers {prev_k}..{k})", flush=True)
        prev_t, prev_k = t, k + 1


if __name__ == "__main__":
    main()
