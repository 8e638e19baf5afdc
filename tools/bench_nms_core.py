"""Direct core-vs-core NMS timing: serial greedy vs block-greedy vs cluster
fixpoint, vmapped over the serving batch shape (bs=32, k=1024 candidates,
max_det=300), no model in the loop. Loop-slope methodology."""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

import yolo_dual_tpu.ops.nms as N

BS, K, MD = 32, 1024, 300


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def slope(run, n1=2, n2=40, repeats=4):
    run(n1)
    t1 = min(_timed(run, n1) for _ in range(repeats))
    t2 = min(_timed(run, n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 600, (BS, K, 2)).astype(np.float32)
    wh = rng.uniform(4, 120, (BS, K, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(np.sort(rng.uniform(0.25, 1, (BS, K)).astype(np.float32))[:, ::-1].copy())

    cases = [
        ("serial", lambda b, s: N.nms_padded(b, s, 0.45, MD)),
        ("block=8", lambda b, s: N.nms_padded_block(b, s, 0.45, MD, block=8)),
        ("block=16", lambda b, s: N.nms_padded_block(b, s, 0.45, MD, block=16)),
        ("block=32", lambda b, s: N.nms_padded_block(b, s, 0.45, MD, block=32)),
        ("block=64", lambda b, s: N.nms_padded_block(b, s, 0.45, MD, block=64)),
        ("cluster", lambda b, s: N.nms_padded_cluster(b, s, 0.45, MD)),
    ]
    for name, fn in cases:
        batched = jax.vmap(fn)

        @jax.jit
        def loop(boxes, scores, iters, batched=batched):
            def body(i, acc):
                keep = batched(boxes + i.astype(jnp.float32) * 1e-5, scores)
                return acc + keep.sum()
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        per = slope(lambda n: loop(boxes, scores, n))
        print(f"{name:10s} {per * 1e3:8.3f} ms/iter ({per / BS * 1e6:7.1f} us/img)", flush=True)


if __name__ == "__main__":
    main()
