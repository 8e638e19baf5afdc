"""Model-zoo smoke CLI: build every config under yolo_dual_tpu/configs/** and
report per-config exceptions — the reference's `python models/yolo.py --test`
(models/yolo.py:409-414). `--profile` times one real forward per config
instead of the free shape-only probe.

Usage:
    python tools/zoo_smoke.py [--glob 'segment/*.yaml'] [--imgsz 64] [--profile]
"""

import argparse
import sys
import time
import traceback
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


def main(glob: str, imgsz: int, profile: bool, device: str, verbose: bool = False) -> int:
    from yolo_dual_tpu.utils.general import select_device
    select_device(device)
    import jax
    import jax.numpy as jnp

    from yolo_dual_tpu.models.model import build_model

    cfgs = sorted(p for p in CONFIGS.glob(glob) if p.suffix == ".yaml"
                  and p.parent.name not in ("hyps", "data"))
    failures = []
    for cfg in cfgs:
        rel = cfg.relative_to(CONFIGS)
        try:
            t0 = time.perf_counter()
            model = build_model(cfg)
            x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
            if profile:
                variables = model.init(imgsz=imgsz)
                out = jax.block_until_ready(model.apply(variables, x, train=False))
                t1 = time.perf_counter()
                out = jax.block_until_ready(model.apply(variables, x, train=False))
                dt = time.perf_counter() - t1
                print(f"OK   {rel}  build+compile {t1 - t0:.1f}s  fwd {dt * 1e3:.1f}ms")
            else:
                variables = jax.eval_shape(
                    lambda xx: model.module.init(jax.random.PRNGKey(0), xx, train=False), x)
                jax.eval_shape(lambda v, xx: model.module.apply(v, xx, train=False),
                               variables, x)
                print(f"OK   {rel}")
        except Exception as e:  # noqa: BLE001 — per-config report, like the reference
            failures.append(rel)
            print(f"FAIL {rel}: {type(e).__name__}: {e}")
            if verbose:
                traceback.print_exc()
    print(f"\n{len(cfgs) - len(failures)}/{len(cfgs)} configs OK"
          + (f"; failures: {[str(f) for f in failures]}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--glob", default="**/*.yaml")
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=64)
    p.add_argument("--profile", action="store_true", help="real timed forward per config")
    p.add_argument("--device", default="")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="full traceback on per-config failures")
    a = p.parse_args()
    sys.exit(main(a.glob, a.imgsz, a.profile, a.device, a.verbose))
