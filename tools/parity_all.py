"""Egress-day drill: ONE command that produces every real-weights/real-data
headline number the build box cannot measure offline (VERDICT r4 next #8).

    python tools/parity_all.py            # coco128-seg parity + CamVid mIoU + bench
    python tools/parity_all.py --no-bench # parity tables only

Runs, in order, each tolerating individual failure so one unreachable asset
doesn't void the others:
 1. tools/parity_coco128.py  — box/mask mAP50-95 from imported yolov5s-seg.pt
    via our evaluator (+ the live reference evaluator side-by-side),
    appended to docs/PARITY.md (BASELINE.json `metric`)
 2. tools/parity_camvid.py   — CamVid 12-class mIoU training run
    (reference unet-lite/Resnet50/val_diceloss.py:266-293 recipe),
    appended to docs/PARITY.md
 3. bench.py                 — the round bench row on the real chip

Exit code: number of failed stages. Offline-tested by
tests/test_small_parity.py::test_parity_all_drill (stubbed downloader,
synthetic assets, --no-bench).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def run_stage(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[parity_all] {name}: OK ({time.time() - t0:.0f}s)", flush=True)
        return True
    except SystemExit as e:  # argparse/main() sys.exit(0) is success
        ok = not e.code
        print(f"[parity_all] {name}: {'OK' if ok else f'FAILED ({e.code})'} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return ok
    except Exception as e:
        print(f"[parity_all] {name}: FAILED ({type(e).__name__}: {e})", flush=True)
        return False


def main(argv=None, downloader=None, coco_args=(), camvid_args=()):
    p = argparse.ArgumentParser()
    p.add_argument("--no-bench", action="store_true",
                   help="skip the bench.py stage (e.g. offline drill test)")
    p.add_argument("--no-reference", action="store_true",
                   help="skip the live-reference side-by-side halves")
    opt = p.parse_args(argv)

    from tools import parity_camvid, parity_coco128

    ref = () if opt.no_reference else ("--also-reference",)
    fails = 0
    fails += not run_stage(
        "coco128-seg parity",
        lambda: parity_coco128.main(list(ref) + list(coco_args),
                                    downloader=downloader))
    fails += not run_stage(
        "CamVid mIoU",
        lambda: parity_camvid.main(list(ref) + list(camvid_args),
                                   downloader=downloader))
    if not opt.no_bench:
        # subprocess: bench.py owns TPU-backend checks + retry policy, and the
        # single-client relay must see exactly one fresh holder
        fails += not run_stage(
            "bench", lambda: subprocess.run(
                [sys.executable, str(ROOT / "bench.py")], check=True))
    print(f"[parity_all] done: {fails} stage(s) failed", flush=True)
    return fails


if __name__ == "__main__":
    sys.exit(main())
