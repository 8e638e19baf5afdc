"""Record the semantic golden mIoUs (tests/test_semantic_golden.py): trains
each of the 7 semantic configs on the deterministic synthetic CamVid scene
and prints the reached mIoU — paste the floor values into GOLDENS.

Run on CPU (matches the test environment):
    JAX_PLATFORMS=cpu python tools/record_semantic_goldens.py [cfg ...]
"""

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import conftest  # noqa: F401  (pins the cpu backend like the test session)
from test_semantic_golden import GOLDENS, _run_config, make_camvid_scene  # noqa: E402


def main():
    cfgs = sys.argv[1:] or sorted(GOLDENS)
    with tempfile.TemporaryDirectory() as td:
        img_dir, json_dir = make_camvid_scene(Path(td) / "scene")
        results = {}
        for cfg in cfgs:
            miou = _run_config(cfg, img_dir, json_dir, Path(td) / "runs")
            results[cfg] = miou
            print(f"GOLDEN {cfg}: mIoU={miou:.4f}", flush=True)
        print("\nGOLDENS = {")
        for k, v in results.items():
            print(f'    "{k}": {v:.2f},')
        print("}")


if __name__ == "__main__":
    main()
