"""Record the semantic golden mIoUs (tests/test_semantic_golden.py): trains
each semantic config on the deterministic synthetic CamVid scene and prints
the reached mIoU — paste the values into GOLDENS / GOLDENS_CONTROLLED.

Run on CPU (matches the test environment):
    JAX_PLATFORMS=cpu python tools/record_semantic_goldens.py [cfg ...]
    JAX_PLATFORMS=cpu python tools/record_semantic_goldens.py --controlled
(--controlled = the strong tier: 30 epochs, --nbs 4 --no-ema --no-augment,
the regime certified against the live reference trainer.)
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
from test_semantic_golden import (  # noqa: E402
    CONTROLLED_ARGS, GOLDENS, GOLDENS_CONTROLLED, _run_config, make_camvid_scene,
)


def main():
    controlled = "--controlled" in sys.argv
    cfgs = [a for a in sys.argv[1:] if not a.startswith("--")]
    cfgs = cfgs or sorted(GOLDENS_CONTROLLED if controlled else GOLDENS)
    epochs, extra = (30, CONTROLLED_ARGS) if controlled else (60, ())
    with tempfile.TemporaryDirectory() as td:
        img_dir, json_dir = make_camvid_scene(Path(td) / "scene")
        results = {}
        for cfg in cfgs:
            miou = _run_config(cfg, img_dir, json_dir, Path(td) / "runs",
                               epochs=epochs, extra=extra)
            results[cfg] = miou
            print(f"GOLDEN {cfg}: mIoU={miou:.4f}", flush=True)
        name = "GOLDENS_CONTROLLED" if controlled else "GOLDENS"
        print(f"\n{name} = {{")
        for k, v in results.items():
            print(f'    "{k}": {v:.4f},')
        print("}")


if __name__ == "__main__":
    main()
