"""One-command real-weights parity: coco128-seg box/mask mAP from yolov5s-seg.pt.

This is the staged headline-parity runner (BASELINE.json `metric`; reference
evaluator `/root/reference/segment/val.py:128-400`, weights provenance
`/root/reference/utils/downloads.py:62-108`). The build environment has no
egress, so it could never run here — the day weights/data are reachable this
script produces the number with zero new code:

    python tools/parity_coco128.py                 # download + eval + write table
    python tools/parity_coco128.py --also-reference  # additionally run the live
                                                     # torch reference evaluator
                                                     # in-process on the same files

Steps:
 1. resolve `yolov5s-seg.pt` (local file or Ultralytics v7.0 release download)
 2. resolve coco128-seg (local dir or https://ultralytics.com/assets/coco128-seg.zip,
    the reference data yaml's own `download:` hook)
 3. import the torch state dict into our Flax tree and run our evaluator
    (segment/val.py run()) at 640px, conf 0.001 / iou 0.6 — the reference's
    val defaults
 4. optionally run the reference evaluator on the same weights+data for the
    side-by-side (requires the reference tree; NMS uses a pure-torch greedy
    fallback when torchvision is absent)
 5. append the mAP table to docs/PARITY.md

Testable offline: tests/test_small_parity.py::test_parity_coco128_staged runs
main() end-to-end with a stubbed downloader + a 2-image synthetic "coco128"
and checks the table lands in PARITY.md.
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def fetch_assets(weights: str, dataset_dir: str, downloader=None):
    """Resolve weights file + dataset dir, downloading either if missing.

    `downloader(url, dest)` is injectable for offline testing.
    """
    from yolo_dual_tpu.utils.downloads import attempt_download, safe_download
    downloader = downloader or safe_download

    wpath = Path(weights)
    if not wpath.exists():
        if Path(weights).name == "yolov5s-seg.pt" and downloader is not None:
            wpath.parent.mkdir(parents=True, exist_ok=True)
            from yolo_dual_tpu.utils.downloads import RELEASE_URL
            downloader(RELEASE_URL + wpath.name, wpath)
        else:
            wpath = attempt_download(weights)

    dpath = Path(dataset_dir)
    if not (dpath / "images").exists():
        # the reference data yaml's own hook: a zip that unpacks to coco128-seg/
        url = "https://ultralytics.com/assets/coco128-seg.zip"
        dpath.parent.mkdir(parents=True, exist_ok=True)
        zpath = dpath.parent / "coco128-seg.zip"
        downloader(url, zpath)
        zipfile.ZipFile(zpath).extractall(dpath.parent)
        zpath.unlink()
    return wpath, dpath


def run_ours(wpath: Path, dpath: Path, imgsz: int = 640, batch_size: int = 16,
             cfg: str = "yolov5s-seg.yaml"):
    """Our evaluator on the real weights/data; returns the 8 mean metrics."""
    import yaml
    data_yaml = dpath / "parity_data.yaml"
    names = yaml.safe_load((ROOT / "yolo_dual_tpu/configs/data/coco128-seg.yaml").read_text())["names"]
    data_yaml.write_text(yaml.safe_dump(dict(
        path=str(dpath), train="images/train2017", val="images/train2017", names=names)))
    sys.path.insert(0, str(ROOT / "segment"))
    import importlib.util
    spec = importlib.util.spec_from_file_location("our_seg_val", ROOT / "segment" / "val.py")
    our_val = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(our_val)
    results, maps, t = our_val.run(data=str(data_yaml), weights=str(wpath),
                                   cfg=cfg, batch_size=batch_size,
                                   imgsz=imgsz, conf_thres=0.001, iou_thres=0.6,
                                   plots=False)
    return [float(v) for v in results[:8]]


def run_reference(wpath: Path, dpath: Path, imgsz: int = 640, batch_size: int = 16,
                  reference: Path = Path("/root/reference")):
    """The live torch reference evaluator on the same files (side-by-side)."""
    if not reference.exists():
        return None
    sys.path.insert(0, str(reference))
    try:
        import torchvision  # noqa: F401
    except ImportError:  # pure-torch greedy NMS fallback (same semantics)
        sys.path.insert(0, str(ROOT / "tests"))
        import types
        import torch as _t
        from test_eval_parity_full import _torchvision_nms
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=_torchvision_nms)
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv
    import importlib.util
    spec = importlib.util.spec_from_file_location("ref_seg_val",
                                                  reference / "segment" / "val.py")
    ref_val = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_val)
    data = dict(path=str(dpath), val=str(dpath / "images/train2017"), nc=80,
                names={i: str(i) for i in range(80)})
    results, maps, t = ref_val.run(data, weights=str(wpath), batch_size=batch_size,
                                   imgsz=imgsz, conf_thres=0.001, iou_thres=0.6,
                                   half=False, plots=False, device="cpu")
    return [float(v) for v in results[:8]]


def write_table(ours, ref=None, out: Path = ROOT / "docs" / "PARITY.md"):
    cols = ["P(box)", "R(box)", "mAP50(box)", "mAP50-95(box)",
            "P(mask)", "R(mask)", "mAP50(mask)", "mAP50-95(mask)"]
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    lines = [f"\n## coco128-seg real-weights parity ({stamp})\n",
             "yolov5s-seg.pt @640, conf 0.001, iou 0.6 (reference val defaults).\n",
             "| evaluator | " + " | ".join(cols) + " |",
             "|---|" + "---|" * len(cols),
             "| ours (yolo_dual_tpu) | " + " | ".join(f"{v:.4f}" for v in ours) + " |"]
    if ref is not None:
        lines.append("| reference (torch, live) | "
                     + " | ".join(f"{v:.4f}" for v in ref) + " |")
        lines.append("| abs diff | "
                     + " | ".join(f"{abs(a - b):.4f}" for a, b in zip(ours, ref)) + " |")
    out.parent.mkdir(exist_ok=True)
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    return out


def main(argv=None, downloader=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights", default="yolov5s-seg.pt")
    p.add_argument("--dataset", default="datasets/coco128-seg")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--cfg", default="yolov5s-seg.yaml",
                   help="model config (overridable for offline dry-runs)")
    p.add_argument("--also-reference", action="store_true",
                   help="run the live torch reference evaluator too")
    p.add_argument("--out", default=str(ROOT / "docs" / "PARITY.md"))
    args = p.parse_args(argv)

    wpath, dpath = fetch_assets(args.weights, args.dataset, downloader=downloader)
    ours = run_ours(wpath, dpath, args.imgsz, args.batch_size, cfg=args.cfg)
    ref = (run_reference(wpath, dpath, args.imgsz, args.batch_size)
           if args.also_reference else None)
    out = write_table(ours, ref, Path(args.out))
    print("ours:", ours)
    if ref is not None:
        print("ref :", ref)
    print("table appended to", out)
    return ours, ref


if __name__ == "__main__":
    main()
