"""One-command real-data semantic parity: CamVid mIoU, ours vs the live
reference trainer (VERDICT r3 next-#9, the semantic counterpart of
tools/parity_coco128.py).

The reference's VERIFIED flagship is the ResNet50+SegmentHead dice-loss
semantic trainer (`/root/reference/unet-lite/Resnet50/seg_diceloss_Resnet50.py`)
trained on CamVid (12 classes, ignore_index=11; its --data default points at a
local CamVid tree). The build environment has no egress, so this stages the
whole flow for the day data is reachable:

    python tools/parity_camvid.py --epochs 30            # download + convert +
                                                         # train ours + write table
    python tools/parity_camvid.py --also-reference       # additionally train the
                                                         # live torch reference
                                                         # in-process on the same
                                                         # files (CPU)

Steps:
 1. resolve the CamVid tree (local dir with {train,trainannot,val,valannot}/ or
    download the SegNet-Tutorial archive, the dataset's canonical public host)
 2. convert the grayscale class-id annot PNGs to the reference's JSON mask
    format (our `batch_convert_masks_to_json` ≡ reference mask_to_json,
    seg_diceloss_Resnet50.py:203-241)
 3. train `semantic/train.py --cfg resnet50.yaml --loss dice` for N epochs →
    best val mIoU (ignore_index=11, the reference recipe)
 4. optionally run the live reference trainer on the same files via a data
    yaml pointing at the converted dirs (device=cpu, same epochs/imgsz/bs)
 5. append the side-by-side mIoU table to docs/PARITY.md

Testable offline: tests/test_small_parity.py::test_parity_camvid_staged runs
main() with a stubbed downloader + a tiny synthetic CamVid tree.
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import zipfile
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

CAMVID_URL = "https://github.com/alexgkendall/SegNet-Tutorial/archive/refs/heads/master.zip"


def fetch_camvid(dataset_dir: str, downloader=None):
    """Resolve a CamVid tree with {train,trainannot,val,valannot}/ subdirs,
    downloading the SegNet-Tutorial archive if missing. `downloader(url, dest)`
    is injectable for offline testing."""
    from yolo_dual_tpu.utils.downloads import safe_download
    downloader = downloader or safe_download

    dpath = Path(dataset_dir)
    if not (dpath / "train").exists():
        dpath.parent.mkdir(parents=True, exist_ok=True)
        zpath = dpath.parent / "segnet-tutorial.zip"
        downloader(CAMVID_URL, zpath)
        zipfile.ZipFile(zpath).extractall(dpath.parent)
        zpath.unlink()
        extracted = dpath.parent / "SegNet-Tutorial-master" / "CamVid"
        if extracted.exists() and not dpath.exists():
            extracted.rename(dpath)
    for sub in ("train", "trainannot", "val", "valannot"):
        assert (dpath / sub).exists(), f"CamVid tree missing {sub}/ under {dpath}"
    return dpath


def convert_masks(dpath: Path):
    """Grayscale annot PNGs -> reference JSON mask format, both splits."""
    from yolo_dual_tpu.data import batch_convert_masks_to_json

    names = ["sky", "building", "pole", "road", "pavement", "tree", "signsymbol",
             "fence", "car", "pedestrian", "bicyclist", "unlabelled"]
    for split in ("train", "val"):
        out = dpath / f"{split}_json"
        if not out.exists() or not any(out.glob("*.json")):
            batch_convert_masks_to_json(dpath / f"{split}annot", out, names)
    return dpath / "train_json", dpath / "val_json"


def run_ours(dpath: Path, train_json: Path, val_json: Path, epochs: int,
             imgsz: int, batch_size: int, out_dir: Path, cfg: str = "resnet50.yaml"):
    """Train our semantic flagship on the converted tree; returns best mIoU."""
    spec = importlib.util.spec_from_file_location("our_sem_train",
                                                  ROOT / "semantic" / "train.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["our_sem_train"] = mod
    spec.loader.exec_module(mod)
    opt = mod.parse_opt([
        "--cfg", cfg, "--img-dir", str(dpath / "train"), "--json-dir", str(train_json),
        "--val-img-dir", str(dpath / "val"), "--val-json-dir", str(val_json),
        "--imgsz", str(imgsz), "--batch-size", str(batch_size),
        "--epochs", str(epochs), "--loss", "dice",
        "--project", str(out_dir), "--name", "camvid-parity", "--exist-ok"])
    return float(mod.train(opt))


def run_reference(dpath: Path, train_json: Path, val_json: Path, epochs: int,
                  imgsz: int, batch_size: int, out_dir: Path,
                  reference: Path = Path("/root/reference")):
    """Train the LIVE reference ResNet50 dice trainer on the same files (CPU).
    Returns its best fitness (mIoU) or None when the reference is absent."""
    if not reference.exists():
        return None
    import yaml
    ref_dir = reference / "unet-lite" / "Resnet50"
    sys.path.insert(0, str(reference))
    data_yaml = out_dir / "camvid_ref.yaml"
    out_dir.mkdir(parents=True, exist_ok=True)
    data_yaml.write_text(yaml.safe_dump(dict(
        train_img=str(dpath / "train"), train_json=str(train_json),
        val_img=str(dpath / "val"), val_json=str(val_json),
        nc=12, names={i: str(i) for i in range(12)})))
    spec = importlib.util.spec_from_file_location("ref_sem_train",
                                                  ref_dir / "seg_diceloss_Resnet50.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_sem_train"] = mod
    spec.loader.exec_module(mod)
    import torch
    opt = argparse.Namespace(
        weights="", cfg=str(ref_dir / "resnet50.yaml"), data=str(data_yaml),
        epochs=epochs, batch_size=batch_size, imgsz=imgsz, device="cpu",
        workers=0, freeze=[0], patience=max(epochs, 10), single_cls=False,
        sync_bn=False, cos_lr=False, resume=False,
        save_dir=str(out_dir / "ref-camvid"), optimizer="SGD",
        label_smoothing=0.0, seed=0, noval=False, nosave=False, exist_ok=True,
        amp=False, class_weights="", hyp="", evolve=False, noplots=True)
    result = mod.train(hyp={}, opt=opt, device=torch.device("cpu"),
                       callbacks=mod.Callbacks())
    # train() returns best fitness tuple/scalar depending on version
    try:
        return float(result)
    except TypeError:
        return float(result[0])


def write_table(ours, ref=None, epochs=0, imgsz=640,
                out: Path = ROOT / "docs" / "PARITY.md"):
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    lines = [f"\n## CamVid real-data semantic parity ({stamp})\n",
             f"resnet50 dice, {epochs} epochs @{imgsz}, ignore_index=11 "
             "(reference unet-lite/Resnet50 recipe).\n",
             "| trainer | best val mIoU |",
             "|---|---|",
             f"| ours (semantic/train.py) | {ours:.4f} |"]
    if ref is not None:
        lines += [f"| reference (torch, live) | {ref:.4f} |",
                  f"| abs diff | {abs(ours - ref):.4f} |"]
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    return out


def main(argv=None, downloader=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", default="datasets/CamVid")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=4)  # reference default bs
    p.add_argument("--cfg", default="resnet50.yaml",
                   help="model config (overridable for offline dry-runs)")
    p.add_argument("--also-reference", action="store_true",
                   help="train the live torch reference on the same files")
    p.add_argument("--out-dir", default=str(ROOT / "runs" / "camvid-parity"))
    p.add_argument("--out", default=str(ROOT / "docs" / "PARITY.md"))
    args = p.parse_args(argv)

    dpath = fetch_camvid(args.dataset, downloader=downloader)
    train_json, val_json = convert_masks(dpath)
    out_dir = Path(args.out_dir)
    ours = run_ours(dpath, train_json, val_json, args.epochs, args.imgsz,
                    args.batch_size, out_dir, cfg=args.cfg)
    ref = (run_reference(dpath, train_json, val_json, args.epochs, args.imgsz,
                         args.batch_size, out_dir)
           if args.also_reference else None)
    out = write_table(ours, ref, args.epochs, args.imgsz, Path(args.out))
    print("ours mIoU:", ours)
    if ref is not None:
        print("ref  mIoU:", ref)
    print("table appended to", out)
    return ours, ref


if __name__ == "__main__":
    main()
