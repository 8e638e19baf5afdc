"""Input-pipeline throughput: can the HOST feed the DEVICE? (VERDICT r2 #3)

Measures, on a synthetic-but-realistic dataset (640x480 jpegs, ~6 polygon
instances each):

  1. train loader img/s — mosaic + copy_paste + random_perspective + HSV +
     flips + polygons->overlap masks at hyp.scratch-low settings, the
     reference LoadImagesAndLabelsAndMasks hot path
     (reference utils/segment/dataloaders.py:86-263)
  2. train loader img/s with device_aug — host does decode+geometry only;
     compositing/warp/HSV run on device (kernels/augment.py)
  3. val loader img/s — host letterbox path (reference utils/dataloaders.py:
     703 letterbox + val.py H2D)
  4. single-image predict preprocess ms — the segment/predict.py letterbox

and prints each against the measured device appetite (train ~544 img/s,
inference ~2288 img/s on v5e, docs/ROADMAP.md) per HOST CORE — multiply by
worker cores for a production host.

Usage: python tools/bench_loader.py [--n 96] [--imgsz 640] [--bs 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

TRAIN_DEMAND = 544.0   # img/s, docs/ROADMAP.md bs16@640 train step
INFER_DEMAND = 2288.0  # img/s, batched inference


def make_dataset(root: Path, n: int, w: int = 640, h: int = 480):
    import cv2
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lines = []
        for _ in range(6):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            r = rng.uniform(0.05, 0.15)
            ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
            poly = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1).clip(0.01, 0.99)
            lines.append(f"{rng.integers(0, 80)} "
                         + " ".join(f"{v:.4f}" for v in poly.ravel()))
        cv2.imwrite(str(img_dir / f"{i:05d}.jpg"), im)
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(lines) + "\n")
    return img_dir


HYP = dict(mosaic=1.0, mixup=0.0, copy_paste=0.0, degrees=0.0, translate=0.1,
           scale=0.5, shear=0.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7,
           hsv_v=0.4, flipud=0.0, fliplr=0.5)


def drain(loader, epochs: int = 1):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            # device_aug batches ship raw tiles + geometry instead of a
            # composed image (segment/train.py 'aug_tiles' contract);
            # semantic device_preprocess batches ship raw frames
            key = next(k for k in ("image", "aug_tiles", "image_raw") if k in batch)
            n += batch[key].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    # Host-only measurement: pin jax to CPU the way tests/conftest.py does —
    # the env var alone is overridden by boxes whose sitecustomize
    # force-registers an accelerator plugin (r4 finding: one stray jnp op per
    # image wedged this bench on the single-client TPU relay). Inside main(),
    # NOT at module level: tools that import make_dataset/HYP from here
    # (bench_e2e_train) must keep their TPU backend.
    import jax
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--device-aug", action="store_true",
                    help="also measure the device_aug split pipeline")
    ap.add_argument("--task", choices=["segment", "semantic", "classify"],
                    default="segment")
    args = ap.parse_args()

    if args.task == "semantic":
        return main_semantic(args)
    if args.task == "classify":
        return main_classify(args)

    from yolo_dual_tpu.data import create_dataloader
    out = {}
    with tempfile.TemporaryDirectory() as td:
        img_dir = make_dataset(Path(td), args.n)

        # 1. train pipeline (host-everything, reference-style)
        loader, ds = create_dataloader(str(img_dir), args.imgsz, args.bs, hyp=HYP,
                                       augment=True, mask_downsample_ratio=4,
                                       overlap_mask=True, task="segment", shuffle=True)
        next(iter(loader))  # warm the label cache
        out["train_host_img_s"] = drain(loader)

        # 1b. steady-state with the RAM image cache (reference --cache ram):
        #     epoch 2+ never re-decodes jpegs — the multi-epoch training rate
        loader_c, _ = create_dataloader(str(img_dir), args.imgsz, args.bs, hyp=HYP,
                                        augment=True, mask_downsample_ratio=4,
                                        overlap_mask=True, task="segment",
                                        shuffle=True, cache_images="ram")
        drain(loader_c)  # epoch 1 fills the cache
        out["train_host_img_s_ram_cache"] = drain(loader_c)

        # 2. train pipeline, device_aug split (host: decode+geometry;
        #    device: composite+warp+HSV) — host side only here; the device
        #    cost is measured in tools/bench_device_aug.py
        if args.device_aug:
            loader2, _ = create_dataloader(str(img_dir), args.imgsz, args.bs, hyp=HYP,
                                           augment=True, mask_downsample_ratio=4,
                                           overlap_mask=True, task="segment",
                                           shuffle=True, device_aug=True)
            next(iter(loader2))
            out["train_host_img_s_device_aug"] = drain(loader2)
            loader2c, _ = create_dataloader(str(img_dir), args.imgsz, args.bs, hyp=HYP,
                                            augment=True, mask_downsample_ratio=4,
                                            overlap_mask=True, task="segment",
                                            shuffle=True, device_aug=True,
                                            cache_images="ram")
            drain(loader2c)
            out["train_host_img_s_device_aug_ram_cache"] = drain(loader2c)

        # 3. val pipeline (host letterbox, no augment)
        vloader, _ = create_dataloader(str(img_dir), args.imgsz, args.bs,
                                       augment=False, mask_downsample_ratio=4,
                                       overlap_mask=True, task="segment")
        next(iter(vloader))
        out["val_host_img_s"] = drain(vloader)

        # 4. predict single-image preprocess
        import cv2
        from yolo_dual_tpu.data.augment import letterbox
        im = cv2.imread(str(next(img_dir.glob("*.jpg"))))
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            x, _, _ = letterbox(im, args.imgsz, auto=False)
            x = np.ascontiguousarray(x[..., ::-1], np.float32) / 255.0
        out["predict_preprocess_ms"] = (time.perf_counter() - t0) / reps * 1e3

    out["train_demand_img_s"] = TRAIN_DEMAND
    out["infer_demand_img_s"] = INFER_DEMAND
    out["train_feed_ratio_1core"] = round(out["train_host_img_s"] / TRAIN_DEMAND, 3)
    out["val_feed_ratio_1core"] = round(out["val_host_img_s"] / INFER_DEMAND, 3)
    out["cores_to_feed_train"] = int(np.ceil(TRAIN_DEMAND / out["train_host_img_s"]))
    best = max(out.get("train_host_img_s_device_aug_ram_cache", 0.0),
               out["train_host_img_s_ram_cache"])
    out["cores_to_feed_train_best"] = int(np.ceil(TRAIN_DEMAND / max(best, 1e-9)))
    out["cores_to_feed_val"] = int(np.ceil(INFER_DEMAND / out["val_host_img_s"]))
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()


SEM_TRAIN_DEMAND = 136.0   # img/s, resnet50 semantic device step (BENCH_r04)


def make_semantic_dataset(root: Path, n: int, w: int = 640, h: int = 480):
    """CamVid-shaped (non-square) images + reference-format JSON dense masks."""
    import json as _json

    import cv2
    img_dir, json_dir = root / "imgs", root / "jsons"
    img_dir.mkdir(parents=True)
    json_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = rng.integers(0, 12, (h, w), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"{i:05d}.jpg"), im)
        (json_dir / f"{i:05d}.json").write_text(_json.dumps({
            "filename": f"{i:05d}.jpg", "shape": [h, w], "dtype": "uint8",
            "class_names": [], "mask_data": mask.flatten().astype(int).tolist()}))
    return img_dir, json_dir


def main_semantic(args):
    """Semantic input side (VERDICT r4 next #3): host-everything vs the
    device_preprocess split (host: decode + cached JSON parse; device:
    resize-pad + hflip/brightness/contrast, kernels semantic_preprocess),
    against the measured 129-142 img/s semantic device step."""
    from yolo_dual_tpu.data import create_json_segment_dataloader
    out = {}
    with tempfile.TemporaryDirectory() as td:
        img_dir, json_dir = make_semantic_dataset(Path(td), args.n)

        for label, kw in (
                ("host_all_aug", dict(augment=True)),
                ("host_all_noaug", dict(augment=False)),
                ("device_preprocess", dict(augment=True, device_preprocess=True))):
            loader, _ = create_json_segment_dataloader(
                str(img_dir), str(json_dir), args.imgsz, args.bs, **kw)
            drain(loader)  # epoch 1 warms the .npy mask sidecar cache
            out[f"sem_host_img_s[{label}]"] = round(drain(loader), 1)
            out[f"sem_cores_to_feed[{label}]"] = int(
                np.ceil(SEM_TRAIN_DEMAND / max(out[f"sem_host_img_s[{label}]"], 1e-9)))
    out["sem_train_demand_img_s"] = SEM_TRAIN_DEMAND
    print(json.dumps(out, indent=2))


def make_classify_dataset(root: Path, n: int, w: int = 640, h: int = 480):
    import cv2
    rng = np.random.default_rng(0)
    for ci in range(2):
        d = root / "train" / f"class{ci}"
        d.mkdir(parents=True)
        for i in range(n // 2):
            cv2.imwrite(str(d / f"{i:05d}.jpg"),
                        rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    return root / "train"


def main_classify(args):
    """Classification input side (VERDICT r4 next #9): RandomResizedCrop+
    flip+jitter train path and CenterCrop val path (reference
    utils/dataloaders.py:1162-1240), cold and RAM-cached."""
    from yolo_dual_tpu.data.classify import create_classification_dataloader
    imgsz = args.imgsz if args.imgsz != 640 else 224  # classify default size
    out = {"imgsz": imgsz}
    with tempfile.TemporaryDirectory() as td:
        root = make_classify_dataset(Path(td), args.n)
        for label, kw in (
                ("train_aug", dict(augment=True)),
                ("train_aug_ram_cache", dict(augment=True, cache="ram")),
                ("val_centercrop", dict(augment=False))):
            loader, _ = create_classification_dataloader(
                str(root), imgsz, args.bs, shuffle=True, **kw)
            drain(loader)  # warm (fills RAM cache when enabled)
            out[f"cls_host_img_s[{label}]"] = round(drain(loader), 1)
    print(json.dumps(out, indent=2))
