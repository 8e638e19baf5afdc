"""JSON dense-mask semantic-segmentation dataset.

Capability parity with the reference's per-script JSONSegmentDataset family
(reference unet-lite/Resnet50/seg_diceloss_Resnet50.py:88-378): images dir +
per-image JSON {filename, shape, dtype, class_names, mask_data flat list},
PNG-mask -> JSON converter, completeness check, paired geometric/photometric
augmentations, aspect-preserving resize+pad to the training size (gray-128
image fill / class-0 label fill).

TPU-first: samples come out fixed-shape uint8; JSON parsing is the known CPU
bottleneck of the reference (SURVEY §3.1) — masks parsed once are cached as
.npy sidecars so steady-state epochs skip JSON entirely.
"""

from __future__ import annotations

import json
import os
import random
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def mask_to_json(mask_path, json_path, class_names: Optional[List[str]] = None):
    """PNG class-id mask -> JSON record (reference seg_diceloss_Resnet50.py:203-226)."""
    mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
    if mask is None:
        raise FileNotFoundError(mask_path)
    data = {
        "filename": os.path.basename(str(mask_path)),
        "shape": list(mask.shape),
        "dtype": str(mask.dtype),
        "class_names": class_names or [],
        "mask_data": mask.flatten().astype(int).tolist(),
    }
    with open(json_path, "w") as f:
        json.dump(data, f)
    return json_path


def batch_convert_masks_to_json(mask_dir, json_dir, class_names=None):
    """Convert a directory of PNG masks (reference :229-241)."""
    json_dir = Path(json_dir)
    json_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for m in sorted(Path(mask_dir).iterdir()):
        if m.suffix.lower() == ".png":
            mask_to_json(m, json_dir / (m.stem + ".json"), class_names)
            n += 1
    LOGGER.info(f"converted {n} masks -> {json_dir}")
    return n


def verify_json_masks(img_dir, json_dir) -> Tuple[bool, List[str]]:
    """Check every image has a JSON mask (reference :244-267)."""
    missing = []
    for im in sorted(Path(img_dir).iterdir()):
        if im.suffix.lower() in IMG_EXTS:
            if not (Path(json_dir) / (im.stem + ".json")).exists():
                missing.append(im.name)
    return len(missing) == 0, missing


def _load_json_mask(json_path, cache: bool = True) -> np.ndarray:
    npy = Path(str(json_path) + ".npy")
    if cache and npy.exists() and npy.stat().st_mtime >= Path(json_path).stat().st_mtime:
        return np.load(npy)
    raw = Path(json_path).read_bytes()
    try:
        # native C++ scanner (yolo_dual_tpu/native/fastmask.cpp) — the hot path
        from yolo_dual_tpu.native import parse_mask_json_bytes
        mask = parse_mask_json_bytes(raw).copy()
    except Exception:
        data = json.loads(raw)
        mask = np.asarray(data["mask_data"], np.uint8).reshape(data["shape"])
    if cache:
        try:
            np.save(npy, mask)
        except OSError:
            pass
    return mask


def resize_and_pad(img: np.ndarray, mask: Optional[np.ndarray], size: int,
                   img_fill: int = 128, mask_fill: int = 0):
    """Aspect-preserving resize + center pad (reference :332-351)."""
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = (size - nh) // 2
    left = (size - nw) // 2
    out = np.full((size, size, 3), img_fill, np.uint8)
    out[top:top + nh, left:left + nw] = img
    mout = None
    if mask is not None:
        mask = cv2.resize(mask, (nw, nh), interpolation=cv2.INTER_NEAREST)
        mout = np.full((size, size), mask_fill, np.uint8)
        mout[top:top + nh, left:left + nw] = mask
    return out, mout, (scale, (left, top))


class JSONSegmentDataset:
    """Fixed-shape semantic samples: {'image': (s,s,3) uint8, 'mask': (s,s) uint8}.

    Paired augmentations follow the reference set (HFlip/VFlip/Rotation/
    Brightness/Contrast/GaussianBlur/Crop, reference :88-199).
    """

    def __init__(self, img_dir, json_dir, img_size: int = 640, augment: bool = False,
                 num_classes: int = 12, aug_params: Optional[dict] = None, seed: int = 0,
                 device_preprocess: bool = False):
        self.img_dir = Path(img_dir)
        self.json_dir = Path(json_dir)
        self.img_size = img_size
        self.augment = augment
        self.num_classes = num_classes
        self.device_preprocess = device_preprocess
        self.rng = random.Random(seed)
        p = dict(hflip=0.5, vflip=0.0, degrees=10.0, rot_p=0.3, brightness=0.2,
                 contrast=0.2, blur_p=0.1, crop_p=0.3, crop_scale=0.8)
        p.update(aug_params or {})
        self.p = p
        self.items = []
        for im in sorted(self.img_dir.iterdir()):
            if im.suffix.lower() in IMG_EXTS:
                j = self.json_dir / (im.stem + ".json")
                if j.exists():
                    self.items.append((im, j))
        if not self.items:
            raise FileNotFoundError(f"no (image, json) pairs under {img_dir} / {json_dir}")

    def __len__(self):
        return len(self.items)

    def _augment_pair(self, img, mask):
        p, rng = self.p, self.rng
        if rng.random() < p["hflip"]:
            img, mask = np.fliplr(img).copy(), np.fliplr(mask).copy()
        if rng.random() < p["vflip"]:
            img, mask = np.flipud(img).copy(), np.flipud(mask).copy()
        if rng.random() < p["rot_p"]:
            a = rng.uniform(-p["degrees"], p["degrees"])
            h, w = img.shape[:2]
            M = cv2.getRotationMatrix2D((w / 2, h / 2), a, 1.0)
            img = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR, borderValue=(128, 128, 128))
            mask = cv2.warpAffine(mask, M, (w, h), flags=cv2.INTER_NEAREST, borderValue=0)
        if p["brightness"]:
            f = 1.0 + rng.uniform(-p["brightness"], p["brightness"])
            img = np.clip(img.astype(np.float32) * f, 0, 255).astype(np.uint8)
        if p["contrast"]:
            f = 1.0 + rng.uniform(-p["contrast"], p["contrast"])
            mean = img.mean()
            img = np.clip((img.astype(np.float32) - mean) * f + mean, 0, 255).astype(np.uint8)
        if rng.random() < p["blur_p"]:
            img = cv2.GaussianBlur(img, (5, 5), 0)
        if rng.random() < p["crop_p"]:
            h, w = img.shape[:2]
            s = rng.uniform(p["crop_scale"], 1.0)
            ch, cw = int(h * s), int(w * s)
            y0 = rng.randint(0, h - ch)
            x0 = rng.randint(0, w - cw)
            img, mask = img[y0:y0 + ch, x0:x0 + cw], mask[y0:y0 + ch, x0:x0 + cw]
        return img, mask

    def __getitem__(self, i):
        im_path, json_path = self.items[i]
        img = cv2.cvtColor(cv2.imread(str(im_path)), cv2.COLOR_BGR2RGB)
        mask = _load_json_mask(json_path)
        if mask.shape[:2] != img.shape[:2]:
            mask = cv2.resize(mask, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST)
        if self.device_preprocess:
            # host does decode + mask parse ONLY; resize-pad (+hflip/
            # brightness/contrast) run on device (kernels/preprocess.py
            # semantic_preprocess) — the SURVEY §3.1 hot loop leaves the host.
            # Native resolutions must be uniform per dataset for fixed-shape
            # batches (CamVid: all 720x960).
            p, rng = self.p, self.rng
            mask = np.clip(mask, 0, self.num_classes - 1)
            return {"image_raw": img, "mask_raw": mask.astype(np.int32),
                    "flip": self.augment and rng.random() < p["hflip"],
                    "bright": np.float32(1.0 + rng.uniform(-p["brightness"], p["brightness"])
                                         if self.augment and p["brightness"] else 1.0),
                    "contr": np.float32(1.0 + rng.uniform(-p["contrast"], p["contrast"])
                                        if self.augment and p["contrast"] else 1.0)}
        if self.augment:
            img, mask = self._augment_pair(img, mask)
        img, mask, _ = resize_and_pad(img, mask, self.img_size)
        mask = np.clip(mask, 0, self.num_classes - 1)
        return {"image": img, "mask": mask.astype(np.int32)}

    def class_weights(self) -> np.ndarray:
        from yolo_dual_tpu.losses.semantic import seg_labels_to_class_weights
        return seg_labels_to_class_weights([j for _, j in self.items], self.num_classes)


def create_json_segment_dataloader(img_dir, json_dir, img_size=640, batch_size=16,
                                   augment=False, num_classes=12, workers=0,
                                   shuffle=None, seed=0, drop_last=True,
                                   device_preprocess=False):
    """Reference-compatible constructor (reference :355-378; drop_last=True)."""
    from yolo_dual_tpu.data.loader import Loader
    ds = JSONSegmentDataset(img_dir, json_dir, img_size, augment, num_classes,
                            seed=seed, device_preprocess=device_preprocess)
    loader = Loader(ds, batch_size=batch_size,
                    shuffle=augment if shuffle is None else shuffle,
                    seed=seed, drop_last=drop_last)
    return loader, ds
