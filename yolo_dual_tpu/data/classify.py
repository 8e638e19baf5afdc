"""Classification dataset + transforms.

Capability parity with reference utils/dataloaders.py:1162-1227
(ClassificationDataset: ImageFolder layout, RAM/disk image cache,
albumentations train pipeline) and utils/augmentations.py:305-396
(classify_albumentations: RandomResizedCrop + flips + ColorJitter;
classify_transforms: CenterCrop + normalize). The transforms are implemented
natively in numpy/cv2 (same math) with an optional albumentations adapter
when the package is installed, exactly like the reference's gating.
"""

from __future__ import annotations

import math
import random
from pathlib import Path
from typing import Optional

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")


def normalize_imagenet(im: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC -> float32 normalized (reference IMAGENET_MEAN/STD)."""
    return (im.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_imagenet(im: np.ndarray) -> np.ndarray:
    return im * IMAGENET_STD + IMAGENET_MEAN


def center_crop_resize(im: np.ndarray, size: int) -> np.ndarray:
    """Reference CenterCrop (utils/augmentations.py:375-385): crop the
    largest centered square, resize to (size, size)."""
    import cv2
    h, w = im.shape[:2]
    m = min(h, w)
    top, left = (h - m) // 2, (w - m) // 2
    return cv2.resize(im[top:top + m, left:left + m], (size, size),
                      interpolation=cv2.INTER_LINEAR)


def random_resized_crop(im: np.ndarray, size: int, scale=(0.08, 1.0),
                        ratio=(3 / 4, 4 / 3), rng: Optional[random.Random] = None) -> np.ndarray:
    """torchvision/albumentations RandomResizedCrop semantics: sample a crop
    with area in `scale`·area and aspect in `ratio` (10 tries, log-uniform
    ratio), fall back to center crop."""
    import cv2
    rng = rng or random
    h, w = im.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        ar = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        cw = int(round(math.sqrt(target_area * ar)))
        ch = int(round(math.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.randint(0, w - cw)
            y0 = rng.randint(0, h - ch)
            crop = im[y0:y0 + ch, x0:x0 + cw]
            return cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    return center_crop_resize(im, size)


def color_jitter(im: np.ndarray, jitter: float = 0.4,
                 rng: Optional[random.Random] = None) -> np.ndarray:
    """Brightness/contrast/saturation jitter with factors U[1-j, 1+j], hue 0
    (the reference's ColorJitter(j, j, j, 0))."""
    rng = rng or random
    x = im.astype(np.float32)
    b = rng.uniform(1 - jitter, 1 + jitter)
    c = rng.uniform(1 - jitter, 1 + jitter)
    s = rng.uniform(1 - jitter, 1 + jitter)
    x = x * b
    mean = x.mean()
    x = (x - mean) * c + mean
    gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
    x = (x - gray[..., None]) * s + gray[..., None]
    return np.clip(x, 0, 255).astype(np.uint8)


def classify_transforms(im: np.ndarray, size: int = 224) -> np.ndarray:
    """Eval transform (reference classify_transforms, augmentations.py:348):
    CenterCrop(size) + /255 + ImageNet normalize. RGB HWC in/out."""
    return normalize_imagenet(center_crop_resize(im, size))


def classify_albumentations(augment: bool = True, size: int = 224,
                            scale=(0.08, 1.0), ratio=(0.75, 4 / 3),
                            hflip: float = 0.5, vflip: float = 0.0,
                            jitter: float = 0.4):
    """Return an albumentations pipeline when the package is installed
    (reference utils/augmentations.py:305-345), else None (native fallback
    in ClassificationDataset)."""
    try:
        import albumentations as A
    except ImportError:
        return None
    if augment:
        T = [A.RandomResizedCrop(height=size, width=size, scale=scale, ratio=ratio)]
        if hflip > 0:
            T += [A.HorizontalFlip(p=hflip)]
        if vflip > 0:
            T += [A.VerticalFlip(p=vflip)]
        if jitter > 0:
            T += [A.ColorJitter(jitter, jitter, jitter, 0)]
    else:
        T = [A.SmallestMaxSize(max_size=size), A.CenterCrop(height=size, width=size)]
    T += [A.Normalize(mean=list(IMAGENET_MEAN), std=list(IMAGENET_STD))]
    LOGGER.info("albumentations: " + ", ".join(type(t).__name__ for t in T))
    return A.Compose(T)


class ClassificationDataset:
    """ImageFolder-style dataset (root/<class>/<img>) with RAM/disk caching
    and train/eval transforms (reference utils/dataloaders.py:1162-1227).

    Emits {"image": float32 (size, size, 3) ImageNet-normalized RGB,
    "label": int32}."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False,
                 cache: bool | str = False, seed: int = 0,
                 scale=(0.08, 1.0), hflip: float = 0.5, vflip: float = 0.0,
                 jitter: float = 0.4):
        self.root = Path(root)
        self.classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        assert self.classes, f"no class directories under {root}"
        self.samples = []
        for ci, c in enumerate(self.classes):
            for f in sorted((self.root / c).rglob("*.*")):
                if f.suffix.lower() in IMG_EXTS:
                    self.samples.append([str(f), ci, f.with_suffix(".npy"), None])
        assert self.samples, f"no images under {root}"
        self.imgsz = imgsz
        self.augment = augment
        self.cache_ram = cache is True or cache == "ram"
        self.cache_disk = cache == "disk"
        self.rng = random.Random(seed)
        self.scale, self.hflip, self.vflip, self.jitter = scale, hflip, vflip, jitter
        self.album = classify_albumentations(augment, imgsz, scale=scale, hflip=hflip,
                                             vflip=vflip, jitter=jitter) if augment else None

    def __len__(self):
        return len(self.samples)

    def _read(self, i) -> np.ndarray:
        import cv2
        f, _, fn, im = self.samples[i]
        if self.cache_ram:
            if im is None:
                im = self.samples[i][3] = cv2.imread(f)
        elif self.cache_disk:
            if not fn.exists():
                np.save(fn.as_posix(), cv2.imread(f))
            im = np.load(fn)
        else:
            im = cv2.imread(f)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)

    def __getitem__(self, i):
        im = self._read(i)
        label = self.samples[i][1]
        if self.augment:
            if self.album is not None:
                im = self.album(image=im)["image"].astype(np.float32)
                return {"image": im, "label": np.int32(label)}
            im = random_resized_crop(im, self.imgsz, scale=self.scale, rng=self.rng)
            if self.hflip > 0 and self.rng.random() < self.hflip:
                im = np.fliplr(im).copy()
            if self.vflip > 0 and self.rng.random() < self.vflip:
                im = np.flipud(im).copy()
            if self.jitter > 0:
                im = color_jitter(im, self.jitter, self.rng)
            im = normalize_imagenet(im)
        else:
            im = classify_transforms(im, self.imgsz)
        return {"image": im, "label": np.int32(label)}


def create_classification_dataloader(path, imgsz: int = 224, batch_size: int = 16,
                                     augment: bool = True, cache: bool | str = False,
                                     shuffle: bool = True, seed: int = 0):
    """Reference-compatible constructor (utils/dataloaders.py:1196-1220).
    Returns (Loader, dataset)."""
    from yolo_dual_tpu.data.loader import Loader
    ds = ClassificationDataset(path, imgsz=imgsz, augment=augment, cache=cache, seed=seed)
    loader = Loader(ds, batch_size=min(batch_size, len(ds)), shuffle=shuffle,
                    seed=seed, drop_last=augment)
    return loader, ds
