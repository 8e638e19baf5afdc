"""YOLO-format detection / instance-segmentation dataset.

Capability parity with reference utils/dataloaders.py:431-918
(LoadImagesAndLabels) + utils/segment/dataloaders.py:82-331
(LoadImagesAndLabelsAndMasks): txt-label discovery, label cache with hash,
4-image mosaic + mixup + copy-paste, HSV, flips, random_perspective,
polygons -> per-instance or overlap-encoded masks.

TPU-first differences:
- Every sample is emitted at a FIXED shape: square imgsz, `max_labels`-padded
  target rows plus a validity mask, overlap mask plane at imgsz/mask_ratio.
  (The reference's rect-batch aspect bucketing trades shape stability for
  FLOPs; on TPU recompilation dominates, so rect is intentionally square.)
- Images stay uint8 through the host pipeline; normalization (/255) is fused
  into the first device op (see train/trainer.py), halving host->device bytes.
"""

from __future__ import annotations

import hashlib
import math
import os
import random
from pathlib import Path
from typing import List, Optional

import cv2
import numpy as np

from yolo_dual_tpu.data.augment import (
    Albumentations,
    augment_hsv,
    box_candidates,
    copy_paste,
    cutout,
    letterbox,
    mixup,
    polygons2masks,
    polygons2masks_overlap,
    random_perspective,
    xyn2xy,
    xywhn2xyxy_np,
    xyxy2xywhn_np,
)
from yolo_dual_tpu.utils.general import LOGGER

IMG_FORMATS = ("bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm")
CACHE_VERSION = 0.6


def img2label_paths(img_paths):
    """images/... .jpg -> labels/... .txt (reference utils/dataloaders.py:425)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def get_hash(paths):
    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.sha256(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def verify_image_label(im_file: str, lb_file: str, num_cls_cols: int = 5):
    """Validate one image/label pair (reference utils/dataloaders.py:989-1040).
    Returns (ok, labels (n,5), segments list, shape, msg)."""
    segments = []
    try:
        from PIL import Image
        im = Image.open(im_file)
        im.verify()
        shape = im.size  # (w, h)
        assert (shape[0] > 9) and (shape[1] > 9), f"image size {shape} <10 pixels"
        if os.path.isfile(lb_file):
            with open(lb_file) as f:
                lb = [x.split() for x in f.read().strip().splitlines() if len(x)]
            if any(len(x) > 6 for x in lb):  # segments
                classes = np.array([x[0] for x in lb], dtype=np.float32)
                segments = [np.array(x[1:], dtype=np.float32).reshape(-1, 2) for x in lb]
                boxes = []
                for s in segments:
                    boxes.append([s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()])
                boxes = np.asarray(boxes, np.float32)
                xywh = np.concatenate([(boxes[:, :2] + boxes[:, 2:]) / 2,
                                       boxes[:, 2:] - boxes[:, :2]], 1)
                lb = np.concatenate((classes.reshape(-1, 1), xywh), 1)
            else:
                lb = np.array(lb, dtype=np.float32)
            if len(lb):
                assert lb.shape[1] == 5, f"labels require 5 columns, {lb.shape[1]} detected"
                assert (lb >= 0).all(), f"negative label values {lb[lb < 0]}"
                assert (lb[:, 1:] <= 1).all(), "non-normalized or out of bounds coordinates"
                _, idx = np.unique(lb, axis=0, return_index=True)
                if len(idx) < len(lb):
                    lb = lb[idx]
                    if segments:
                        segments = [segments[i] for i in idx]
            else:
                lb = np.zeros((0, 5), dtype=np.float32)
        else:
            lb = np.zeros((0, 5), dtype=np.float32)
        return True, lb, segments, (shape[1], shape[0]), ""
    except Exception as e:
        return False, np.zeros((0, 5), np.float32), [], (0, 0), f"ignoring corrupt image/label {im_file}: {e}"


class YoloDataset:
    """Map-style dataset yielding fixed-shape samples.

    sample dict: image uint8 (imgsz, imgsz, 3) RGB, targets (M, 5) float32
    [cls, xywh normalized], tmask (M,) bool, masks (imgsz/r, imgsz/r) float32
    overlap-encoded (task='segment'), shape0/ratio_pad metadata for eval.
    """

    # Aspect-ratio buckets for rect eval batching: a FIXED set of stride-
    # aligned shapes so XLA compiles at most len(BUCKET_ASPECTS)+1 variants
    # instead of the reference's per-batch dynamic rectangles
    # (reference utils/dataloaders.py:543-566 rect; TPU-first redesign).
    BUCKET_ASPECTS = (0.5, 0.7, 1.0, 1.4, 2.0)  # h/w thresholds

    def __init__(self, path, imgsz: int = 640, augment: bool = False, hyp: Optional[dict] = None,
                 task: str = "detect", mask_ratio: int = 4, overlap: bool = True,
                 max_labels: int = 120, prefix: str = "", single_cls: bool = False,
                 pad_extra: float = 0.0, cache_images=False, rect: bool = False,
                 stride: int = 32, device_aug: bool = False,
                 device_preprocess: bool = False):
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = dict(hyp or {})
        self.task = task
        self.mask_ratio = mask_ratio
        self.overlap = overlap
        self.max_labels = max_labels
        self.single_cls = single_cls
        self.mosaic = self.augment and self.hyp.get("mosaic", 0) > 0
        self.mosaic_border = [-imgsz // 2, -imgsz // 2]
        # device_aug: host does decode + label geometry only; compositing,
        # warp, HSV, flips and normalize run on the TPU (kernels/augment.py).
        # Requires every sample to take the mosaic branch (static shapes) and
        # no host-side pixel-mixing augs.
        self.device_aug = bool(device_aug) and augment
        if self.device_aug:
            h = self.hyp
            if (h.get("mosaic", 0) < 1.0 or h.get("mixup", 0) > 0
                    or h.get("copy_paste", 0) > 0 or h.get("cutout", 0) > 0):
                LOGGER.warning(f"{prefix}device_aug needs mosaic=1.0 and no "
                               "mixup/copy_paste/cutout; falling back to host augmentation")
                self.device_aug = False
        self.rng = random.Random(0)
        self.albumentations = Albumentations(size=imgsz) if augment else None
        self.cache_ram = cache_images is True or cache_images == "ram"
        self.cache_disk = cache_images == "disk"
        self.stride = stride

        self.im_files = self._discover(path, prefix)
        self.label_files = img2label_paths(self.im_files)
        cache = self._load_or_build_cache(prefix)
        self.labels = cache["labels"]
        self.segments = cache["segments"]
        self.shapes = cache["shapes"]
        self.n = len(self.im_files)
        self.indices = list(range(self.n))
        self.ims = [None] * self.n          # RAM image cache slots
        self.npy_files = [Path(f).with_suffix(".npy") for f in self.im_files]

        # device_preprocess (eval only): emit RAW uint8 frames; letterbox +
        # normalize run on the TPU (kernels/preprocess.py, the serving path
        # engine/predictor.py uses). Static shapes require every image to
        # share one raw shape (camera/video-derived datasets, CamVid).
        self.device_preprocess = bool(device_preprocess) and not augment
        if self.device_preprocess and len(self.shapes):
            uniq = {tuple(s) for s in self.shapes.astype(int).tolist()}
            if len(uniq) > 1:
                raise ValueError(
                    f"device_preprocess needs one uniform raw image shape, got {sorted(uniq)[:5]}"
                    f"{'...' if len(uniq) > 5 else ''}; use the host letterbox path")

        # rect: assign each image the smallest bucket shape that covers its
        # aspect ratio (h, w), stride-aligned; mosaic/augment stays square
        self.rect = rect and not self.augment
        self.bucket_of = None
        self.bucket_shapes = None
        if self.rect and len(self.shapes):
            self.bucket_shapes = []
            for a in self.BUCKET_ASPECTS:
                if a <= 1.0:   # wide image: full width, reduced height
                    h = int(math.ceil(imgsz * a / stride) * stride)
                    self.bucket_shapes.append((min(h, imgsz), imgsz))
                else:          # tall image: full height, reduced width
                    w = int(math.ceil(imgsz / a / stride) * stride)
                    self.bucket_shapes.append((imgsz, min(w, imgsz)))
            # shapes rows are (h, w); r = h/w. The bucket must CONTAIN the
            # image at full long-side resolution: wide images (r<=1) need the
            # smallest bucket aspect >= r; tall images the largest aspect <= r.
            ar = self.shapes[:, 0].astype(np.float64) / self.shapes[:, 1]
            aspects = np.asarray(self.BUCKET_ASPECTS)

            def pick(r):
                if r <= 1.0:
                    ok = np.flatnonzero(aspects >= r)
                    return int(ok[0]) if len(ok) else int(np.argmin(np.abs(aspects - 1.0)))
                ok = np.flatnonzero(aspects <= r)
                return int(ok[-1]) if len(ok) else int(np.argmin(np.abs(aspects - 1.0)))

            self.bucket_of = np.array([pick(r) for r in ar], np.int32)

    @staticmethod
    def _discover(path, prefix="") -> List[str]:
        files = []
        for p in path if isinstance(path, list) else [path]:
            p = Path(p)
            if p.is_dir():
                files += [str(f) for f in sorted(p.rglob("*.*"))]
            elif p.is_file():
                with open(p) as f:
                    parent = str(p.parent) + os.sep
                    files += [x.replace("./", parent) if x.startswith("./") else x
                              for x in f.read().strip().splitlines()]
            else:
                raise FileNotFoundError(f"{prefix}{p} does not exist")
        im_files = sorted(x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS)
        assert im_files, f"{prefix}No images found in {path}"
        return im_files

    def _load_or_build_cache(self, prefix=""):
        cache_path = Path(self.label_files[0]).parent.with_suffix(".cache") if self.label_files else None
        h = get_hash(self.label_files + self.im_files)
        if cache_path and cache_path.is_file():
            try:
                cache = np.load(cache_path, allow_pickle=True).item()
                if cache.get("version") == CACHE_VERSION and cache.get("hash") == h:
                    nf, nm, ne, nc = cache["results"]
                    LOGGER.info(f"{prefix}cached labels: {nf} found, {nm} missing, {ne} empty, {nc} corrupt")
                    return cache
            except Exception:
                pass
        labels, segments, shapes, keep = [], [], [], []
        nf = nm = ne = nc = 0
        for im_f, lb_f in zip(self.im_files, self.label_files):
            ok, lb, seg, shape, msg = verify_image_label(im_f, lb_f)
            if not ok:
                nc += 1
                if msg:
                    LOGGER.warning(msg)
                continue
            nf += int(os.path.isfile(lb_f))
            nm += int(not os.path.isfile(lb_f))
            ne += int(len(lb) == 0)
            labels.append(lb)
            segments.append(seg)
            shapes.append(shape)
            keep.append(im_f)
        self.im_files = keep
        self.label_files = img2label_paths(keep)
        cache = {"labels": labels, "segments": segments, "shapes": np.array(shapes),
                 "hash": h, "version": CACHE_VERSION, "results": (nf, nm, ne, nc)}
        if cache_path:
            try:
                np.save(str(cache_path.with_suffix("")), cache)
                cache_path.with_suffix(".npy").rename(cache_path)
            except Exception:
                pass
        LOGGER.info(f"{prefix}labels: {nf} found, {nm} missing, {ne} empty, {nc} corrupt")
        return cache

    def __len__(self):
        return self.n

    # -- image IO -----------------------------------------------------------
    def load_image(self, i):
        # RAM/disk image cache (reference utils/dataloaders.py:568-586):
        # decoded RGB frames are kept in memory or as .npy sidecar files
        im = self.ims[i] if self.cache_ram else None
        if im is None:
            if self.cache_disk and self.npy_files[i].exists():
                im = np.load(self.npy_files[i])
            else:
                im = cv2.imread(self.im_files[i])  # BGR
                assert im is not None, f"Image Not Found {self.im_files[i]}"
                im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
                if self.cache_disk:
                    np.save(self.npy_files[i].as_posix(), im)
            if self.cache_ram:
                self.ims[i] = im
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (math.ceil(w0 * r), math.ceil(h0 * r)), interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    # -- mosaic -------------------------------------------------------------
    def load_mosaic(self, index, compose: bool = True):
        """4-image mosaic (reference utils/dataloaders.py:653-700).

        compose=True: full host path — composite the 2s canvas and warp it.
        compose=False (device_aug): pixel work is deferred to the TPU kernel
        (kernels/augment.py mosaic_warp_hsv); returns
        ((tiles, dst, off, inv_m), labels4, segments4) where labels are
        already transformed by the SAME sampled matrix the device will apply.
        """
        s = self.imgsz
        yc, xc = (int(self.rng.uniform(-x, 2 * s + x)) for x in self.mosaic_border)
        indices = [index] + self.rng.choices(self.indices, k=3)
        self.rng.shuffle(indices)
        labels4, segments4 = [], []
        im4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8) if compose else None
        tiles = np.zeros((4, s, s, 3), np.uint8) if not compose else None
        dst = np.zeros((4, 4), np.float32)
        off = np.zeros((4, 2), np.float32)
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            if compose:
                im4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            else:
                tiles[i, :h, :w] = img
                dst[i] = (x1a, y1a, x2a, y2a)
                off[i] = (x1b - x1a, y1b - y1a)
            padw, padh = x1a - x1b, y1a - y1b
            labels = self.labels[idx].copy()
            segments = [se.copy() for se in self.segments[idx]]
            if labels.size:
                labels[:, 1:] = (xywhn2xyxy_np(labels[:, 1:], w, h, padw, padh))
                segments = [xyn2xy(se, w, h, padw, padh) for se in segments]
            labels4.append(labels)
            segments4.extend(segments)
        labels4 = np.concatenate(labels4, 0)
        for x in (labels4[:, 1:], *segments4):
            np.clip(x, 0, 2 * s, out=x)
        hyp = self.hyp
        if compose:
            im4, labels4, segments4 = copy_paste(im4, labels4, segments4,
                                                 p=hyp.get("copy_paste", 0.0), rng=self.rng)
            im4, labels4, segments4 = random_perspective(
                im4, labels4, segments4,
                degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
                scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
                perspective=hyp.get("perspective", 0.0), border=self.mosaic_border, rng=self.rng)
            return im4, labels4, segments4
        # device path: sample the identical warp, transform labels on host,
        # hand the matrix to the device (kernels/augment.py applies inv_m)
        from yolo_dual_tpu.data.augment import (apply_perspective_to_labels,
                                                sample_perspective_matrix)
        persp = hyp.get("perspective", 0.0)
        M, sc, (width, height) = sample_perspective_matrix(
            (s * 2, s * 2), degrees=hyp.get("degrees", 0.0),
            translate=hyp.get("translate", 0.1), scale=hyp.get("scale", 0.5),
            shear=hyp.get("shear", 0.0), perspective=persp,
            border=self.mosaic_border, rng=self.rng)
        labels4, segments4 = apply_perspective_to_labels(
            M, sc, persp, labels4, segments4, width, height)
        inv_m = np.linalg.inv(M).astype(np.float32)
        return (tiles, dst, off, inv_m), labels4, segments4

    # -- fixed-shape sample assembly ----------------------------------------
    def __getitem__(self, index):
        hyp = self.hyp
        use_mosaic = self.mosaic and self.rng.random() < hyp.get("mosaic", 0.0)
        ratio_pad = None
        shape0 = tuple(self.shapes[index][::-1]) if len(self.shapes) else (self.imgsz, self.imgsz)
        dev_geo = None
        if use_mosaic and self.device_aug:
            dev_geo, labels, segments = self.load_mosaic(index, compose=False)
            img = None
            # keep the rng stream aligned with the host path (its mixup coin),
            # so host/device pipelines are seed-for-seed equivalent
            self.rng.random()
        elif use_mosaic:
            img, labels, segments = self.load_mosaic(index)
            if self.rng.random() < hyp.get("mixup", 0.0):
                img2, labels2, segments2 = self.load_mosaic(self.rng.choice(self.indices))
                img, labels, segments = mixup(img, labels, segments, img2, labels2, segments2)
        elif self.device_preprocess:
            # raw frame out; letterbox+normalize happen on the TPU
            # (kernels/preprocess.py letterbox_normalize, scaleup=False) —
            # labels/masks are mapped with the SAME geometry here on host
            from yolo_dual_tpu.kernels.preprocess import letterbox_geometry
            raw = cv2.cvtColor(cv2.imread(self.im_files[index]), cv2.COLOR_BGR2RGB)
            h0, w0 = raw.shape[:2]
            shape0 = (h0, w0)
            s = self.imgsz
            r, (left, top) = letterbox_geometry(h0, w0, s, scaleup=False)
            ratio_pad = ((r, r), (left, top))
            img = None
            labels = self.labels[index].copy()
            segments = [se.copy() for se in self.segments[index]]
            if labels.size:
                labels[:, 1:] = (xywhn2xyxy_np(labels[:, 1:], r * w0, r * h0,
                                                      left, top))
                segments = [xyn2xy(se, r * w0, r * h0, left, top) for se in segments]
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape0 = (h0, w0)
            new_shape = (self.bucket_shapes[self.bucket_of[index]]
                         if self.bucket_of is not None else self.imgsz)
            img, ratio, pad = letterbox(img, new_shape, auto=False, scaleup=self.augment)
            ratio_pad = ((h / h0, w / w0), pad)
            labels = self.labels[index].copy()
            segments = [se.copy() for se in self.segments[index]]
            if labels.size:
                labels[:, 1:] = (xywhn2xyxy_np(labels[:, 1:], ratio[0] * w, ratio[1] * h,
                                                      pad[0], pad[1]))
                segments = [xyn2xy(se, ratio[0] * w, ratio[1] * h, pad[0], pad[1])
                            for se in segments]
            if self.augment:
                img, labels, segments = random_perspective(
                    img, labels, segments,
                    degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0), rng=self.rng)

        nl = len(labels)
        h, w = (self.imgsz, self.imgsz) if img is None else img.shape[:2]
        masks = None
        if self.task == "segment":
            if nl:
                if self.overlap:
                    masks, sorted_idx = polygons2masks_overlap((h, w), segments,
                                                               downsample_ratio=self.mask_ratio)
                    labels = labels[sorted_idx]
                else:
                    masks = polygons2masks((h, w), segments, color=1,
                                           downsample_ratio=self.mask_ratio)
            else:
                masks = np.zeros((h // self.mask_ratio, w // self.mask_ratio), np.uint8)

        if nl:
            labels[:, 1:5] = (xyxy2xywhn_np(labels[:, 1:5], w=w, h=h, clip=True, eps=1e-3))

        hsv_gains = np.ones(3, np.float32)
        flips = np.zeros(2, bool)
        if self.augment:
            if nl and self.task != "segment" and dev_geo is None:
                # photometric albumentations adapter + cutout occlusion erase;
                # detect-only (both may drop/reorder labels, which would break
                # the label↔mask pairing) — reference utils/dataloaders.py:701
                # and utils/augmentations.py:262-286
                img = np.ascontiguousarray(img)
                img, labels = self.albumentations(img, labels, rng=self.rng)
                if hyp.get("cutout", 0.0):
                    img, labels = cutout(img, labels, p=hyp["cutout"], rng=self.rng)
                nl = len(labels)
            if dev_geo is not None:
                # same gain distribution augment_hsv samples; applied on device
                hsv_gains = (np.array([self.rng.uniform(-1, 1) for _ in range(3)])
                             * [hyp.get("hsv_h", 0), hyp.get("hsv_s", 0),
                                hyp.get("hsv_v", 0)] + 1).astype(np.float32)
            else:
                img = augment_hsv(img, hyp.get("hsv_h", 0), hyp.get("hsv_s", 0),
                                  hyp.get("hsv_v", 0), rng=self.rng)
            if self.rng.random() < hyp.get("flipud", 0.0):
                flips[0] = True
                if img is not None:
                    img = np.flipud(img).copy()
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
                if masks is not None:
                    masks = np.flipud(masks).copy()
            if self.rng.random() < hyp.get("fliplr", 0.0):
                flips[1] = True
                if img is not None:
                    img = np.fliplr(img).copy()
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]
                if masks is not None:
                    masks = np.fliplr(masks).copy()

        if self.single_cls and nl:
            labels[:, 0] = 0

        # pad to fixed shape
        M = self.max_labels
        targets = np.zeros((M, 5), np.float32)
        tmask = np.zeros((M,), bool)
        kept = min(nl, M)
        if nl > M:
            LOGGER.warning(f"sample {index}: {nl} labels exceed max_labels={M}; truncating")
        if kept:
            targets[:kept] = labels[:kept]
            tmask[:kept] = True

        out = {"targets": targets, "tmask": tmask,
               "shape0": np.array(shape0, np.int32),
               "ratio_pad": np.array(ratio_pad[1] if ratio_pad else (0, 0), np.float32),
               "index": np.int32(index)}
        if dev_geo is not None:
            tiles, dst, off, inv_m = dev_geo
            out.update(aug_tiles=tiles, aug_dst=dst, aug_off=off, aug_invm=inv_m,
                       aug_hsv=hsv_gains, aug_flips=flips)
        elif img is None:  # device_preprocess eval: raw frame for the TPU kernel
            out["image_raw"] = raw
        else:
            out["image"] = img
        if masks is not None:
            if not self.overlap and masks.ndim == 3:
                inst = np.zeros((M, h // self.mask_ratio, w // self.mask_ratio), np.float32)
                inst[:kept] = masks[:kept]
                out["masks"] = inst
            else:
                out["masks"] = masks.astype(np.float32)
        return out


def quad_collate(samples):
    """Reference collate_fn4 (utils/dataloaders.py) re-expressed for dict
    samples: every 4 consecutive detection samples become ONE sample at 2x
    resolution — alternately the first image upscaled 2x (labels unchanged:
    normalized coords are scale-invariant) or a 2x2 mosaic of all four with
    labels remapped into quadrants. Deterministic alternation replaces the
    reference's random coin so loader output is reproducible; instance masks
    are unsupported, matching the reference (collate_fn4 exists only in the
    detection loader). Output targets capacity is 4x the per-sample capacity
    so both branches share one static shape."""
    import cv2

    out = []
    for gi in range(0, len(samples) - len(samples) % 4, 4):
        group = samples[gi:gi + 4]
        if any("masks" in s for s in group):
            raise ValueError("quad_collate supports detection samples only")
        M = group[0]["targets"].shape[0]
        targets = np.zeros((4 * M, 5), np.float32)
        tmask = np.zeros((4 * M,), bool)
        if (gi // 4) % 2 == 0:  # upscale branch
            img = cv2.resize(group[0]["image"], None, fx=2.0, fy=2.0,
                             interpolation=cv2.INTER_LINEAR)
            targets[:M] = group[0]["targets"]
            tmask[:M] = group[0]["tmask"]
        else:  # 2x2 mosaic branch
            h, w = group[0]["image"].shape[:2]
            img = np.zeros((2 * h, 2 * w, group[0]["image"].shape[2]),
                           group[0]["image"].dtype)
            for q, s in enumerate(group):
                r, c = divmod(q, 2)
                img[r * h:(r + 1) * h, c * w:(c + 1) * w] = s["image"]
                t = s["targets"].copy()
                t[:, 1] = (t[:, 1] + c) / 2.0
                t[:, 2] = (t[:, 2] + r) / 2.0
                t[:, 3:5] = t[:, 3:5] / 2.0
                targets[q * M:(q + 1) * M] = t
                tmask[q * M:(q + 1) * M] = s["tmask"]
        merged = dict(group[0])
        merged.update(image=img, targets=targets, tmask=tmask)
        out.append(merged)
    return out


def create_dataloader(path, imgsz, batch_size, stride=32, single_cls=False, hyp=None,
                      augment=False, pad=0.0, rect=False, workers=0, prefix="",
                      shuffle=False, mask_downsample_ratio=1, overlap_mask=False,
                      seed=0, task=None, cache_images=False, device_aug=False,
                      device_preprocess=False):
    """Reference-compatible constructor (reference utils/segment/dataloaders.py:23-78).
    Returns (Loader, dataset). rect maps to aspect-ratio BUCKET batching — a
    fixed shape set instead of per-batch dynamic rectangles (TPU static
    shapes; see YoloDataset.BUCKET_ASPECTS)."""
    from yolo_dual_tpu.data.loader import Loader
    if rect and augment:
        LOGGER.info("rect=True with augment: mosaic pipeline is square; rect ignored")
    task = task or ("segment" if mask_downsample_ratio or overlap_mask else "detect")
    ds = YoloDataset(path, imgsz=imgsz, augment=augment, hyp=hyp, task=task,
                     mask_ratio=mask_downsample_ratio or 1, overlap=overlap_mask,
                     single_cls=single_cls, prefix=prefix, cache_images=cache_images,
                     rect=rect, stride=stride, device_aug=device_aug,
                     device_preprocess=device_preprocess)
    ds.rng.seed(seed)
    loader = Loader(ds, batch_size=batch_size, shuffle=shuffle, seed=seed, drop_last=False)
    return loader, ds
