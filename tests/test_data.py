"""Data pipeline tests on synthetic on-disk datasets."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="module")
def yolo_ds_dir(tmp_path_factory):
    """Synthetic YOLO-seg dataset: 4 images with polygon labels."""
    import cv2
    root = tmp_path_factory.mktemp("ds")
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.uniform(0, 255, (96 + 8 * i, 128, 3))).astype(np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"im{i}.jpg"), img)
        rows = []
        for _ in range(rng.integers(1, 4)):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            r = rng.uniform(0.08, 0.2)
            pts = [(cx + r * np.cos(t), cy + r * np.sin(t)) for t in np.linspace(0, 2 * np.pi, 8)[:-1]]
            pts = [(min(max(x, 0.01), 0.99), min(max(y, 0.01), 0.99)) for x, y in pts]
            flat = " ".join(f"{v:.4f}" for xy in pts for v in xy)
            rows.append(f"{rng.integers(0, 3)} {flat}")
        (root / "labels" / "train" / f"im{i}.txt").write_text("\n".join(rows))
    return root


def test_yolo_dataset_fixed_shapes(yolo_ds_dir):
    from yolo_dual_tpu.data import YoloDataset
    ds = YoloDataset(str(yolo_ds_dir / "images" / "train"), imgsz=96, augment=False,
                     task="segment", mask_ratio=4, overlap=True, max_labels=10)
    assert len(ds) == 4
    for i in range(4):
        s = ds[i]
        assert s["image"].shape == (96, 96, 3) and s["image"].dtype == np.uint8
        assert s["targets"].shape == (10, 5)
        assert s["tmask"].shape == (10,)
        assert s["masks"].shape == (24, 24)
        n = int(s["tmask"].sum())
        assert n >= 1
        # overlap encoding: values 0..n
        assert s["masks"].max() <= n
        # normalized boxes in [0,1]
        assert (s["targets"][:n, 1:] >= 0).all() and (s["targets"][:n, 1:] <= 1).all()


def test_yolo_dataset_cache_roundtrip(yolo_ds_dir):
    from yolo_dual_tpu.data import YoloDataset
    ds1 = YoloDataset(str(yolo_ds_dir / "images" / "train"), imgsz=96, task="detect")
    assert (yolo_ds_dir / "labels" / "train.cache").exists()
    ds2 = YoloDataset(str(yolo_ds_dir / "images" / "train"), imgsz=96, task="detect")
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a, b)


def test_mosaic_and_augment_run(yolo_ds_dir):
    from yolo_dual_tpu.data import YoloDataset
    hyp = dict(mosaic=1.0, mixup=0.5, copy_paste=0.1, degrees=5, translate=0.1,
               scale=0.5, shear=2, perspective=0.0, hsv_h=0.015, hsv_s=0.7,
               hsv_v=0.4, flipud=0.5, fliplr=0.5)
    ds = YoloDataset(str(yolo_ds_dir / "images" / "train"), imgsz=96, augment=True,
                     hyp=hyp, task="segment", mask_ratio=4, overlap=True, max_labels=20)
    for i in range(4):
        s = ds[i]
        assert s["image"].shape == (96, 96, 3)
        assert s["masks"].shape == (24, 24)


def test_loader_batching_and_padding(yolo_ds_dir):
    from yolo_dual_tpu.data import YoloDataset, Loader
    ds = YoloDataset(str(yolo_ds_dir / "images" / "train"), imgsz=96, task="detect")
    loader = Loader(ds, batch_size=3, shuffle=True, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (3, 96, 96, 3)
    assert batches[1]["image"].shape == (3, 96, 96, 3)  # padded to static shape
    assert int(batches[1]["n_valid"]) == 1
    # deterministic per-epoch shuffling
    loader.set_epoch(0)
    a = [b["image"].sum() for b in loader]
    loader.set_epoch(0)
    b = [b["image"].sum() for b in loader]
    assert a == b


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout unavailable")
def test_polygons2masks_overlap_parity(rng):
    from test_torch_parity import _stub_torchvision
    _stub_torchvision()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from utils.segment.dataloaders import polygons2masks_overlap as ref_fn
    from yolo_dual_tpu.data.augment import polygons2masks_overlap

    segs = []
    for _ in range(3):
        cx, cy = rng.uniform(20, 70, 2)
        r = rng.uniform(8, 20)
        pts = np.array([(cx + r * np.cos(t), cy + r * np.sin(t))
                        for t in np.linspace(0, 2 * np.pi, 12)[:-1]], np.float32)
        segs.append(pts)
    ours, our_idx = polygons2masks_overlap((96, 96), segs, downsample_ratio=2)
    ref, ref_idx = ref_fn((96, 96), [s.copy() for s in segs], downsample_ratio=2)
    np.testing.assert_array_equal(our_idx, np.asarray(ref_idx))
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_json_semantic_dataset(tmp_path):
    import cv2
    img_dir = tmp_path / "imgs"
    json_dir = tmp_path / "jsons"
    img_dir.mkdir()
    json_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"f{i}.png"), img)
        mask = rng.integers(0, 12, (48, 64)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"m{i}.png"), mask)
        from yolo_dual_tpu.data import mask_to_json
        mask_to_json(tmp_path / f"m{i}.png", json_dir / f"f{i}.json")

    from yolo_dual_tpu.data import JSONSegmentDataset, verify_json_masks, create_json_segment_dataloader
    ok, missing = verify_json_masks(img_dir, json_dir)
    assert ok, missing
    ds = JSONSegmentDataset(img_dir, json_dir, img_size=64, augment=True, num_classes=12)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["mask"].shape == (64, 64)
    assert s["mask"].max() < 12
    w = ds.class_weights()
    assert w.shape == (12,) and np.isfinite(w).all()

    loader, _ = create_json_segment_dataloader(img_dir, json_dir, img_size=64, batch_size=2,
                                               augment=False)
    b = next(iter(loader))
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["mask"].shape == (2, 64, 64)


def test_rect_bucket_batching(yolo_ds_dir):
    """rect -> aspect buckets: every batch has one static shape from the
    fixed bucket set; images keep full long-side resolution; mixed-aspect
    batches never occur (TPU replacement for reference rect batching,
    utils/dataloaders.py:543-566)."""
    from yolo_dual_tpu.data import create_dataloader
    loader, ds = create_dataloader(str(yolo_ds_dir / "images" / "train"), 96, 2,
                                   augment=False, mask_downsample_ratio=4,
                                   overlap_mask=True, task="segment", rect=True)
    assert ds.bucket_of is not None and len(ds.bucket_shapes) == len(ds.BUCKET_ASPECTS)
    shapes_seen = set()
    n_total = 0
    for batch in loader:
        h, w = batch["image"].shape[1:3]
        assert (h, w) in set(ds.bucket_shapes)
        assert h % 32 == 0 and w % 32 == 0
        # mask plane follows the bucket shape
        assert batch["masks"].shape[-2:] == (h // 4, w // 4)
        shapes_seen.add((h, w))
        n_total += int(batch["n_valid"])
    assert n_total == len(ds)
    # the fixture images are 96-128 wide x (96..120) tall -> wide buckets
    assert all(w >= h for (h, w) in shapes_seen)
    assert len(loader) == sum(1 for _ in iter(loader.__iter__()))


def test_image_cache_ram_and_disk(yolo_ds_dir):
    from yolo_dual_tpu.data import YoloDataset
    root = str(yolo_ds_dir / "images" / "train")
    ds = YoloDataset(root, imgsz=96, augment=False, task="detect",
                     cache_images="ram")
    _ = ds[0]
    assert ds.ims[0] is not None                    # RAM slot filled
    im2, _, _ = ds.load_image(0)                    # second read hits cache
    ds_disk = YoloDataset(root, imgsz=96, augment=False, task="detect",
                          cache_images="disk")
    _ = ds_disk[1]
    assert ds_disk.npy_files[1].exists()            # sidecar written
    a, _, _ = ds_disk.load_image(1)                 # reread from .npy
    b = YoloDataset(root, imgsz=96, augment=False, task="detect").load_image(1)[0]
    np.testing.assert_array_equal(a, b)
    for f in ds_disk.npy_files:
        if f.exists():
            f.unlink()


def test_cutout_erases_and_drops_covered_labels():
    """cutout paints occlusion patches and drops labels covered >60%
    (reference utils/augmentations.py:262-286)."""
    import random as _random
    from yolo_dual_tpu.data.augment import cutout

    rng = _random.Random(0)
    img = np.full((64, 64, 3), 255, np.uint8)
    # one big box (will likely survive), one tiny box (easily covered)
    labels = np.array([[0, 0.5, 0.5, 0.9, 0.9],
                       [1, 0.1, 0.1, 0.05, 0.05]], np.float32)
    out, new_labels = cutout(img.copy(), labels.copy(), p=1.0, rng=rng)
    assert (out != 255).any()                       # something was painted
    assert len(new_labels) <= len(labels)
    # p=0 is a strict no-op
    img2 = np.full((32, 32, 3), 7, np.uint8)
    out2, l2 = cutout(img2.copy(), labels.copy(), p=0.0, rng=rng)
    np.testing.assert_array_equal(out2, img2)
    assert len(l2) == 2


def test_albumentations_adapter_noop_without_package():
    """The adapter degrades to identity when albumentations is missing, and
    keeps label schema when present."""
    import random as _random
    from yolo_dual_tpu.data.augment import Albumentations

    t = Albumentations(size=64)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)
    out, l = t(img, labels, p=1.0, rng=_random.Random(0))
    assert out.shape == img.shape
    assert l.shape[1] == 5


def test_device_aug_equivalence(yolo_ds_dir):
    """device_aug=True (host decode + geometry; TPU composite/warp/HSV/flip,
    kernels/augment.py) must reproduce the host pipeline given the same seed:
    identical rng stream -> identical labels and masks EXACTLY, and pixels
    equal up to mosaic-seam bilinear semantics + HSV rounding (99th pct)."""
    import jax.numpy as jnp
    from yolo_dual_tpu.data import YoloDataset
    from yolo_dual_tpu.kernels.augment import mosaic_warp_hsv

    hyp = dict(mosaic=1.0, mixup=0.0, copy_paste=0.0, degrees=5.0, translate=0.1,
               scale=0.4, shear=2.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7,
               hsv_v=0.4, flipud=0.3, fliplr=0.5)
    imgsz = 96
    kw = dict(imgsz=imgsz, augment=True, hyp=hyp, task="segment", mask_ratio=4,
              overlap=True)
    ds_host = YoloDataset(str(yolo_ds_dir / "images" / "train"), **kw)
    ds_dev = YoloDataset(str(yolo_ds_dir / "images" / "train"), device_aug=True, **kw)
    assert ds_dev.device_aug, "device_aug should be active for this hyp"

    for idx in range(3):
        ds_host.rng.seed(100 + idx)
        ds_dev.rng.seed(100 + idx)
        sh = ds_host[idx]
        sd = ds_dev[idx]
        assert "aug_tiles" in sd and "image" not in sd
        np.testing.assert_array_equal(sd["tmask"], sh["tmask"])
        np.testing.assert_allclose(sd["targets"], sh["targets"], atol=1e-6)
        np.testing.assert_array_equal(sd["masks"], sh["masks"])

        img_dev = np.asarray(mosaic_warp_hsv(
            jnp.asarray(sd["aug_tiles"][None]), jnp.asarray(sd["aug_dst"][None]),
            jnp.asarray(sd["aug_off"][None]), jnp.asarray(sd["aug_invm"][None]),
            jnp.asarray(sd["aug_hsv"][None]), jnp.asarray(sd["aug_flips"][None]),
            out_size=imgsz))[0]
        img_host = sh["image"].astype(np.float32) / 255.0
        diff = np.abs(img_dev - img_host)
        # exclude a 2px band around mosaic tile seams (in warped canvas
        # coords): the host's bilinear straddles tiles there, we edge-clamp.
        # Pure-noise test images maximize that sub-pixel effect.
        yy, xx = np.mgrid[0:imgsz, 0:imgsz].astype(np.float64)
        if sd["aug_flips"][0]:
            yy = (imgsz - 1) - yy
        if sd["aug_flips"][1]:
            xx = (imgsz - 1) - xx
        m = sd["aug_invm"]
        u = m[0, 0] * xx + m[0, 1] * yy + m[0, 2]
        v = m[1, 0] * xx + m[1, 1] * yy + m[1, 2]
        near_seam = np.zeros((imgsz, imgsz), bool)
        for k in range(4):
            for e, c in zip(sd["aug_dst"][k], (u, v, u, v)):
                near_seam |= np.abs(c - e) < 2.0
        ok = ~near_seam
        assert ok.mean() > 0.5  # the comparison must not be vacuous
        assert np.percentile(diff[ok], 99) < 0.06, np.percentile(diff[ok], 99)
        assert np.mean(diff) < 0.015, np.mean(diff)


def test_device_aug_fallback_on_unsupported_hyp(yolo_ds_dir):
    from yolo_dual_tpu.data import YoloDataset
    ds = YoloDataset(str(yolo_ds_dir / "images" / "train"), imgsz=96, augment=True,
                     hyp=dict(mosaic=0.5), task="segment", device_aug=True)
    assert not ds.device_aug
    assert "image" in ds[0]


def test_numpy_box_converts_match_jnp(rng):
    """The host loader's pure-numpy box converts (data/augment.py, r4: the
    loader must never dispatch device ops per image) are bit-compatible with
    the jnp originals in ops/boxes.py."""
    import numpy as np

    from yolo_dual_tpu.data.augment import xywhn2xyxy_np, xyxy2xywhn_np
    from yolo_dual_tpu.ops.boxes import xywhn2xyxy, xyxy2xywhn

    x = rng.uniform(0.05, 0.95, (17, 5)).astype(np.float32)
    a = xywhn2xyxy_np(x[:, 1:], 613, 401, 3.5, -2.25)
    b = np.asarray(xywhn2xyxy(x[:, 1:], 613, 401, 3.5, -2.25))
    np.testing.assert_allclose(a, b, atol=1e-5)

    boxes = rng.uniform(-20, 660, (23, 4)).astype(np.float32)
    a = xyxy2xywhn_np(boxes, w=640, h=480, clip=True, eps=1e-3)
    b = np.asarray(xyxy2xywhn(boxes, w=640, h=480, clip=True, eps=1e-3))
    np.testing.assert_allclose(a, b, atol=1e-6)
