"""Behavioral tests for the small reference-parity utilities added in round 2:
quad collate (reference utils/dataloaders.py collate_fn4), classifier head
reshaping (reference utils/torch_utils.py reshape_classifier_output), and
plot_evolve (reference utils/plots.py:476-500)."""

import numpy as np
import pytest

from yolo_dual_tpu.data.dataset import quad_collate
from yolo_dual_tpu.data.loader import Loader


def _det_sample(i, h=32, w=32, M=4):
    img = np.full((h, w, 3), i * 10, np.uint8)
    targets = np.zeros((M, 5), np.float32)
    tmask = np.zeros((M,), bool)
    targets[0] = [i % 3, 0.5, 0.5, 0.25, 0.25]
    tmask[0] = True
    return {"image": img, "targets": targets, "tmask": tmask,
            "index": np.int32(i)}


def test_quad_collate_mosaic_and_upscale():
    samples = [_det_sample(i) for i in range(8)]
    out = quad_collate(samples)
    assert len(out) == 2
    # group 0: upscale branch — 2x image, labels carried unchanged
    up = out[0]
    assert up["image"].shape == (64, 64, 3)
    assert up["targets"].shape == (16, 5)
    np.testing.assert_allclose(up["targets"][0], [0, 0.5, 0.5, 0.25, 0.25])
    assert up["tmask"][0] and up["tmask"].sum() == 1
    # group 1: mosaic branch — 4 quadrants with remapped labels
    mo = out[1]
    assert mo["image"].shape == (64, 64, 3)
    assert mo["tmask"].sum() == 4
    # sample 4 lands in quadrant (0,0): center (0.5+0)/2 = 0.25
    got = mo["targets"][mo["tmask"]]
    centers = sorted((round(float(x), 3), round(float(y), 3)) for x, y in got[:, 1:3])
    assert centers == [(0.25, 0.25), (0.25, 0.75), (0.75, 0.25), (0.75, 0.75)]
    np.testing.assert_allclose(got[:, 3:5], 0.125)
    # quadrant pixels come from the right source images
    assert mo["image"][0, 0, 0] == 40 and mo["image"][0, 63, 0] == 50
    assert mo["image"][63, 0, 0] == 60 and mo["image"][63, 63, 0] == 70


class _ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_loader_quad_collate_batches():
    ds = _ListDataset([_det_sample(i) for i in range(8)])
    loader = Loader(ds, batch_size=8, prefetch=0, num_shards=1, shard_index=0,
                    collate=quad_collate)
    (batch,) = list(loader)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["targets"].shape == (2, 16, 5)
    assert int(batch["n_valid"]) == 2


def test_reshape_classifier_output():
    import jax.numpy as jnp
    from yolo_dual_tpu.models.model import (ClassificationModel,
                                            reshape_classifier_output)
    cfg = dict(nc=80, depth_multiple=0.33, width_multiple=0.125,
               backbone=[[-1, 1, "Conv", [64, 6, 2, 2]],
                         [-1, 1, "Conv", [128, 3, 2]],
                         [-1, 1, "C3", [128]]],
               head=[])
    model = ClassificationModel(cfg, nc=10, cutoff=3)
    variables = model.init(imgsz=64)
    new_model, new_vars = reshape_classifier_output(model, variables, nc=4, imgsz=64)
    assert new_model.nc == 4
    head = f"model_{len(new_model.spec.layers) - 1}"
    assert new_vars["params"][head]["linear"]["kernel"].shape[-1] == 4
    # backbone weights transplanted, not re-initialized
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["model_0"]["conv"]["kernel"]),
        np.asarray(new_vars["params"]["model_0"]["conv"]["kernel"]))
    out = new_model.module.apply(new_vars, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 4)
    # same nc is a no-op passthrough
    m2, v2 = reshape_classifier_output(model, variables, nc=10)
    assert m2 is model and v2 is variables


def test_plot_evolve(tmp_path):
    import csv
    from yolo_dual_tpu.utils.plots import plot_evolve
    p = tmp_path / "evolve.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fitness", "lr0", "momentum"])
        for i in range(6):
            w.writerow([0.1 * i, 0.01 * (i + 1), 0.9 + 0.01 * i])
    out = plot_evolve(p)
    assert out.exists() and out.stat().st_size > 0


def test_parity_coco128_staged(tmp_path):
    """tools/parity_coco128.py end-to-end with a STUBBED downloader (VERDICT
    r2 next-#1b): the stub 'downloads' a tiny torch .pt (reference checkpoint
    format {'model': module}) and a coco128-seg-layout dataset zip; the script
    must extract, import weights, evaluate, and append the mAP table to
    PARITY.md — so the day egress exists the real run needs zero new code."""
    import sys
    import zipfile
    from pathlib import Path

    import pytest
    import yaml
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")
    if not Path("/root/reference").exists():
        pytest.skip("reference unavailable")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_torch_parity import _reference_models, _torch_cfg, tiny_cfg

    _, SegmentationModel = _reference_models()
    torch.manual_seed(0)
    cfg = tiny_cfg(True)
    cfg["nc"] = 80  # the coco128-seg names table drives nc=80 downstream
    ref = SegmentationModel(_torch_cfg(cfg), ch=3, nc=80).float().eval()
    cfg_path = tmp_path / "tiny-seg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    def stub_downloader(url, dest):
        dest = Path(dest)
        if dest.suffix == ".pt":
            torch.save({"model": ref}, dest)
        elif dest.suffix == ".zip":
            rng = __import__("numpy").random.default_rng(3)
            ds = dest.parent / "coco128-seg"
            (ds / "images/train2017").mkdir(parents=True)
            (ds / "labels/train2017").mkdir(parents=True)
            for i in range(2):
                im = rng.integers(0, 255, (96, 96, 3), dtype="uint8")
                cv2.imwrite(str(ds / f"images/train2017/{i}.jpg"), im)
                (ds / f"labels/train2017/{i}.txt").write_text(
                    "1 0.2 0.2 0.6 0.2 0.6 0.6 0.2 0.6\n")
            with zipfile.ZipFile(dest, "w") as z:
                for f in sorted(ds.rglob("*")):
                    z.write(f, f.relative_to(dest.parent))
            import shutil
            shutil.rmtree(ds)  # the script must restore it from the zip
        else:
            raise AssertionError(f"unexpected download target {dest}")
        return dest

    from tools.parity_coco128 import main
    out_md = tmp_path / "PARITY.md"
    ours, _ = main(["--weights", str(tmp_path / "yolov5s-seg.pt"),
                    "--dataset", str(tmp_path / "datasets" / "coco128-seg"),
                    "--imgsz", "96", "--batch-size", "2",
                    "--cfg", str(cfg_path), "--out", str(out_md)],
                   downloader=stub_downloader)
    assert len(ours) == 8 and all(__import__("math").isfinite(v) for v in ours)
    text = out_md.read_text()
    assert "coco128-seg real-weights parity" in text
    assert "ours (yolo_dual_tpu)" in text


def test_parity_camvid_staged(tmp_path):
    """tools/parity_camvid.py end-to-end with a STUBBED downloader (VERDICT
    r3 next-#9): the stub 'downloads' a SegNet-Tutorial-layout zip with a tiny
    CamVid tree (grayscale class-id annot PNGs); the script must extract,
    convert masks to the reference JSON format, train our semantic flagship a
    couple of epochs, and append the mIoU table to PARITY.md."""
    import math
    import zipfile
    from pathlib import Path

    import numpy as np
    import pytest
    cv2 = pytest.importorskip("cv2")

    def stub_downloader(url, dest):
        dest = Path(dest)
        assert dest.suffix == ".zip", f"unexpected download target {dest}"
        rng = np.random.default_rng(5)
        root = dest.parent / "SegNet-Tutorial-master" / "CamVid"
        for split, n in (("train", 4), ("val", 2)):
            (root / split).mkdir(parents=True)
            (root / f"{split}annot").mkdir(parents=True)
            for i in range(n):
                img = np.zeros((64, 64, 3), np.uint8)
                mask = np.full((64, 64), 3, np.uint8)       # road
                img[:28] = (90, 140, 230); mask[:28] = 0    # sky
                img[28:] = (95, 95, 95)
                img = np.clip(img.astype(np.int16)
                              + rng.integers(-15, 15, img.shape), 0, 255).astype(np.uint8)
                cv2.imwrite(str(root / split / f"{split}_{i:03d}.png"), img[..., ::-1])
                cv2.imwrite(str(root / f"{split}annot" / f"{split}_{i:03d}.png"), mask)
        with zipfile.ZipFile(dest, "w") as z:
            for f in sorted((dest.parent / "SegNet-Tutorial-master").rglob("*")):
                z.write(f, f.relative_to(dest.parent))
        import shutil
        shutil.rmtree(dest.parent / "SegNet-Tutorial-master")  # script restores from zip
        return dest

    from tools.parity_camvid import main
    out_md = tmp_path / "PARITY.md"
    ours, _ = main(["--dataset", str(tmp_path / "datasets" / "CamVid"),
                    "--epochs", "2", "--imgsz", "64", "--batch-size", "2",
                    "--cfg", "resnet18.yaml",
                    "--out-dir", str(tmp_path / "runs"), "--out", str(out_md)],
                   downloader=stub_downloader)
    assert math.isfinite(ours)
    text = out_md.read_text()
    assert "CamVid real-data semantic parity" in text
    assert f"{ours:.4f}" in text


@pytest.mark.slow
def test_parity_all_drill(tmp_path):
    """tools/parity_all.py offline drill (VERDICT r4 next #8): ONE command runs
    the coco128 parity stage AND the CamVid stage (stubbed downloads, bench
    skipped) and both tables land in PARITY.md — so on egress day the headline
    numbers are `python tools/parity_all.py` away."""
    import math
    import sys
    import zipfile
    from pathlib import Path

    import numpy as np
    import yaml
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")
    if not Path("/root/reference").exists():
        pytest.skip("reference unavailable")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_torch_parity import _reference_models, _torch_cfg, tiny_cfg

    _, SegmentationModel = _reference_models()
    torch.manual_seed(0)
    cfg = tiny_cfg(True)
    cfg["nc"] = 80
    ref = SegmentationModel(_torch_cfg(cfg), ch=3, nc=80).float().eval()
    cfg_path = tmp_path / "tiny-seg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rng = np.random.default_rng(9)

    def stub_downloader(url, dest):
        dest = Path(dest)
        if dest.suffix == ".pt":
            torch.save({"model": ref}, dest)
        elif "coco128" in dest.name:
            ds = dest.parent / "coco128-seg"
            (ds / "images/train2017").mkdir(parents=True)
            (ds / "labels/train2017").mkdir(parents=True)
            for i in range(2):
                im = rng.integers(0, 255, (96, 96, 3), dtype="uint8")
                cv2.imwrite(str(ds / f"images/train2017/{i}.jpg"), im)
                (ds / f"labels/train2017/{i}.txt").write_text(
                    "1 0.2 0.2 0.6 0.2 0.6 0.6 0.2 0.6\n")
            with zipfile.ZipFile(dest, "w") as z:
                for f in sorted(ds.rglob("*")):
                    z.write(f, f.relative_to(dest.parent))
            import shutil
            shutil.rmtree(ds)
        else:  # CamVid zip
            root = dest.parent / "SegNet-Tutorial-master" / "CamVid"
            for split, n in (("train", 4), ("val", 2)):
                (root / split).mkdir(parents=True)
                (root / f"{split}annot").mkdir(parents=True)
                for i in range(n):
                    img = np.zeros((64, 64, 3), np.uint8)
                    mask = np.full((64, 64), 3, np.uint8)
                    img[:28] = (90, 140, 230); mask[:28] = 0
                    img[28:] = (95, 95, 95)
                    img = np.clip(img.astype(np.int16)
                                  + rng.integers(-15, 15, img.shape), 0, 255
                                  ).astype(np.uint8)
                    cv2.imwrite(str(root / split / f"{split}_{i:03d}.png"),
                                img[..., ::-1])
                    cv2.imwrite(str(root / f"{split}annot" / f"{split}_{i:03d}.png"),
                                mask)
            with zipfile.ZipFile(dest, "w") as z:
                for f in sorted((dest.parent / "SegNet-Tutorial-master").rglob("*")):
                    z.write(f, f.relative_to(dest.parent))
            import shutil
            shutil.rmtree(dest.parent / "SegNet-Tutorial-master")
        return dest

    from tools.parity_all import main
    out_md = tmp_path / "PARITY.md"
    fails = main(
        ["--no-bench", "--no-reference"], downloader=stub_downloader,
        coco_args=["--weights", str(tmp_path / "yolov5s-seg.pt"),
                   "--dataset", str(tmp_path / "datasets" / "coco128-seg"),
                   "--imgsz", "96", "--batch-size", "2",
                   "--cfg", str(cfg_path), "--out", str(out_md)],
        camvid_args=["--dataset", str(tmp_path / "datasets" / "CamVid"),
                     "--epochs", "2", "--imgsz", "64", "--batch-size", "2",
                     "--cfg", "resnet18.yaml",
                     "--out-dir", str(tmp_path / "runs"), "--out", str(out_md)])
    assert fails == 0
    text = out_md.read_text()
    assert "coco128-seg real-weights parity" in text
    assert "CamVid real-data semantic parity" in text
