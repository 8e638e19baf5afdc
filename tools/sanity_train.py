"""End-to-end learning sanity check: train a small yolo-seg model on an easy
synthetic dataset (bright axis-aligned boxes on noise) and verify mAP rises
well above zero — the "training actually learns" proof that needs no external
dataset. Run on TPU (fast) or CPU (slow):

    python tools/sanity_train.py [--steps 150] [--imgsz 128]
"""

import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.engine import evaluate_segment
from yolo_dual_tpu.losses import ComputeSegmentLoss
from yolo_dual_tpu.models.model import SegmentationModel
from yolo_dual_tpu.train import ModelEMA, Trainer, smart_optimizer
from yolo_dual_tpu.utils.general import LOGGER


def make_dataset(rng, n, imgsz, M=8):
    images = np.full((n, imgsz, imgsz, 3), 40, np.uint8)
    images = images + rng.integers(0, 30, images.shape).astype(np.uint8)
    targets = np.zeros((n, M, 5), np.float32)
    tmask = np.zeros((n, M), bool)
    masks = np.zeros((n, imgsz // 4, imgsz // 4), np.float32)
    for i in range(n):
        k = rng.integers(1, 4)
        for j in range(k):
            w = rng.integers(imgsz // 6, imgsz // 3)
            h = rng.integers(imgsz // 6, imgsz // 3)
            x1 = rng.integers(0, imgsz - w)
            y1 = rng.integers(0, imgsz - h)
            color = rng.integers(180, 255, 3)
            images[i, y1:y1 + h, x1:x1 + w] = color
            cx, cy = (x1 + w / 2) / imgsz, (y1 + h / 2) / imgsz
            targets[i, j] = [0, cx, cy, w / imgsz, h / imgsz]
            tmask[i, j] = True
            masks[i, y1 // 4:(y1 + h) // 4, x1 // 4:(x1 + w) // 4] = j + 1
    return images, targets, tmask, masks


def main(opt):
    rng = np.random.default_rng(0)
    imgsz = opt.imgsz
    cfg = dict(
        nc=1, depth_multiple=0.33, width_multiple=0.25,
        anchors=[[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                 [116, 90, 156, 198, 373, 326]],
        backbone=[
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 2, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]], [-1, 2, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]], [-1, 2, "C3", [512]],
            [-1, 1, "Conv", [1024, 3, 2]], [-1, 1, "C3", [1024]], [-1, 1, "SPPF", [1024, 5]],
        ],
        head=[
            [-1, 1, "Conv", [512, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [256, 1, 1]], [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [-1, 1, "Conv", [256, 3, 2]], [[-1, 14], 1, "Concat", [1]], [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [512, 3, 2]], [[-1, 10], 1, "Concat", [1]], [-1, 1, "C3", [1024, False]],
            [[17, 20, 23], 1, "Segment", ["nc", "anchors", 16, 64]],
        ],
    )
    hyp = dict(lr0=0.01, lrf=0.2, momentum=0.937, weight_decay=5e-4, warmup_epochs=0.5,
               box=0.05, cls=0.5, obj=1.0, anchor_t=4.0, cls_pw=1.0, obj_pw=1.0, fl_gamma=0.0)

    model = SegmentationModel(cfg)
    variables = model.init(imgsz=imgsz)
    head_kw = model.spec.layers[-1].kw()
    loss = ComputeSegmentLoss(head_kw["anchors"], head_kw["strides"], 1,
                              head_kw["nm"], hyp, overlap=True)
    bs = opt.batch_size
    tx = smart_optimizer(variables["params"], "SGD", hyp, epochs=1,
                         steps_per_epoch=opt.steps)
    tr = Trainer(model, loss, tx, ema=ModelEMA(decay=0.99, tau=200), task="segment")
    state = tr.init_state(variables)
    step = tr.make_train_step(donate=False)

    images, targets, tmask, masks = make_dataset(rng, 64, imgsz)
    t0 = time.time()
    for s in range(opt.steps):
        sel = rng.integers(0, len(images), bs)
        batch = {"image": jnp.asarray(images[sel]), "targets": jnp.asarray(targets[sel]),
                 "tmask": jnp.asarray(tmask[sel]), "masks": jnp.asarray(masks[sel])}
        state, m = step(state, batch)
        if s % 25 == 0:
            LOGGER.info(f"step {s}: loss {float(m['loss']):.3f} "
                        f"items {np.asarray(m['items']).round(3)}")
    LOGGER.info(f"trained {opt.steps} steps in {time.time() - t0:.0f}s")

    val_images, val_t, val_m, val_masks = make_dataset(np.random.default_rng(1), 16, imgsz)
    val_batches = [{"image": val_images[i:i + bs], "targets": val_t[i:i + bs],
                    "tmask": val_m[i:i + bs], "masks": val_masks[i:i + bs],
                    "n_valid": np.int32(min(bs, 16 - i))}
                   for i in range(0, 16, bs)]
    variables_eval = state.ema["ema"]
    mean, maps, _ = evaluate_segment(model, variables_eval, val_batches, 1,
                                     nm=head_kw["nm"], conf_thres=0.01)
    LOGGER.info(f"box mAP50 {mean[2]:.3f} mAP {mean[3]:.3f} | mask mAP50 {mean[6]:.3f}")
    ok = mean[2] > opt.min_map50
    print(f"SANITY-{'PASS' if ok else 'FAIL'} box_mAP50={mean[2]:.3f} mask_mAP50={mean[6]:.3f}")
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--imgsz", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--min-map50", type=float, default=0.3)
    sys.exit(main(p.parse_args()))
