"""Semantic-path learning sanity: a tiny ResNet18+SegmentHead model must reach
high mIoU on synthetic colored shapes (verified: 0.984 mIoU after 150 steps,
24s on one v5e). Companion to tools/sanity_train.py (instance-seg path).

    python tools/sanity_train_semantic.py
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from yolo_dual_tpu.models.model import SemanticSegModel
from yolo_dual_tpu.losses import SemanticSegLoss
from yolo_dual_tpu.train import Trainer, ModelEMA, smart_optimizer
from yolo_dual_tpu.metrics import SegmentationConfusionMatrix

rng = np.random.default_rng(0)
imgsz, nc, bs = 128, 3, 16
def make(n):
    imgs = rng.integers(0, 40, (n, imgsz, imgsz, 3)).astype(np.uint8)
    gt = np.zeros((n, imgsz, imgsz), np.int32)
    for i in range(n):
        # class 1: bright box; class 2: green box; class 0 background
        for cls, color in ((1, [220, 60, 60]), (2, [60, 220, 60])):
            w, h = rng.integers(imgsz//5, imgsz//2, 2)
            x1, y1 = rng.integers(0, imgsz-w), rng.integers(0, imgsz-h)
            imgs[i, y1:y1+h, x1:x1+w] = color
            gt[i, y1:y1+h, x1:x1+w] = cls
    return imgs, gt

cfg = dict(nc=nc, compiler="semantic", activation="relu",
    backbone=[[-1,1,"ResNetStem",[32]], [-1,1,"ResNet18Layer",[32,2,1]],
              [-1,1,"ResNet18Layer",[64,2,2]], [-1,1,"ResNet18Layer",[128,2,2]]],
    head=[[[1,2,3],1,"SegmentHead",[nc, 64]]])
model = SemanticSegModel(cfg)
v = model.init(imgsz=imgsz)
hyp = dict(lr0=0.05, lrf=0.2, momentum=0.9, weight_decay=5e-4, warmup_epochs=0.2)
tx = smart_optimizer(v["params"], "SGD", hyp, epochs=1, steps_per_epoch=150)
tr = Trainer(model, SemanticSegLoss(nc, flavor="dice"), tx, ema=ModelEMA(decay=0.99, tau=200), task="semantic")
state = tr.init_state(v)
step = tr.make_train_step(donate=False)
imgs, gt = make(64)
t0 = time.time()
for s in range(150):
    sel = rng.integers(0, 64, bs)
    state, m = step(state, {"image": jnp.asarray(imgs[sel]), "mask": jnp.asarray(gt[sel])})
    if s % 30 == 0:
        print(f"step {s}: loss {float(m['loss']):.3f}")
print(f"{150} steps in {time.time()-t0:.0f}s")

vimgs, vgt = make(16)
ev = tr.make_eval_step()
out = np.asarray(ev(state, {"image": jnp.asarray(vimgs)}))
cm = SegmentationConfusionMatrix(nc)
cm.update(out.argmax(-1), vgt)
miou, per = cm.compute_iou()
print(f"SEM-SANITY mIoU={miou:.3f} per-class={np.round(per,3)}")
print("PASS" if miou > 0.5 else "FAIL")
