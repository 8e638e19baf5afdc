"""Plotting & annotation utilities (host-side, matplotlib/PIL/cv2).

Capability parity with reference utils/plots.py (Annotator :71-183,
plot_images :245, plot_labels :402, plot_results :503, PR/MC curves
utils/metrics.py:321-362), utils/segment/plots.py (mask mosaics), and the
CamVid palette composites (reference seg_diceloss_Resnet50.py:60-72,851-872).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class Colors:
    """Ultralytics-style color palette cycling per class id."""

    def __init__(self):
        hexs = ("FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17",
                "3DDB86", "1A9334", "00D4BB", "2C99A8", "00C2FF", "344593", "6473FF",
                "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7")
        self.palette = [tuple(int(h[i:i + 2], 16) for i in (0, 2, 4)) for h in hexs]
        self.n = len(self.palette)

    def __call__(self, i, bgr=False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()

CAMVID_PALETTE = np.array([
    [128, 128, 128], [128, 0, 0], [192, 192, 128], [128, 64, 128], [60, 40, 222],
    [128, 128, 0], [192, 128, 128], [64, 64, 128], [64, 0, 128], [64, 64, 0],
    [0, 128, 192], [0, 0, 0]], np.uint8)


class Annotator:
    """Box / mask / label drawing on a numpy HWC uint8 image
    (reference utils/plots.py:71-183)."""

    def __init__(self, im, line_width=None, font_size=None, pil=False, example=""):
        self.im = np.ascontiguousarray(im)
        self.lw = line_width or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)

    def box_label(self, box, label="", color=(128, 128, 128), txt_color=(255, 255, 255)):
        import cv2
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, thickness=self.lw, lineType=cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, fontScale=self.lw / 3, thickness=tf)[0]
            outside = p1[1] - h >= 3
            p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
            cv2.rectangle(self.im, p1, p2, color, -1, cv2.LINE_AA)
            cv2.putText(self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                        0, self.lw / 3, txt_color, thickness=tf, lineType=cv2.LINE_AA)

    def masks(self, masks, colors_list, alpha: float = 0.5):
        """Alpha-blend instance masks. masks: (n, h, w) bool/float at image res."""
        if len(masks) == 0:
            return
        masks = np.asarray(masks, np.float32)
        overlay = self.im.astype(np.float32)
        for m, c in zip(masks, colors_list):
            m3 = m[..., None]
            overlay = overlay * (1 - m3 * alpha) + m3 * alpha * np.asarray(c, np.float32)
        self.im = overlay.astype(np.uint8)

    def text(self, xy, text: str, color=(255, 255, 255)):
        """Plain text at xy (reference Annotator.text, utils/plots.py:150)."""
        import cv2
        cv2.putText(self.im, text, (int(xy[0]), int(xy[1])), cv2.FONT_HERSHEY_SIMPLEX,
                    max(self.lw / 4.0, 0.4), color, max(self.lw // 2, 1), cv2.LINE_AA)

    def result(self):
        return self.im


def colorize_semantic(mask: np.ndarray, palette: np.ndarray = CAMVID_PALETTE) -> np.ndarray:
    """Class-id mask (h, w) -> RGB uint8 using the CamVid palette."""
    return palette[np.clip(mask, 0, len(palette) - 1)]


def legend_strip(names, palette: np.ndarray = CAMVID_PALETTE, height: int = 640,
                 width: int = 160) -> np.ndarray:
    """Vertical class-color legend (reference test.py:121-130 create_legend):
    one color swatch + class name per row, drawn with cv2 (no matplotlib)."""
    import cv2
    strip = np.full((height, width, 3), 255, np.uint8)
    n = max(len(names), 1)
    row_h = height // n
    sw = max(min(row_h - 6, 24), 4)
    for i, name in enumerate(names):
        y0 = i * row_h + (row_h - sw) // 2
        color = tuple(int(c) for c in palette[i % len(palette)])
        cv2.rectangle(strip, (6, y0), (6 + sw, y0 + sw), color, -1)
        cv2.putText(strip, str(name), (12 + sw, y0 + sw - max(sw // 4, 2)),
                    cv2.FONT_HERSHEY_SIMPLEX, max(row_h / 80.0, 0.3), (0, 0, 0), 1,
                    cv2.LINE_AA)
    return strip


def semantic_panel(image: np.ndarray, gt: np.ndarray, pred: np.ndarray,
                   palette: np.ndarray = CAMVID_PALETTE, names=None) -> np.ndarray:
    """4-panel [input | GT | pred | diff] composite
    (reference seg_diceloss_Resnet50.py:851-872 / val_diceloss.py:122-143);
    `names` appends a class-color legend strip (reference test.py:104,121-130)."""
    img = (image * 255).astype(np.uint8) if image.dtype != np.uint8 else image
    gt_rgb = colorize_semantic(gt, palette)
    pred_rgb = colorize_semantic(pred, palette)
    diff = np.where((gt != pred)[..., None], np.array([255, 0, 0], np.uint8),
                    np.array([0, 255, 0], np.uint8))
    panels = [img, gt_rgb, pred_rgb, diff]
    if names is not None:
        panels.append(legend_strip(names, palette, height=img.shape[0]))
    return np.concatenate(panels, axis=1)


def plot_pr_curve(px, py, ap, save_dir="pr_curve.png", names=()):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, axis=1) if len(py) else np.zeros((len(px), 0))
    if 0 < len(names) < 21:
        for i, y in enumerate(py.T):
            ax.plot(px, y, linewidth=1, label=f"{names[i]} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    if py.shape[1]:
        ax.plot(px, py.mean(1), linewidth=3, color="blue",
                label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left")
    fig.savefig(save_dir, dpi=250)
    plt.close(fig)


def plot_mc_curve(px, py, save_dir="mc_curve.png", names=(), xlabel="Confidence", ylabel="Metric"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1, label=f"{names[i]}")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = np.asarray(py).mean(0) if len(py) else np.zeros_like(px)
    ax.plot(px, y, linewidth=3, color="blue", label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left")
    fig.savefig(save_dir, dpi=250)
    plt.close(fig)


def plot_images(images, targets, paths=None, fname="images.jpg", names=None, max_size=1920,
                max_subplots=16):
    """Mosaic of images with boxes (reference utils/plots.py:245-330).
    images: (bs, h, w, 3) float 0-1; targets rows [img, cls, xywhn...]."""
    import cv2
    images = np.asarray(images)
    bs, h, w, _ = images.shape
    bs = min(bs, max_subplots)
    ns = int(np.ceil(bs ** 0.5))
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(bs):
        y, x = (i // ns) * h, (i % ns) * w
        mosaic[y:y + h, x:x + w] = (images[i] * 255).astype(np.uint8)
        if targets is not None and len(targets):
            ti = targets[targets[:, 0] == i]
            for row in ti:
                cls = int(row[1])
                bx = row[2:6] * np.array([w, h, w, h])
                x1, y1 = int(x + bx[0] - bx[2] / 2), int(y + bx[1] - bx[3] / 2)
                x2, y2 = int(x + bx[0] + bx[2] / 2), int(y + bx[1] + bx[3] / 2)
                cv2.rectangle(mosaic, (x1, y1), (x2, y2), colors(cls, True), 2)
    if fname:
        cv2.imwrite(str(fname), mosaic[..., ::-1])
    return mosaic


def plot_images_and_masks(images, targets, masks, fname="train_batch.jpg", names=None):
    """Instance-seg mosaic (reference utils/segment/plots.py:17-108): boxes +
    mask alpha overlay."""
    import cv2
    images = np.asarray(images)
    out = plot_images(images, targets, fname=None)
    bs, h, w, _ = images.shape
    ns = int(np.ceil(min(bs, 16) ** 0.5))
    masks = np.asarray(masks)
    for i in range(min(bs, 16)):
        y, x = (i // ns) * h, (i % ns) * w
        if masks.ndim == 3 and masks.shape[0] == bs:  # overlap-encoded
            plane = masks[i]
            if plane.shape != (h, w):
                plane = cv2.resize(plane.astype(np.float32), (w, h), interpolation=cv2.INTER_NEAREST)
            for idx in range(1, int(plane.max()) + 1):
                m = (plane == idx).astype(np.float32)[..., None]
                color = np.asarray(colors(idx), np.float32)
                region = out[y:y + h, x:x + w].astype(np.float32)
                out[y:y + h, x:x + w] = (region * (1 - m * 0.5) + m * 0.5 * color).astype(np.uint8)
    if fname:
        cv2.imwrite(str(fname), out[..., ::-1])
    return out


def plot_results(csv_file="results.csv", save_dir="."):
    """Plot training curves from results.csv (reference utils/plots.py:503)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    df = pd.read_csv(csv_file)
    cols = [c for c in df.columns if c.strip() != "epoch"]
    n = len(cols)
    fig, axes = plt.subplots(max(1, (n + 4) // 5), 5, figsize=(18, 8), tight_layout=True)
    axes = np.atleast_1d(axes).ravel()
    for ax, c in zip(axes, cols):
        ax.plot(df["epoch"] if "epoch" in df else df.index, df[c], marker=".")
        ax.set_title(c.strip(), fontsize=9)
    out = Path(save_dir) / "results.png"
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out


def plot_evolve(evolve_csv="evolve.csv"):
    """Scatter grid of fitness vs each evolved hyperparameter, best point
    highlighted (reference utils/plots.py:476-500 plot_evolve)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    evolve_csv = Path(evolve_csv)
    df = pd.read_csv(evolve_csv)
    df.columns = [c.strip() for c in df.columns]
    fit = df["fitness"].values
    best = int(np.argmax(fit))
    keys = [c for c in df.columns if c != "fitness"]
    n = len(keys)
    ncols = 5
    fig, axes = plt.subplots(max(1, -(-n // ncols)), ncols,
                             figsize=(12, 2.4 * max(1, -(-n // ncols))),
                             tight_layout=True)
    axes = np.atleast_1d(axes).ravel()
    for ax, k in zip(axes, keys):
        v = df[k].values
        ax.scatter(v, fit, c=fit, cmap="viridis", alpha=0.7, s=12)
        ax.scatter(v[best], fit[best], marker="+", c="red", s=80)
        ax.set_title(f"{k} = {v[best]:.3g}", fontsize=8)
    for ax in axes[len(keys):]:
        ax.axis("off")
    out = evolve_csv.with_name("evolve.png")
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out


def plot_val_study(file="", dir=".", x=None):
    """Speed-vs-mAP study curves from study_*.txt files written by
    `segment/val.py --task study` (reference utils/plots.py:356-399).
    Row layout: 8 metrics [P,R,mAP50,mAP]x{box,mask} + 3 times [pre,inf,post].
    `x`: the swept image sizes, used to annotate each point (one per row)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    save_dir = Path(file).parent if file else Path(dir)
    files = [Path(file)] if file else sorted(save_dir.glob("study*.txt"))
    fig, ax = plt.subplots(1, 1, figsize=(8, 4), tight_layout=True)
    for f in files:
        y = np.loadtxt(f, dtype=np.float32, ndmin=2).T
        if not y.size:
            continue
        j = int(y[3].argmax()) + 1  # stop at peak box mAP (reference :374)
        ax.plot(y[9, :j], y[3, :j] * 100, ".-", linewidth=2, markersize=8,
                label=f.stem.replace("study_", ""))
        if x is not None:
            for xi, tx, ty in zip(list(x)[:j], y[9, :j], y[3, :j] * 100):
                ax.annotate(str(int(xi)), (tx, ty), textcoords="offset points",
                            xytext=(4, 4), fontsize=7, alpha=0.7)
    ax.set_xlabel("inference time (ms/img)")
    ax.set_ylabel("box mAP50-95")
    ax.grid(alpha=0.2)
    ax.legend(loc="lower right")
    out = save_dir / "study.png"
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out


def feature_visualization(x, module_type, stage, n=32, save_dir=Path("runs/features")):
    """Save first-n channel maps of a feature tensor (reference utils/plots.py:184)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    x = np.asarray(x)
    if x.ndim != 4:
        return
    save_dir.mkdir(parents=True, exist_ok=True)
    blocks = np.moveaxis(x[0], -1, 0)[:n]
    cols = 8
    rows = int(np.ceil(len(blocks) / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.5, rows * 1.5), tight_layout=True)
    for ax, blk in zip(np.atleast_1d(axes).ravel(), blocks):
        ax.imshow(blk, cmap="viridis")
        ax.axis("off")
    f = save_dir / f"stage{stage}_{module_type.split('.')[-1]}.png"
    fig.savefig(f, dpi=150)
    plt.close(fig)


def save_one_box(xyxy, im, file=Path("im.jpg"), gain: float = 1.02, pad: int = 10,
                 square: bool = False, BGR: bool = False, save: bool = True):
    """Crop a (gain-scaled, padded) box from an HWC image and optionally save
    it with an incremented filename (reference utils/plots.py:560 save_one_box,
    used by --save-crop and AutoShape .crop())."""
    import cv2

    b = np.asarray(xyxy, np.float32).reshape(4)
    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    w, h = b[2] - b[0], b[3] - b[1]
    if square:
        w = h = max(w, h)
    w, h = w * gain + pad, h * gain + pad
    x1 = int(np.clip(cx - w / 2, 0, im.shape[1]))
    x2 = int(np.clip(cx + w / 2, 0, im.shape[1]))
    y1 = int(np.clip(cy - h / 2, 0, im.shape[0]))
    y2 = int(np.clip(cy + h / 2, 0, im.shape[0]))
    crop = im[y1:y2, x1:x2, :: (1 if BGR else -1)]
    if save and crop.size:
        file = Path(file)
        file.parent.mkdir(parents=True, exist_ok=True)
        from yolo_dual_tpu.utils.general import increment_path
        f = increment_path(file.with_suffix(".jpg"))
        cv2.imwrite(str(f), np.ascontiguousarray(crop))
    return crop


def plot_labels(labels, names=(), save_dir=Path(".")):
    """Dataset-label panels -> labels.jpg: class histogram, box-overlay,
    xy and wh densities (reference utils/plots.py:402-445, without the
    seaborn correlogram dependency). labels: (n, 5) [cls, xywh normalized]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    labels = np.asarray(labels, np.float64)
    if not labels.size:
        return None
    save_dir = Path(save_dir)
    c, b = labels[:, 0], labels[:, 1:5]
    nc = int(c.max()) + 1
    fig, ax = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    ax = ax.ravel()
    y = ax[0].hist(c, bins=np.linspace(0, nc, nc + 1) - 0.5, rwidth=0.8)
    for i in range(min(nc, len(y[2].patches))):
        y[2].patches[i].set_color([v / 255 for v in colors(i)])
    ax[0].set_ylabel("instances")
    if 0 < len(names) < 30:
        ax[0].set_xticks(range(len(names)))
        labels_txt = list(names.values()) if isinstance(names, dict) else list(names)
        ax[0].set_xticklabels(labels_txt, rotation=90, fontsize=9)
    else:
        ax[0].set_xlabel("classes")
    # centered box overlay (first 1000)
    img = np.full((1000, 1000, 3), 255, np.uint8)
    import cv2
    for cls, (_, _, w, h) in zip(c[:1000], b[:1000]):
        x1 = int((0.5 - w / 2) * 1000)
        y1 = int((0.5 - h / 2) * 1000)
        x2 = int((0.5 + w / 2) * 1000)
        y2 = int((0.5 + h / 2) * 1000)
        cv2.rectangle(img, (x1, y1), (x2, y2), colors(int(cls)), 1)
    ax[1].imshow(img)
    ax[1].axis("off")
    ax[2].hist2d(b[:, 0], b[:, 1], bins=50, cmap="Blues")
    ax[2].set_xlabel("x")
    ax[2].set_ylabel("y")
    ax[3].hist2d(b[:, 2], b[:, 3], bins=50, cmap="Blues")
    ax[3].set_xlabel("width")
    ax[3].set_ylabel("height")
    out = save_dir / "labels.jpg"
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out


def imshow_cls(ims, labels=None, pred=None, names=None, nmax: int = 25,
               f=Path("images.jpg")):
    """Classification image mosaic with true/pred captions
    (reference utils/plots.py:447-474). ims: (n, h, w, 3) RGB uint8/float."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ims = np.asarray(ims)
    n = min(len(ims), nmax)
    m = int(np.ceil(n ** 0.5))
    fig, axes = plt.subplots(m, m, figsize=(m * 1.8, m * 1.8), tight_layout=True)
    axes = np.atleast_1d(axes).ravel()
    for i in range(n):
        im = ims[i]
        if im.dtype != np.uint8:
            im = (im * 255).clip(0, 255).astype(np.uint8)
        axes[i].imshow(im)
        title = []
        if labels is not None:
            title.append(str(names[int(labels[i])] if names else int(labels[i])))
        if pred is not None:
            title.append(f"pred: {names[int(pred[i])] if names else int(pred[i])}")
        if title:
            axes[i].set_title(" | ".join(title), fontsize=7)
    for a in axes:
        a.axis("off")
    f = Path(f)
    f.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(f, dpi=160)
    plt.close(fig)
    return f


def plot_lr_scheduler(lr_fn, steps: int, save_dir=Path(".")):
    """LR-over-steps curve -> LR.png (reference utils/plots.py:309-320;
    lr_fn: step -> lr, e.g. train.optim.build_lr_schedule's output)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xs = np.arange(steps)
    ys = [float(lr_fn(x)) for x in xs]
    fig, ax = plt.subplots(figsize=(6, 4), tight_layout=True)
    ax.plot(xs, ys)
    ax.set_xlabel("step")
    ax.set_ylabel("LR")
    ax.grid(alpha=0.2)
    out = Path(save_dir) / "LR.png"
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out
