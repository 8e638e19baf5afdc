"""Classification prediction CLI (reference classify/predict.py:1-224):
images / dirs / videos / webcam-RTSP streams / screenshots in, top-k class
probabilities out, with annotated media and optional txt export.
"""

import argparse
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.data.loader import normalize_image
from yolo_dual_tpu.models.model import ClassificationModel
from yolo_dual_tpu.train import load_checkpoint
from yolo_dual_tpu.utils.general import LOGGER, increment_path

CONFIGS = ROOT / "yolo_dual_tpu" / "configs"


def run(weights="", model="yolov5n.yaml", source="", imgsz=224, cutoff=10, topk=5,
        device="", project="runs/predict-cls", name="exp", exist_ok=False,
        save_txt=False, nosave=False, vid_stride=1, max_frames=None,
        view_img=False, update=False, **kw):
    from yolo_dual_tpu.utils.general import select_device
    select_device(device)
    import cv2

    from yolo_dual_tpu.data.classify import classify_transforms
    from yolo_dual_tpu.engine.predictor import (iter_source, save_media_frame,
                                                 source_stem)
    from yolo_dual_tpu.utils.plots import Annotator

    if update and weights and not str(weights).endswith(".pt"):
        from yolo_dual_tpu.train.checkpoint import strip_optimizer
        strip_optimizer(weights)
    sys.path.insert(0, str(ROOT / "classify"))
    from train import build_classifier
    classes = None
    nc = 1000
    variables = None
    if weights:
        ckpt = load_checkpoint(weights)
        classes = list(ckpt.get("classes", [])) or None
        if classes:
            nc = len(classes)
        if ckpt.get("ema") and isinstance(ckpt["ema"], dict) and ckpt["ema"].get("ema"):
            variables = ckpt["ema"]["ema"]
        else:
            variables = ckpt.get("variables")
    m = build_classifier(model, nc, cutoff=cutoff)
    if variables is None:
        variables = m.module.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=False)

    @jax.jit
    def fwd(v, x):
        return jax.nn.softmax(m.module.apply(v, normalize_image(x), train=False), -1)

    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)
    vid_writers = {}
    results = []
    frame_idx = {}
    for path, im0, fps in iter_source(source, vid_stride=vid_stride,
                                      max_frames=max_frames):
        frame = frame_idx[path] = frame_idx.get(path, 0) + 1 if fps is not None else 0
        im = classify_transforms(cv2.cvtColor(im0, cv2.COLOR_BGR2RGB), imgsz)
        prob = np.asarray(fwd(variables, jnp.asarray(im[None])))[0]
        order = np.argsort(-prob)[:topk]
        names = [classes[i] if classes else str(i) for i in order]
        LOGGER.info(f"{Path(path).name}: "
                    + ", ".join(f"{n} {prob[i]:.3f}" for n, i in zip(names, order)))
        results.append((str(path), order, prob[order]))
        if save_txt:
            # per-frame suffix on video/stream sources (reference parity)
            suffix = f"_{frame}" if fps is not None else ""
            txt = save_dir / "labels" / f"{source_stem(path)}{suffix}.txt"
            txt.parent.mkdir(parents=True, exist_ok=True)
            with open(txt, "a") as f:
                f.write(" ".join(f"{prob[i]:.2f} {n}" for n, i in zip(names, order)) + "\n")
        if not nosave or view_img:
            # top-k text overlay (reference classify/predict.py annotator)
            annotator = Annotator(im0[..., ::-1].copy(), line_width=2)
            for row, (n_, i_) in enumerate(zip(names, order)):
                annotator.text((8, 16 + row * 18), f"{prob[i_]:.2f} {n_}")
            frame_bgr = annotator.result()[..., ::-1]
            if view_img:
                cv2.imshow(str(path), frame_bgr)
                cv2.waitKey(1)
            if not nosave:
                save_media_frame(save_dir, path, frame_bgr, fps, vid_writers)
    for w in vid_writers.values():
        w.release()
    if not nosave:
        LOGGER.info(f"results saved to {save_dir}")
    return results


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--model", type=str, default="yolov5n.yaml")
    p.add_argument("--source", type=str, required=True,
                   help="image/dir/video/URL/webcam-index/screen")
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=224)
    p.add_argument("--cutoff", type=int, default=10)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--project", default=str(ROOT / "runs" / "predict-cls"))
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--save-txt", action="store_true", help="save top-k rows to labels/*.txt")
    p.add_argument("--nosave", action="store_true", help="no annotated media")
    p.add_argument("--vid-stride", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--view-img", action="store_true")
    p.add_argument("--update", action="store_true", help="strip optimizer from --weights")
    p.add_argument("--half", action="store_true", help="parity flag")
    p.add_argument("--dnn", action="store_true", help="parity flag")
    p.add_argument("--augment", action="store_true", help="parity flag (no cls TTA upstream)")
    p.add_argument("--visualize", action="store_true", help="parity flag")
    p.add_argument("--device", default="", help="parity flag")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(**vars(parse_opt()))
