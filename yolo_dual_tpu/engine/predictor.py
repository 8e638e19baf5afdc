"""Streaming prediction engine: images/dirs/videos -> annotated outputs.

Capability parity with reference segment/predict.py:53-223 (source dispatch,
letterbox, NMS, process_mask upsample, box/mask drawing, txt/crop saving,
speed report). Webcam/RTSP streaming loops are host-side; the per-frame
compute (forward + NMS + masks) is one jitted function reused across frames.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dual_tpu.data.augment import letterbox
from yolo_dual_tpu.data.loader import normalize_image
from yolo_dual_tpu.ops import process_mask, scale_boxes
from yolo_dual_tpu.ops.mask_ops import scale_image
from yolo_dual_tpu.ops.nms import nms_batched, nms_from_raw
from yolo_dual_tpu.utils.general import LOGGER, Profile, increment_path
from yolo_dual_tpu.utils.plots import Annotator, colors

IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")
VID_EXTS = (".avi", ".mkv", ".mov", ".mp4", ".mpeg", ".mpg", ".webm")


def iter_source(source, vid_stride: int = 1,
                max_frames: Optional[int] = None) -> Iterator[Tuple[str, np.ndarray, Optional[float]]]:
    """Yield (path, BGR frame, fps|None) — fps is set for video/stream frames,
    None for still images. Dispatches files/dirs/videos (reference
    utils/dataloaders.py LoadImages:238), webcam/RTSP streams (LoadStreams:339)
    and screenshots (LoadScreenshots:189). `max_frames` bounds endless streams."""
    import cv2
    from yolo_dual_tpu.data.streams import (
        LoadScreenshots, LoadStreams, is_screenshot_source, is_stream_source)
    if is_stream_source(source):
        streams = LoadStreams(source, vid_stride=vid_stride)
        try:
            n = 0
            for paths, frames in streams:
                for si, (p, im) in enumerate(zip(paths, frames)):
                    yield str(p), im, float(streams.fps[si])
                n += 1
                if max_frames is not None and n >= max_frames:
                    break
        finally:
            streams.close()
        return
    if is_screenshot_source(source):
        n = 0
        for paths, frames in LoadScreenshots(source):
            yield paths[0], frames[0], None
            n += 1
            if max_frames is not None and n >= max_frames:
                break
        return
    src = Path(source)
    files: List[Path] = []
    if src.is_dir():
        files = sorted(p for p in src.rglob("*.*") if p.suffix.lower() in IMG_EXTS + VID_EXTS)
    elif src.is_file():
        files = [src]
    else:
        raise FileNotFoundError(f"source {source} not found")
    for f in files:
        if f.suffix.lower() in VID_EXTS:
            cap = cv2.VideoCapture(str(f))
            fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            n = yielded = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                n += 1
                if (n - 1) % vid_stride:
                    continue
                yield str(f), frame, fps
                yielded += 1
                # max_frames counts YIELDED frames for every source kind
                # (streams count the same way), not raw decoded frames
                if max_frames is not None and yielded >= max_frames:
                    break
            cap.release()
        else:
            im = cv2.imread(str(f))
            if im is None:
                LOGGER.warning(f"could not read {f}")
                continue
            yield str(f), im, None


def source_stem(path) -> str:
    """Filesystem-safe stem for an output named after a source: file stem for
    paths, sanitized URL for stream sources (rtsp://... has no suffix)."""
    p = Path(path)
    return p.stem if p.suffix else str(path).replace("://", "_").replace("/", "_")


def save_media_frame(save_dir, path, frame_bgr: np.ndarray, fps: Optional[float],
                     vid_writers: dict) -> None:
    """Write one output frame: still image -> <save_dir>/<name>; video/stream
    frame -> one mp4 VideoWriter per source, created lazily and keyed by
    source path (reference segment/predict.py:206-215). Caller releases the
    writers in `vid_writers` when the source loop ends."""
    import cv2
    if fps is not None:
        if path not in vid_writers:
            outp = Path(save_dir) / f"{source_stem(path)}.mp4"
            h, w = frame_bgr.shape[:2]
            vid_writers[path] = cv2.VideoWriter(
                str(outp), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        vid_writers[path].write(np.ascontiguousarray(frame_bgr))
    else:
        cv2.imwrite(str(Path(save_dir) / Path(path).name), frame_bgr)


def predict_images(model, variables, source, imgsz: int = 640, conf_thres: float = 0.25,
                   iou_thres: float = 0.45, max_det: int = 300, nm: int = 32,
                   classes=None, agnostic_nms: bool = False, retina_masks: bool = False,
                   save_dir: str = "runs/predict-seg/exp", save_txt: bool = False,
                   save_img: bool = True, names=None, line_thickness: int = 3,
                   hide_labels: bool = False, hide_conf: bool = False,
                   use_soft_nms: bool = False, augment: bool = False,
                   vid_stride: int = 1, max_frames: Optional[int] = None,
                   view_img: bool = False, fuse: bool = True,
                   save_crop: bool = False, device_preprocess: Optional[bool] = None,
                   save_conf: bool = False, exist_ok: bool = False,
                   visualize: bool = False):
    """Run streaming prediction. Returns list of per-image detection arrays.

    device_preprocess: letterbox+normalize on device via the Pallas fused
    kernel (kernels/preprocess.py) instead of host cv2 — the uint8 frame is
    the only H2D transfer. Default: auto (on when the backend is TPU).

    retina_masks: accepted for reference-CLI parity; masks are ALWAYS
    upsampled and un-letterboxed to native image resolution before blending
    (the reference's retina-quality rendering, segment/predict.py:168-170),
    so the flag is a no-op rather than a downgrade switch."""
    import cv2
    if device_preprocess is None:
        device_preprocess = jax.default_backend() == "tpu"
    save_dir = increment_path(Path(save_dir), exist_ok=exist_ok, mkdir=True)
    names = names or {i: str(i) for i in range(model.nc)}
    if fuse:
        # conv+BN weight folding (reference predict.py attempt_load → fuse())
        model, variables = model.fuse(variables)
    head_kw = model.spec.layers[-1].kw()
    anchors, strides = head_kw["anchors"], head_kw["strides"]
    classes_mask = None
    if classes is not None:
        cm = np.zeros((model.nc,), bool)
        cm[np.asarray(classes)] = True
        classes_mask = jnp.asarray(cm)

    @jax.jit
    def forward(variables, image):
        x = normalize_image(image)
        if augment:
            # TTA (reference segment/predict.py --augment → yolo.py:206-235)
            from yolo_dual_tpu.models.model import forward_augment
            pred, protos = forward_augment(model, variables, x)
            out, n_valid = nms_batched(pred, conf_thres=conf_thres, iou_thres=iou_thres,
                                       multi_label=False, agnostic=agnostic_nms,
                                       max_det=max_det, nm=nm, classes_mask=classes_mask,
                                       use_soft_nms=use_soft_nms)
        else:
            # fused decode+NMS from raw head maps (ops/nms.py nms_from_raw)
            levels, protos = model.module.apply(variables, x, train=False, decode=False)
            out, n_valid = nms_from_raw(levels, anchors, strides, conf_thres=conf_thres,
                                        iou_thres=iou_thres, multi_label=False,
                                        agnostic=agnostic_nms, max_det=max_det, nm=nm,
                                        classes_mask=classes_mask, use_soft_nms=use_soft_nms)
        return out, n_valid, protos

    @jax.jit
    def masks_fn(protos_i, coefs, boxes, upsample: bool = True):
        return process_mask(protos_i, coefs, boxes, (imgsz, imgsz), upsample=True, binarize=True)

    results = []
    dt = [Profile(), Profile(), Profile()]
    vid_writers = {}   # path -> cv2.VideoWriter (reference predict.py:206-215)
    frame_idx = {}     # path -> running frame number for video/stream sources
    for path, im0, fps in iter_source(source, vid_stride=vid_stride,
                                      max_frames=max_frames):
        frame = frame_idx[path] = frame_idx.get(path, 0) + 1 if fps is not None else 0
        with dt[0]:
            im = cv2.cvtColor(im0, cv2.COLOR_BGR2RGB)
            if device_preprocess:
                from yolo_dual_tpu.kernels import letterbox_normalize
                batch = letterbox_normalize(
                    jnp.asarray(im[None]), imgsz,
                    interpret=jax.default_backend() != "tpu")
            else:
                im, ratio, pad = letterbox(im, imgsz, auto=False)
                batch = jnp.asarray(im[None])
        with dt[1]:
            out, n_valid, protos = jax.block_until_ready(forward(variables, batch))
        if visualize:
            # per-layer feature-map panels for the FIRST frame (reference
            # predict.py --visualize → utils/plots.py feature_visualization)
            visualize = False
            from yolo_dual_tpu.utils.plots import feature_visualization
            _, inter = model.module.apply(
                variables, normalize_image(batch), train=False,
                capture_intermediates=lambda mdl, meth: meth == "__call__",
                mutable=["intermediates"])
            feats = inter["intermediates"]
            for lname in sorted((k for k in feats if k.startswith("model_")),
                                key=lambda k: int(k.split("_")[1])):
                outv = feats[lname]["__call__"][0]
                if hasattr(outv, "ndim"):
                    feature_visualization(outv, lname, int(lname.split("_")[1]),
                                          save_dir=Path(save_dir) / "features")
        with dt[2]:
            n = int(np.asarray(n_valid)[0])
            dets = np.asarray(out)[0, :n]
            annotator = Annotator(im0[..., ::-1].copy(), line_width=line_thickness)
            if n:
                masks = np.asarray(masks_fn(protos[0], jnp.asarray(dets[:, 6:6 + nm]),
                                            jnp.asarray(dets[:, :4])))
                masks_native = scale_image((imgsz, imgsz), masks.transpose(1, 2, 0).astype(np.float32),
                                           im0.shape).transpose(2, 0, 1) > 0.5
                boxes_native = np.asarray(scale_boxes((imgsz, imgsz), jnp.asarray(dets[:, :4]), im0.shape))
                annotator.masks(masks_native, [colors(int(c)) for c in dets[:, 5]])
                for (box, conf, cls) in zip(boxes_native, dets[:, 4], dets[:, 5]):
                    label = None if hide_labels else (
                        names[int(cls)] if hide_conf else f"{names[int(cls)]} {conf:.2f}")
                    annotator.box_label(box, label or "", color=colors(int(cls)))
                if save_crop:
                    # per-class crop dump (reference predict.py --save-crop →
                    # utils/plots.py save_one_box)
                    from yolo_dual_tpu.utils.plots import save_one_box
                    for box, cls in zip(boxes_native, dets[:, 5]):
                        save_one_box(box, im0[..., ::-1],
                                     file=Path(save_dir) / "crops" / names[int(cls)]
                                     / f"{Path(path).stem}.jpg", BGR=False)
                if save_txt:
                    # normalized xywh rows, conf only with --save-conf
                    # (reference segment/predict.py:160-165 save_one_txt format);
                    # video/stream frames get a per-frame suffix like the
                    # reference's txt_path + f'_{frame}' so rows stay attributable
                    suffix = f"_{frame}" if fps is not None else ""
                    txt = Path(save_dir) / "labels" / f"{source_stem(path)}{suffix}.txt"
                    txt.parent.mkdir(parents=True, exist_ok=True)
                    h0, w0 = im0.shape[:2]
                    with open(txt, "a") as f:
                        for box, conf, cls in zip(boxes_native, dets[:, 4], dets[:, 5]):
                            x1, y1, x2, y2 = box
                            row = [int(cls), (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0,
                                   (x2 - x1) / w0, (y2 - y1) / h0]
                            if save_conf:
                                row.append(float(conf))
                            f.write(" ".join(f"{v:g}" for v in row) + "\n")
            if save_img:
                save_media_frame(save_dir, path, annotator.result()[..., ::-1],
                                 fps, vid_writers)
            if view_img:
                cv2.imshow(str(path), annotator.result()[..., ::-1])
                cv2.waitKey(1)
            results.append(dets)
        LOGGER.info(f"{path}: {n} detections "
                    f"({dt[0].dt * 1e3:.1f}ms pre, {dt[1].dt * 1e3:.1f}ms infer, {dt[2].dt * 1e3:.1f}ms post)")
    for wtr in vid_writers.values():
        wtr.release()
    n_img = max(len(results), 1)
    LOGGER.info(f"Speed: {dt[0].t / n_img * 1e3:.1f}ms pre, {dt[1].t / n_img * 1e3:.1f}ms inference, "
                f"{dt[2].t / n_img * 1e3:.1f}ms post per image; results saved to {save_dir}")
    return results
