"""Minimal HTTP model server.

Capability parity with the reference's serving hook (utils/triton.py
TritonRemoteModel — a client for an external Triton server): here the
framework serves itself. POST a JPEG/PNG to /predict and get JSON detections
back; the compiled forward + NMS stays resident on the TPU.

Usage:
    python serve.py --weights runs/train-seg/exp/best --cfg yolov5s-seg.yaml --port 8507
    curl -s -X POST --data-binary @img.jpg localhost:8507/predict | jq .
"""

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

ROOT = Path(__file__).resolve().parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def build_server(opt):
    """Build the HTTPServer (compiled model resident). Split from main() so
    tests and the RemoteModel client (io/remote.py) can run it in a thread."""
    import cv2
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(ROOT / "segment"))
    import yaml
    from val import find_cfg, load_model_and_weights
    from yolo_dual_tpu.data.augment import letterbox
    from yolo_dual_tpu.ops import scale_boxes
    from yolo_dual_tpu.ops.nms import nms_from_raw

    cfg_path = find_cfg(opt.cfg, "segment", "models", "semantic")
    cfg_dict = yaml.safe_load(Path(cfg_path).read_text())
    semantic = cfg_dict.get("anchors") is None
    if semantic:
        # semantic dialect: serve per-pixel class maps (the reference has no
        # semantic serving path at all — this framework serves both dialects)
        from yolo_dual_tpu.io.weights import resolve_variables
        from yolo_dual_tpu.models.model import build_model
        nc = opt.nc if opt.nc is not None else int(cfg_dict.get("nc", 12))
        if nc > 256:
            # the served class map is a uint8 PNG; ids above 255 would wrap
            raise SystemExit(f"semantic serving supports nc<=256 (got {nc}): "
                             "the class-map response is a uint8 PNG")
        model = build_model(cfg_path, nc=opt.nc)
        variables = model.init(imgsz=opt.imgsz)
        if opt.weights:
            variables = resolve_variables(model, opt.weights, variables)
        model, variables = model.fuse(variables)

        @jax.jit
        def infer(v, x):
            scores = model.apply(v, x.astype(jnp.float32) / 255.0, train=False)
            return scores.argmax(-1).astype(jnp.uint8)
    else:
        model, variables = load_model_and_weights(opt.weights, opt.cfg,
                                                  opt.nc if opt.nc is not None else 80,
                                                  opt.imgsz)
        model, variables = model.fuse(variables)  # conv+BN folding for serving
        head_kw = model.spec.layers[-1].kw()
        nm = head_kw.get("nm", 32)
        anchors, strides = head_kw["anchors"], head_kw["strides"]

        @jax.jit
        def infer(v, x):
            # fused decode+NMS from raw head maps — the serving hot path
            levels, protos = model.module.apply(v, x.astype(jnp.float32) / 255.0,
                                                train=False, decode=False)
            out, nv = nms_from_raw(levels, anchors, strides, conf_thres=opt.conf_thres,
                                   iou_thres=opt.iou_thres, max_det=opt.max_det, nm=nm)
            return out, nv

    # warmup so first request is fast
    infer(variables, jnp.zeros((1, opt.imgsz, opt.imgsz, 3), jnp.uint8))
    LOGGER.info(f"model ready on port {opt.port}")

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                # empty/garbage buffers: modern OpenCV RAISES on empty input
                # instead of returning None — both must map to a clean 400
                img = cv2.imdecode(np.frombuffer(self.rfile.read(n), np.uint8),
                                   cv2.IMREAD_COLOR) if n else None
            except cv2.error:
                img = None
            if img is None:
                self.send_error(400, "not an image")
                return
            im0_shape = img.shape
            im, ratio, pad = letterbox(cv2.cvtColor(img, cv2.COLOR_BGR2RGB),
                                       opt.imgsz, auto=False)
            if semantic:
                # per-pixel class map, un-letterboxed to the original size
                # (nearest keeps class ids crisp), PNG+base64 in the JSON
                import base64
                cmap = np.asarray(infer(variables, jnp.asarray(im[None])))[0]
                h0, w0 = im0_shape[:2]
                # content box exactly as letterbox laid it out: new_unpad from
                # the returned ratio, top/left with the same -0.1 rounding
                # (odd padding splits asymmetrically; deriving from imgsz-2*top
                # shifts the crop by 1px when dh is a half-integer)
                bw, bh = int(round(w0 * ratio[0])), int(round(h0 * ratio[1]))
                top, left = int(round(pad[1] - 0.1)), int(round(pad[0] - 0.1))
                crop = cmap[top:top + bh, left:left + bw]
                full = cv2.resize(crop, (w0, h0), interpolation=cv2.INTER_NEAREST)
                ids, counts = np.unique(full, return_counts=True)
                ok, png = cv2.imencode(".png", full)
                body = json.dumps({
                    "shape": [int(h0), int(w0)],
                    "class_pixels": {int(i): int(c) for i, c in zip(ids, counts)},
                    "mask_png_b64": base64.b64encode(png.tobytes()).decode()
                    if ok else None,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            out, nv = infer(variables, jnp.asarray(im[None]))
            k = int(np.asarray(nv)[0])
            dets = np.asarray(out)[0, :k]
            boxes = np.asarray(scale_boxes((opt.imgsz, opt.imgsz), jnp.asarray(dets[:, :4]), im0_shape))
            body = json.dumps({
                "detections": [
                    {"box": [float(v) for v in b], "conf": float(c), "cls": int(cl)}
                    for b, c, cl in zip(boxes, dets[:, 4], dets[:, 5])
                ]
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_error(404)

        def log_message(self, fmt, *args):
            LOGGER.info("serve: " + fmt % args)

    return HTTPServer(("0.0.0.0", opt.port), Handler)


def main(opt):
    build_server(opt).serve_forever()


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="")
    p.add_argument("--cfg", default="yolov5s-seg.yaml")
    p.add_argument("--nc", type=int, default=None,
                   help="class-count override; default: the config's own nc")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--port", type=int, default=8507)
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_opt())
