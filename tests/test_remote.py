"""RemoteModel client <-> serve.py server round trip (reference
utils/triton.py TritonRemoteModel analog, over our own serving stack)."""

import sys
import threading
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))


def test_remote_model_roundtrip(tmp_path):
    import serve

    opt = serve.parse_opt([
        "--cfg", "yolov5n-seg.yaml", "--nc", "3", "--imgsz", "64",
        "--conf-thres", "1e-6", "--port", "0"])  # port 0: OS picks a free one
    server = serve.build_server(opt)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        from yolo_dual_tpu.io.remote import RemoteModel
        rm = RemoteModel(f"http://127.0.0.1:{port}", timeout=120).warmup((64, 64, 3))

        img = np.random.default_rng(0).integers(0, 255, (80, 96, 3), dtype=np.uint8)
        dets = rm(img)
        assert dets.ndim == 2 and dets.shape[1] == 6
        assert len(dets) > 0  # conf 1e-6 on random init must emit something
        # boxes are in the ORIGINAL 96x80 pixel space (server un-letterboxes + clips)
        assert (dets[:, 0] >= 0).all() and (dets[:, 2] <= 96 + 1e-3).all()
        assert (dets[:, 1] >= 0).all() and (dets[:, 3] <= 80 + 1e-3).all()
        # encoded-bytes input path
        ok, buf = cv2.imencode(".jpg", img)
        dets2 = rm(buf.tobytes())
        assert dets2.shape[1] == 6

        # health + connection error surface
        assert rm.health()
        with pytest.raises(ConnectionError):
            RemoteModel(f"http://127.0.0.1:1", timeout=0.5)
    finally:
        server.shutdown()


def test_remote_semantic_classmap(tmp_path):
    """serve.py semantic dialect (r4): POST an image, get the per-pixel class
    map back (PNG+b64) at the ORIGINAL resolution — the reference has no
    semantic serving path at all."""
    import base64
    import json
    import urllib.request

    import yaml

    import serve

    cfg = tmp_path / "sem_tiny.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        nc=5, compiler="semantic", activation="relu",
        backbone=[[-1, 1, "ResNetStem", [8]],
                  [-1, 1, "ResNet18Layer", [16, 1, 2]]],
        head=[[-1, 1, "Conv", [5, 1, 1]], [-1, 1, "nn.Softmax", [1]]])))
    opt = serve.parse_opt(["--cfg", str(cfg), "--imgsz", "64", "--port", "0"])
    server = serve.build_server(opt)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = np.random.default_rng(1).integers(0, 255, (48, 80, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=buf.tobytes(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["shape"] == [48, 80]
        total = sum(out["class_pixels"].values())
        assert total == 48 * 80
        png = base64.b64decode(out["mask_png_b64"])
        mask = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_UNCHANGED)
        assert mask.shape == (48, 80)
        assert mask.max() < 5
    finally:
        server.shutdown()
