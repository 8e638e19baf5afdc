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
