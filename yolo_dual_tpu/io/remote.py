"""Remote-inference client.

Capability parity with the reference's TritonRemoteModel
(reference utils/triton.py:11-85 — a thin client that forwards tensors to an
external inference server and returns outputs): here the server is this
framework's own serve.py (the compiled TPU model stays resident there), and
the client speaks its JSON-over-HTTP protocol. Like the reference client, it
exposes `__call__` and a `warmup()`, so DetectMultiBackend-style call sites
don't care whether the model is local or remote.

    rm = RemoteModel("http://tpu-host:8507")
    dets = rm(image_bgr)          # (n, 6) [x1, y1, x2, y2, conf, cls]
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Optional

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


class RemoteModel:
    """Client for a serve.py endpoint. Accepts HWC uint8 images (BGR or RGB —
    the server letterboxes + normalizes; channel order only affects colors,
    pass what your decoder produced) or raw encoded JPEG/PNG bytes."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url.rstrip("/")
        self.timeout = timeout
        if not self.health():
            raise ConnectionError(f"remote model at {self.url} failed health check")
        LOGGER.info(f"RemoteModel: connected to {self.url}")

    def health(self) -> bool:
        try:
            with urllib.request.urlopen(f"{self.url}/health", timeout=self.timeout) as r:
                return r.status == 200
        except (urllib.error.URLError, OSError):
            return False

    def _encode(self, image) -> bytes:
        if isinstance(image, (bytes, bytearray)):
            return bytes(image)
        import cv2
        arr = np.asarray(image)
        ok, buf = cv2.imencode(".png", arr)
        assert ok, "image encode failed"
        return buf.tobytes()

    def __call__(self, image) -> np.ndarray:
        """Returns (n, 6) float32 [x1, y1, x2, y2, conf, cls] in the ORIGINAL
        image's pixel space (the server un-letterboxes)."""
        req = urllib.request.Request(
            f"{self.url}/predict", data=self._encode(image), method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            payload = json.loads(r.read())
        dets = payload.get("detections", [])
        if not dets:
            return np.zeros((0, 6), np.float32)
        return np.array([[*d["box"], d["conf"], d["cls"]] for d in dets], np.float32)

    def warmup(self, shape=(64, 64, 3)):
        self(np.zeros(shape, np.uint8))
        return self
