"""Asset download helpers.

Capability parity with reference utils/downloads.py:16-108 (attempt_download
from GitHub release assets with curl fallback, safe_download with retries).
Network access is environment-gated: set YOLO_DUAL_TPU_OFFLINE=1 (or run in
an egress-less sandbox) and these raise a clear error instead of hanging.
"""

from __future__ import annotations

import os
import subprocess
import urllib.request
from pathlib import Path

from yolo_dual_tpu.utils.general import LOGGER

RELEASE_URL = "https://github.com/ultralytics/yolov5/releases/download/v7.0/"
KNOWN_ASSETS = [f"yolov5{s}{sfx}.pt" for s in "nsmlx" for sfx in ("", "6", "-seg", "-cls")]


def _offline() -> bool:
    return os.environ.get("YOLO_DUAL_TPU_OFFLINE", "0") == "1"


def safe_download(url: str, file, min_bytes: float = 1e0, retry: int = 3):
    """Download with size check + curl fallback (reference utils/downloads.py:39-60)."""
    file = Path(file)
    if _offline():
        raise RuntimeError(f"offline mode: cannot download {url}; place the file at {file}")
    for attempt in range(retry):
        try:
            LOGGER.info(f"Downloading {url} -> {file} (attempt {attempt + 1})")
            urllib.request.urlretrieve(url, file)
            if file.exists() and file.stat().st_size > min_bytes:
                return file
        except Exception as e:
            LOGGER.warning(f"download failed: {e}")
        try:  # curl fallback (reference uses curl -L with retries)
            subprocess.run(["curl", "-L", "-o", str(file), "--retry", "3", "-C", "-", url],
                           check=True)
            if file.exists() and file.stat().st_size > min_bytes:
                return file
        except Exception:
            pass
    raise RuntimeError(f"could not download {url}")


def attempt_download(file, repo_url: str = RELEASE_URL):
    """Resolve a weights path: local file wins; known release assets download
    (reference utils/downloads.py:62-108)."""
    file = Path(str(file).strip().replace("'", ""))
    if file.exists():
        return file
    if file.name in KNOWN_ASSETS:
        file.parent.mkdir(parents=True, exist_ok=True)
        return safe_download(repo_url + file.name, file, min_bytes=1e5)
    raise FileNotFoundError(f"{file} not found locally and not a known release asset")


def gsutil_getsize(url: str) -> int:
    try:
        out = subprocess.check_output(["gsutil", "du", url]).decode()
        return int(out.split()[0]) if out else 0
    except Exception:
        return 0
