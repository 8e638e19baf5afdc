"""Native (C++) runtime components.

Builds on first import with the system toolchain (g++, no pybind11 needed —
plain CPython C API) and caches the shared object next to the source. Every
consumer has a pure-Python fallback, so a missing compiler only costs speed.
"""

from __future__ import annotations

import importlib.util
import subprocess
import sysconfig
from pathlib import Path

from yolo_dual_tpu.utils.general import LOGGER

_DIR = Path(__file__).resolve().parent
_SO = _DIR / f"fastmask{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}"

fastmask = None


def _build() -> bool:
    src = _DIR / "fastmask.cpp"
    if _SO.exists() and _SO.stat().st_mtime >= src.stat().st_mtime:
        return True
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", str(src), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        LOGGER.info(f"native fastmask build skipped ({e}); using Python fallback")
        return False


def _load():
    global fastmask
    if fastmask is not None:
        return fastmask
    if _build():
        try:
            spec = importlib.util.spec_from_file_location("fastmask", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            fastmask = mod
        except Exception as e:
            LOGGER.info(f"native fastmask load failed ({e}); using Python fallback")
    return fastmask


def parse_mask_json_bytes(data: bytes):
    """(h, w, np.uint8 mask) from a JSON dense-mask record; native if possible."""
    import numpy as np
    mod = _load()
    if mod is not None:
        h, w, raw = mod.parse_mask_json(data)
        return np.frombuffer(raw, np.uint8).reshape(h, w)
    import json
    d = json.loads(data)
    return np.asarray(d["mask_data"], np.uint8).reshape(d["shape"])
