"""General utilities: logging, config IO, path helpers, timers.

Capability parity with the reference's ``utils/general.py`` plumbing layer
(reference: utils/general.py:120-146 LOGGER, :683 one_cycle, :1094 increment_path,
:418 check_img_size, :240 init_seeds) — re-implemented for a JAX host program.
"""

from __future__ import annotations

import contextlib
import logging
import math
import os
import platform
import random
import re
import subprocess
import time
from pathlib import Path

import numpy as np
import yaml

FRAMEWORK_NAME = "yolo_dual_tpu"


def set_logging(name: str = FRAMEWORK_NAME, verbose: bool = True):
    level = logging.INFO if verbose else logging.ERROR
    log = logging.getLogger(name)
    log.setLevel(level)
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        log.addHandler(handler)
    log.propagate = False
    return log


LOGGER = set_logging()


def colorstr(*input):
    """colorstr('blue', 'hello world') -> ANSI-colored string (reference utils/general.py:148)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def make_divisible(x, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of `divisor`."""
    return math.ceil(x / divisor) * divisor


def check_img_size(imgsz, s: int = 32, floor: int = 0):
    """Verify image size is a multiple of the max stride `s` (per dimension)."""
    if isinstance(imgsz, int):
        new_size = max(make_divisible(imgsz, int(s)), floor)
    else:
        imgsz = list(imgsz)
        new_size = [max(make_divisible(x, int(s)), floor) for x in imgsz]
    if new_size != imgsz:
        LOGGER.warning(f"WARNING: --img-size {imgsz} must be multiple of max stride {s}, updating to {new_size}")
    return new_size


def init_seeds(seed: int = 0, deterministic: bool = False):
    """Seed host RNGs. Device-side randomness uses explicit jax PRNG keys."""
    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
    return seed


def yaml_load(file) -> dict:
    with open(file, errors="ignore") as f:
        return yaml.safe_load(f)


def yaml_save(file, data: dict):
    with open(file, "w") as f:
        yaml.safe_dump({k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}, f, sort_keys=False)


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... (reference utils/general.py:1094)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                break
        path = Path(p)
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Cosine ramp y1 -> y2 over `steps` (reference utils/general.py:683)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


class Profile(contextlib.ContextDecorator):
    """Accumulating wall-clock timer; call `.block(x)` on a jax array to include device time.

    Reference: utils/general.py:165-183 (which CUDA-synchronizes); on TPU we
    block on the output value instead of a global device sync.
    """

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.dt = time.time() - self.start
        self.t += self.dt

    @staticmethod
    def block(x):
        """Block until device computation producing x is done."""
        try:
            import jax
            jax.block_until_ready(x)
        except Exception:
            pass
        return x


def check_dataset(data, autodownload: bool = True, require_splits: bool = True) -> dict:
    """Load a dataset YAML and resolve train/val/test paths (reference utils/general.py:500).

    When the val split is missing and the YAML carries a `download:` hook,
    executes it (reference utils/general.py:537-561): a `bash ...` command
    line, an inline python snippet (run with the resolved dict bound as
    `yaml`), or an http zip URL — the last needs egress and raises a clear
    error in an offline image; the first two run locally either way.
    """
    if isinstance(data, (str, Path)):
        data = yaml_load(data)
    for k in ("train", "val", "test"):
        if k in data and data[k]:
            # val may be a list of paths (reference utils/general.py:527-535)
            vals = data[k] if isinstance(data[k], list) else [data[k]]
            resolved = [str(Path(data["path"]) / v) if data.get("path") else str(v) for v in vals]
            data[k] = resolved if isinstance(data[k], list) else resolved[0]
    if "names" in data and isinstance(data["names"], list):
        data["names"] = dict(enumerate(data["names"]))
    data.setdefault("nc", len(data.get("names", {})))

    val, hook = data.get("val"), data.get("download")
    val_paths = [Path(v) for v in (val if isinstance(val, list) else [val])] if val else []
    if require_splits and val_paths and not all(v.exists() for v in val_paths):
        missing = [str(v) for v in val_paths if not v.exists()]
        if not (hook and autodownload):
            raise FileNotFoundError(
                f"Dataset val path not found: {missing}"
                + ("" if hook else " (no download: hook in the data yaml)")
                + ("" if autodownload else " (autodownload disabled)"))
        # Trust boundary: the hook is arbitrary code from the data YAML — show it before running.
        LOGGER.warning(
            f"Dataset val path missing ({missing}); executing the data yaml's download hook "
            f"(pass autodownload=False / --no-download to refuse):\n{str(hook)[:500]}")
        t0 = time.time()
        if isinstance(hook, str) and hook.startswith("http"):
            from yolo_dual_tpu.utils.downloads import safe_download
            dest = Path(data.get("path") or ".") / Path(hook).name
            dest.parent.mkdir(parents=True, exist_ok=True)
            safe_download(hook, dest)
            if dest.suffix == ".zip":
                import zipfile
                zipfile.ZipFile(dest).extractall(dest.parent)
                dest.unlink()
        elif isinstance(hook, str) and hook.startswith("bash "):
            subprocess.run(hook, shell=True, check=True)
        else:  # inline python, with the resolved dict in scope like the reference
            exec(hook, {"yaml": data, "Path": Path})
        ok = all(v.exists() for v in val_paths)
        LOGGER.info(f"Dataset download hook {'succeeded' if ok else 'FAILED'} "
                    f"({time.time() - t0:.1f}s)")
        if not ok:
            raise FileNotFoundError(f"download hook ran but val path still missing: {data['val']}")
    return data


def labels_to_class_weights(labels, nc: int = 80) -> np.ndarray:
    """Inverse-frequency class weights from training labels (each element an
    (n, 5+) array of [cls, xywh...]); reference utils/general.py:714-731."""
    if len(labels) == 0 or labels[0] is None:
        return np.ones(nc, np.float32) / nc
    classes = np.concatenate([np.asarray(l)[:, 0] for l in labels], 0).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    return (weights / weights.sum()).astype(np.float32)


def labels_to_image_weights(labels, nc: int = 80, class_weights=None) -> np.ndarray:
    """Per-image sampling weights = sum of class weights over each image's
    instances (reference utils/general.py:733-738); used by --image-weights
    to resample the epoch's indices toward rare/low-mAP classes."""
    cw = np.ones(nc, np.float32) if class_weights is None else np.asarray(class_weights)
    counts = np.stack([np.bincount(np.asarray(l)[:, 0].astype(int), minlength=nc)
                       if len(l) else np.zeros(nc) for l in labels])
    return (cw.reshape(1, nc) * counts).sum(1)


def intersect_dicts(da: dict, db: dict, exclude=()):
    """Intersection of dicts with matching shapes, excluding keys containing `exclude` strings."""
    return {
        k: v for k, v in da.items()
        if k in db and all(x not in k for x in exclude) and tuple(np.shape(v)) == tuple(np.shape(db[k]))
    }


def platform_info() -> str:
    import jax
    return f"python {platform.python_version()} jax {jax.__version__} backend {jax.default_backend()} devices {jax.device_count()}"


def select_device(device: str = "") -> None:
    """Reference-CLI `--device` parity (reference utils/torch_utils.py:108
    select_device), mapped onto JAX's backend model: JAX owns placement, so
    ordinal strings ("0", "0,1") and "" keep the default accelerator backend,
    while "cpu" PINS jax_platforms to cpu via config.update — which wins over
    both the JAX_PLATFORMS env var and site hooks that force-register an
    accelerator plugin. That pin is load-bearing operationally: with a
    remote-TPU tunnel down, any backend touch otherwise blocks in the
    plugin's reconnect loop. Call before the first backend initialization."""
    if str(device).strip().lower() == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def clean_str(s: str) -> str:
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)
