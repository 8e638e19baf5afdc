"""Checkpoint save/load + torch-compatible export.

Capability parity with the reference's checkpoint semantics (reference
segment/train.py:574-577 / seg_diceloss_Resnet50.py:1193-1200: save
{'model': ema, 'optimizer', 'epoch', 'best_fitness'} as last.pt/best.pt;
utils/general.py:1004-1018 strip_optimizer; utils/torch_utils.py:361-378
smart_resume) — using Orbax for the native format and a torch-state-dict
export for interchange with the reference ecosystem."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path, state_dict: dict):
    """Save a pytree checkpoint (params/ema/opt_state/epoch/best_fitness...)."""
    path = Path(path).resolve()
    if path.exists():
        if path.is_dir():
            import shutil
            shutil.rmtree(path)
        else:  # stray regular file at the target path — overwrite cleanly
            path.unlink()
    _checkpointer().save(path, state_dict)
    return path


def load_checkpoint(path, target=None):
    """Restore a checkpoint. With `target` (a template pytree of the same
    structure), orbax restores into the template's CONTAINER types — without
    it, optax states (MultiStepsState etc.) come back as plain dicts and
    `tx.update` crashes on attribute access after a resume."""
    if target is not None:
        return _checkpointer().restore(Path(path).resolve(), item=target)
    return _checkpointer().restore(Path(path).resolve())


def partial_load(variables: dict, path) -> dict:
    """Load shape-matching leaves from a checkpoint into `variables`
    (reference intersect_dicts partial pretrained load,
    seg_diceloss_Resnet50.py:978-984). Prefers the checkpoint's EMA weights
    when present. Returns the updated pytree; logs hit count."""
    import jax.tree_util as jtu
    ckpt = load_checkpoint(path)
    src = ckpt.get("variables", ckpt)
    if isinstance(ckpt, dict) and ckpt.get("ema"):
        src = ckpt["ema"].get("ema", src)
    flat_src = dict(jtu.tree_flatten_with_path(src)[0])
    n_hit = [0]

    def take(p, leaf):
        s = flat_src.get(p)
        if s is not None and np.shape(s) == np.shape(leaf):
            n_hit[0] += 1
            return np.asarray(s)
        return leaf

    total = len(jtu.tree_leaves(variables))
    out = jtu.tree_map_with_path(take, variables)
    LOGGER.info(f"loaded {n_hit[0]}/{total} leaves from {path}")
    return out


def strip_optimizer(path, out: Optional[str] = None):
    """Drop optimizer state + swap params for EMA in a saved checkpoint
    (reference utils/general.py:1004-1018)."""
    ckpt = load_checkpoint(path)
    if ckpt.get("ema") is not None:
        ckpt["variables"] = ckpt["ema"]["ema"] if "ema" in ckpt["ema"] else ckpt["ema"]
    for k in ("opt_state", "ema"):
        ckpt[k] = None
    ckpt["epoch"] = -1
    save_checkpoint(out or path, ckpt)
    LOGGER.info(f"Optimizer stripped from {path}")


# ---------------------------------------------------------------------------
# Torch-compatible state_dict export (inverse of io/torch_import.py)
# ---------------------------------------------------------------------------

def export_torch_state_dict(variables: dict, spec=None) -> dict:
    """Flax variables -> reference-style torch state_dict names/layouts so
    users can carry weights back to the PyTorch ecosystem."""
    head_index = -1
    head_is_segment = False
    if spec is not None:
        head = spec.layers[-1]
        head_index = head.i
        head_is_segment = head.name == "Segment"

    def walk(tree, path):
        flat = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                flat.update(walk(v, path + [k]))
            else:
                flat[tuple(path + [k])] = np.asarray(v)
        return flat

    out = {}
    for coll in ("params", "batch_stats"):
        for path, v in walk(variables.get(coll, {}), []).items():
            segs = list(path)
            # model_{i}(_{r}) root
            m = re.fullmatch(r"model_(\d+)(?:_(\d+))?", segs[0])
            if m:
                segs[0] = f"model.{m.group(1)}" + (f".{m.group(2)}" if m.group(2) else "")
            if head_is_segment and m and int(m.group(1)) == head_index and len(segs) > 1 and segs[1] == "detect":
                segs.pop(1)
            new = []
            for s in segs[:-1]:
                mm = re.fullmatch(r"(m|tr)_(\d+)", s)
                bb = re.fullmatch(r"block(\d+)", s)
                if mm:
                    new.append(f"{mm.group(1)}.{mm.group(2)}")
                elif bb:
                    new.append(f"layer.{bb.group(1)}")
                else:
                    new.append(s)
            leaf = segs[-1]
            if coll == "batch_stats":
                leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
            elif leaf == "kernel":
                leaf = "weight"
                if v.ndim == 4:
                    v = v.transpose(3, 2, 0, 1)
                elif v.ndim == 2:
                    v = v.T
            elif leaf == "scale":
                leaf = "weight"
            out[".".join(new + [leaf])] = v
    return out
