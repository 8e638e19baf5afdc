"""PyTorch weight import: reference state_dicts -> our flax variable trees.

Capability parity with reference attempt_load / intersect_dicts loading
(models/experimental.py:71-111, utils/general.py:255-258), plus the layout
translation a TPU port needs:

- conv weights OIHW -> HWIO; linear (out,in) -> (in,out)
- BatchNorm weight/bias -> params.bn.{scale,bias}; running stats -> batch_stats
- torch module paths (model.{i}.cv1.conv.weight, sequential model.{i}.{r}.*)
  -> our flax paths (model_{i}.cv1.conv.kernel, model_{i}_{r}.*)
- Segment heads: torch keeps Detect's conv list at the Segment level
  (models/yolo.py:99); ours nests it under 'detect'
- semantic graph models: torch 'backbone.{i}' / 'head.{j}' roots -> model_{i} /
  model_{nb+j}; ResNet layer blocks 'layer.{k}' -> 'block{k}'
- torch MultiheadAttention joint in_proj -> split in_q/in_k/in_v

Import is strict by default: every target leaf must be filled with a
shape-matching tensor, and leftover source keys are reported.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from yolo_dual_tpu.utils.general import LOGGER

SKIP_SUFFIXES = ("num_batches_tracked", "anchors", "anchor_grid", "stride")


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree



def translate_torch_key(key: str, n_backbone: int = 0, head_index: int = -1,
                        head_is_segment: bool = False):
    """Translate one torch state_dict key into (collection, flax path tuple,
    transform) or None to skip.

    transform: 'conv' (OIHW->HWIO), 'linear' (T), 'none'.
    """
    if key.endswith(SKIP_SUFFIXES):
        return None
    parts = key.split(".")

    # Root renaming -------------------------------------------------------
    if parts[0] == "model":
        idx = int(parts[1])
        rest = parts[2:]
        # sequential repeats: model.{i}.{r}.xxx (torch wraps repeats in nn.Sequential)
        if rest and rest[0].isdigit():
            root = f"model_{idx}_{rest[0]}"
            rest = rest[1:]
        else:
            root = f"model_{idx}"
        if head_is_segment and idx == head_index and rest and rest[0] == "m":
            rest = ["detect"] + rest
    elif parts[0] in ("backbone", "head"):
        idx = int(parts[1])
        if parts[0] == "head":
            idx += n_backbone
        root = f"model_{idx}"
        rest = parts[2:]
    else:
        root = parts[0]
        rest = parts[1:]

    # Path segment translation -------------------------------------------
    segs = [root]
    i = 0
    while i < len(rest) - 1:
        s = rest[i]
        nxt = rest[i + 1] if i + 1 < len(rest) else ""
        if s in ("m", "tr") and nxt.isdigit():
            segs.append(f"{s}_{nxt}")
            i += 2
            continue
        if s == "layer" and nxt.isdigit():  # ResNetLayer blocks
            segs.append(f"block{nxt}")
            i += 2
            continue
        if s == "stem" and nxt == "0":  # ResNetStem: stem.0 = Conv, stem.1 = pool
            segs.append("conv")
            i += 2
            continue
        if s == "block" and nxt.isdigit():  # VGGBlock sequential: convs then pool
            segs.append(f"conv{nxt}")
            i += 2
            continue
        if s == "conv" and nxt.isdigit():  # Focus wraps Conv as .conv
            segs.append("conv")
            i += 1
            continue
        segs.append(s)
        i += 1
    leaf = rest[-1] if rest else parts[-1]

    # Leaf translation ----------------------------------------------------
    # Determine whether parent is a BatchNorm by the torch leaf names
    if leaf == "running_mean":
        return ("batch_stats", tuple(segs + ["mean"]), "none")
    if leaf == "running_var":
        return ("batch_stats", tuple(segs + ["var"]), "none")
    if segs and segs[-1] == "bn":
        if leaf == "weight":
            return ("params", tuple(segs + ["scale"]), "none")
        if leaf == "bias":
            return ("params", tuple(segs + ["bias"]), "none")
    if leaf == "weight":
        return ("params", tuple(segs + ["kernel"]), "auto")
    if leaf == "bias":
        return ("params", tuple(segs + ["bias"]), "none")
    return ("params", tuple(segs + [leaf]), "none")


def import_torch_state_dict(variables: dict, state_dict: dict, spec=None,
                            strict: bool = True, verbose: bool = False) -> dict:
    """Fill a flax variables tree with tensors from a torch state_dict.

    variables: {'params': ..., 'batch_stats': ...} (from model.init).
    state_dict: torch name -> tensor (torch.Tensor or np.ndarray).
    spec: optional ModelSpec for head/semantic layout hints.
    """
    n_backbone = 0
    head_index = -1
    head_is_segment = False
    if spec is not None:
        head = spec.layers[-1]
        head_index = head.i
        head_is_segment = head.name == "Segment"
        # reference semantic checkpoints root at backbone.{i}/head.{j}
        # (reference seg_jaccardloss_Resnet50.py:355-356); head.{j} maps to
        # our model_{n_backbone + j}
        n_backbone = getattr(spec, "n_backbone", 0)

    flat_vars = {c: _flatten(variables[c]) for c in variables}
    filled = {c: set() for c in variables}
    out = {c: dict(flat_vars[c]) for c in variables}
    unmatched = []

    # torch MultiheadAttention joint projections need splitting
    pending_mha = {}

    for key, val in state_dict.items():
        v = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        m = re.search(r"(.*)\bma\.(in_proj_weight|in_proj_bias|out_proj\.weight|out_proj\.bias)$", key)
        if m:
            pending_mha.setdefault(m.group(1), {})[m.group(2)] = (key, v)
            continue
        t = translate_torch_key(key, n_backbone, head_index, head_is_segment)
        if t is None:
            continue
        coll, path, tf = t
        if coll not in flat_vars or path not in flat_vars[coll]:
            # duplicate downsample registration in the reference's ResNet layers
            if ".downsample." in key and not key.startswith("layer"):
                continue
            unmatched.append(key)
            continue
        tgt_shape = np.shape(flat_vars[coll][path])
        if tf == "auto":
            if v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif v.ndim == 2:
                v = v.T
        if v.shape != tuple(tgt_shape):
            unmatched.append(f"{key} (shape {v.shape} vs {tuple(tgt_shape)})")
            continue
        out[coll][path] = v.astype(np.asarray(flat_vars[coll][path]).dtype)
        filled[coll].add(path)

    # Resolve MHA joint projections
    for prefix, items in pending_mha.items():
        base = translate_torch_key(prefix + "ma.out_proj.weight", n_backbone, head_index, head_is_segment)
        parent = base[1][:-2]  # strip ('out_proj', 'kernel')
        if "in_proj_weight" in items:
            w = items["in_proj_weight"][1]
            c = w.shape[0] // 3
            for name, chunk in zip(("in_q", "in_k", "in_v"), (w[:c], w[c:2 * c], w[2 * c:])):
                path = parent + (name, "kernel")
                out["params"][path] = chunk.T.astype(np.float32)
                filled["params"].add(path)
        if "in_proj_bias" in items:
            b = items["in_proj_bias"][1]
            c = b.shape[0] // 3
            for name, chunk in zip(("in_q", "in_k", "in_v"), (b[:c], b[c:2 * c], b[2 * c:])):
                path = parent + (name, "bias")
                out["params"][path] = chunk.astype(np.float32)
                filled["params"].add(path)
        if "out_proj.weight" in items:
            path = parent + ("out_proj", "kernel")
            out["params"][path] = items["out_proj.weight"][1].T.astype(np.float32)
            filled["params"].add(path)
        if "out_proj.bias" in items:
            path = parent + ("out_proj", "bias")
            out["params"][path] = items["out_proj.bias"][1].astype(np.float32)
            filled["params"].add(path)

    missing = {c: [p for p in flat_vars[c] if p not in filled[c]] for c in variables}
    n_missing = sum(len(v) for v in missing.values())
    if verbose or unmatched or n_missing:
        LOGGER.info(
            f"torch import: filled {sum(len(s) for s in filled.values())} leaves, "
            f"{n_missing} missing, {len(unmatched)} unmatched source keys"
        )
    if strict and (unmatched or n_missing):
        detail = []
        for c, ps in missing.items():
            detail += [f"missing {c}:{'/'.join(p)}" for p in ps[:10]]
        detail += [f"unmatched {k}" for k in unmatched[:10]]
        raise ValueError("strict torch import failed:\n  " + "\n  ".join(detail))
    if sum(len(s) for s in filled.values()) == 0 and state_dict:
        # even non-strict (partial) loading must not hand back an entirely
        # random model: a checkpoint that matches NOTHING is a wrong file or
        # an unrecognized layout, never an intended partial load
        raise ValueError(
            "torch import matched 0 leaves — the checkpoint layout does not "
            f"correspond to this model (first source keys: "
            f"{list(state_dict)[:5]})")
    return {c: _unflatten(out[c]) for c in out}


def load_torch_checkpoint(path, reference_root=None):
    """Load a reference .pt checkpoint into a plain {name: ndarray} state_dict.

    Reference checkpoints pickle whole nn.Modules ({'model': ema.ema, ...},
    reference seg_diceloss_Resnet50.py:1193-1200), so unpickling needs the
    reference source tree on sys.path — pass `reference_root` for that.
    """
    import sys
    import torch
    if reference_root is not None and str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt
    if isinstance(ckpt, dict):
        # container conventions: reference {'model': module} / {'ema': module}
        # (seg_diceloss_Resnet50.py:1193-1200), plus the common torch
        # 'state_dict' / 'model_state_dict' wrappers; else a raw state_dict
        for key in ("ema", "model", "model_state_dict", "state_dict"):
            if ckpt.get(key) is not None:
                model = ckpt[key]
                break
    if hasattr(model, "state_dict"):
        model = model.float()
        sd = model.state_dict()
    elif isinstance(model, dict):
        sd = model
    else:
        raise TypeError(f"unsupported checkpoint payload {type(model)}")
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}
