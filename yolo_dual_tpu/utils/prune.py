"""Model pruning utilities.

Capability parity with reference utils/torch_utils.py prune() (L1-unstructured
per-conv pruning to a target global sparsity), done functionally: instead of
mutating modules, returns a new params pytree with the smallest-|w| entries of
every conv kernel zeroed. On TPU the win is model-size/compression (XLA does
not skip zeros), matching how the reference uses it (sparsity experiments).
"""

from __future__ import annotations

import jax
import numpy as np

from yolo_dual_tpu.utils.general import LOGGER


def _is_conv_kernel(path) -> bool:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    return bool(names) and names[-1] == "kernel"


def prune(params, amount: float = 0.3):
    """Zero the smallest-magnitude `amount` fraction of every conv/dense
    kernel (L1 unstructured, per-tensor threshold like torch's
    prune.l1_unstructured). Returns (pruned_params, global_sparsity)."""
    zeroed = 0
    total = 0

    def prune_leaf(path, w):
        nonlocal zeroed, total
        arr = np.asarray(w)
        total += arr.size
        if not _is_conv_kernel(path) or arr.ndim < 2:
            return w
        k = int(arr.size * amount)
        if k <= 0:
            return w
        thresh = np.partition(np.abs(arr).ravel(), k - 1)[k - 1]
        mask = np.abs(arr) > thresh
        zeroed += int((~mask).sum())
        return (arr * mask).astype(arr.dtype)

    pruned = jax.tree_util.tree_map_with_path(prune_leaf, params)
    sparsity = zeroed / max(total, 1)
    LOGGER.info(f"pruned model to {sparsity:.3f} global sparsity "
                f"({zeroed:,}/{total:,} weights zeroed)")
    return pruned, sparsity


def sparsity(params) -> float:
    """Global fraction of exactly-zero weights (reference torch_utils.py:sparsity)."""
    zeros = sum(int((np.asarray(w) == 0).sum()) for w in jax.tree_util.tree_leaves(params))
    total = sum(int(np.asarray(w).size) for w in jax.tree_util.tree_leaves(params))
    return zeros / max(total, 1)
