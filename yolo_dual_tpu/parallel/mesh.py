"""Device mesh + sharding helpers: the framework's scale-out layer.

The reference scales with torch DDP/DataParallel over NCCL (reference
classify/train.py:313, utils/torch_utils.py:55-63); the TPU-native
equivalent is a 1-D data mesh with the batch sharded over it. Under jit,
XLA emits the gradient all-reduces over ICI automatically — there is no
NCCL-analog code to write. SyncBN (reference --sync-bn,
segment/train.py:466-467) falls out for free: batch statistics computed on a
batch sharded over 'data' are global means.

Multi-host: call jax.distributed.initialize() before make_mesh(); device
order puts ICI-adjacent devices together so the data axis rides ICI before
DCN (the standard mesh layout recipe).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard each leaf's leading (batch) dimension over the data axis."""
    def put(x):
        spec = P(axis) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def cross_replica_mean(tree, axis: str = "data"):
    """Explicit pmean for shard_map-style code paths (SyncBN primitive)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)
