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
    """1-D data-parallel mesh over the first n devices (default: all).

    If the default backend has fewer devices than requested but the CPU
    backend has enough (the `--xla_force_host_platform_device_count` testing
    setup, usable even when a TPU plugin owns the default backend), the mesh
    falls back to CPU devices."""
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devs = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dp: int, sp: int, axes=("data", "space")) -> Mesh:
    """2-D mesh: data-parallel × spatial-parallel. The 'space' axis shards
    activations along image height — XLA's SPMD partitioner inserts the conv
    halo exchanges automatically, so large-resolution models can split one
    image's FLOPs+HBM across chips (the sequence-parallel analog for dense
    vision; scaling-book §spatial partitioning). Device order keeps the
    'space' axis innermost so halo traffic rides adjacent ICI links."""
    need = dp * sp
    devs = jax.devices()
    if len(devs) < need:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= need:
                devs = cpu
        except RuntimeError:
            pass
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:need]).reshape(dp, sp), axes)


def batch_spec(mesh: Mesh, leaf_ndim: int, spatial_dims=(1,)) -> P:
    """PartitionSpec for a batch leaf: leading dim on 'data'; if the mesh has
    a 'space' axis, the first spatial dim (H for NHWC images / mask planes)
    shards over it."""
    if leaf_ndim < 1:
        return P()
    spec = [None] * leaf_ndim
    spec[0] = "data"
    if "space" in mesh.axis_names and leaf_ndim >= 3:
        for d in spatial_dims:
            if d < leaf_ndim:
                spec[d] = "space"
                break
    return P(*spec)


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


_SPATIAL_KEYS = ("image", "images", "mask", "masks")  # leaves whose dim 1 is H


def shard_batch(batch, mesh: Mesh, axis: str = "data", global_batch: bool = False):
    """Shard each leaf's leading (batch) dimension over the data axis; on a
    2-D mesh, image/mask planes (dim 1 = H) also shard over 'space'.
    Target tables etc. stay data-sharded only — their dim 1 is an instance
    index, not a spatial extent.

    global_batch: in a MULTI-PROCESS run, each host passes only ITS rows (what
    the Loader's process_index()-strided sharding yields) and the leaves are
    assembled into global arrays via make_array_from_process_local_data —
    jax.device_put would wrongly treat the local rows as the global batch."""
    spatial = "space" in mesh.axis_names
    multiproc = global_batch and jax.process_count() > 1

    def put(key, x):
        if spatial and key in _SPATIAL_KEYS and np.ndim(x) >= 3:
            spec = batch_spec(mesh, np.ndim(x))
        else:
            spec = P(axis) if np.ndim(x) >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    if isinstance(batch, dict):
        return {k: put(k, v) for k, v in batch.items()}
    return jax.tree_util.tree_map(lambda x: put("", x), batch)


def cross_replica_mean(tree, axis: str = "data"):
    """Explicit pmean for shard_map-style code paths (SyncBN primitive)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up: jax.distributed.initialize with env-var defaults
    (the analog of the reference's dist.init_process_group,
    classify/train.py:313 — but one JAX process per HOST, not per chip).

    On single-host runs this is a no-op. After it, make_mesh() spans all
    hosts' devices; data loading shards by jax.process_index() automatically
    (data/loader.py)."""
    import os
    if num_processes is None and "JAX_NUM_PROCESSES" not in os.environ \
            and coordinator_address is None:
        return False  # single host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)
    return True


def sync_hosts(name: str = "barrier"):
    """Cross-host barrier (the reference's torch_distributed_zero_first /
    dist.barrier analog, utils/torch_utils.py:89-95)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
