"""Host -> device batch loader with background prefetch + per-host sharding.

The reference uses torch DataLoader worker processes + InfiniteDataLoader
(reference utils/dataloaders.py:103-186) and DistributedSampler under DDP
(:140). The TPU-native equivalent: a thread-prefetched host loader whose
per-host index shard replaces DistributedSampler (jax.process_index()), with
uint8 transfer and on-device normalization so the input pipeline stays off
the critical path.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

import jax


class Loader:
    """Batches a map-style dataset into stacked numpy dicts.

    - deterministic per-epoch shuffling (set_epoch, reference seed_worker
      determinism utils/dataloaders.py:96-100)
    - shards indices across jax processes (multi-host data parallelism)
    - background thread prefetch (depth `prefetch`) overlapping host decode
      with device compute
    """

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, prefetch: Optional[int] = 2,
                 num_shards: Optional[int] = None, shard_index: Optional[int] = None,
                 collate=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        if prefetch and (os.cpu_count() or 1) < 2:
            # On a single-core host the prefetch thread cannot overlap
            # anything — it just fights the consumer for the GIL over the
            # big batch np.stack memcpys (measured r4: device-aug drain
            # 32.5 -> 11.1 img/s WITH the thread). Multi-core hosts keep it.
            prefetch = 0
        self.prefetch = prefetch
        self.epoch = 0
        self.num_shards = num_shards if num_shards is not None else jax.process_count()
        self.shard_index = shard_index if shard_index is not None else jax.process_index()
        # optional sample-list transform applied before stacking (the
        # reference's collate_fn4 quad batching, utils/dataloaders.py); may
        # change the number of samples per batch (e.g. 4 -> 1 at 2x size)
        self.collate = collate
        # optional per-sample weights: when set (and shuffling), each epoch
        # draws len(dataset) indices WITH replacement ∝ weights — the
        # reference's --image-weights resampling (segment/train.py:496-500)
        self.sample_weights = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        if self.sample_weights is not None and self.shuffle:
            w = list(self.sample_weights)
            if sum(w) <= 0:
                # all-zero weights (e.g. --image-weights on a label-free set):
                # random.choices would raise; fall back to uniform sampling
                w = [1.0] * n
            idx = random.Random(self.seed + self.epoch).choices(
                range(n), weights=w, k=n)
        else:
            idx = list(range(n))
            if self.shuffle:
                random.Random(self.seed + self.epoch).shuffle(idx)
        idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self):
        return sum(1 for _ in self._chunks())

    def _chunks(self):
        """Batch index chunks; with aspect buckets, batches never straddle a
        bucket boundary (each bucket has its own static shape)."""
        idx = self._indices()
        bs = self.batch_size
        bucket_of = getattr(self.dataset, "bucket_of", None)
        groups = [idx]
        if bucket_of is not None:
            by_bucket = {}
            for i in idx:
                by_bucket.setdefault(int(bucket_of[i]), []).append(i)
            groups = [by_bucket[b] for b in sorted(by_bucket)]
        for g in groups:
            stop = len(g) - (len(g) % bs) if self.drop_last else len(g)
            for s in range(0, stop, bs):
                chunk = g[s:s + bs]
                if self.drop_last and len(chunk) < bs:
                    break
                yield chunk

    def _batches(self):
        bs = self.batch_size
        for chunk in self._chunks():
            samples = [self.dataset[i] for i in chunk]
            if len(chunk) < bs:  # pad final batch to static shape, mark count
                samples += [samples[-1]] * (bs - len(chunk))
            n_valid = len(chunk)
            if self.collate is not None:
                samples = self.collate(samples)
                if not samples:
                    raise ValueError(
                        f"collate fn returned no samples for a chunk of {bs}; "
                        f"quad collate needs batch_size to be a multiple of 4")
                factor = max(1, bs // max(1, len(samples)))
                # a collated group counts as valid iff it contains >=1 real
                # (non-pad) sample; a final quad may also mix in pad
                # duplicates — same spirit as the reference's smaller tail
                # batch, kept at static shape here
                n_valid = min(len(samples), -(-n_valid // factor))
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            batch["n_valid"] = np.int32(n_valid)
            yield batch

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except Exception as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is sentinel:
                break
            yield b
        t.join()
        if err:
            raise err[0]


def normalize_image(x):
    """uint8 (b,h,w,3) -> float32 0..1; call INSIDE jit so the divide fuses
    into the first conv (the reference's /255 H2D step, segment/train.py:509)."""
    import jax.numpy as jnp
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x
