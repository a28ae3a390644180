"""Input pipeline: sharded sampling, threaded decode, device prefetch.

Replaces the reference's DataLoader(worker procs) + DistributedSampler +
CPU/CUDA prefetcher stack (HOGformer settingI/basicsr/data/{data_sampler.py,
prefetch_dataloader.py}) with:

* deterministic per-host index sharding (``jax.process_index()`` strides,
  the EnlargedSampler analog — oversampling already lives in the datasets)
* a thread pool for PIL decode + crop (no fork, no pickling)
* double-buffered async ``device_put`` so H2D rides ahead of compute
  (the CUDAPrefetcher analog; on TPU the transfer engine overlaps free)
* on-device degradation synthesis hook (see data/degradations.degrade_batch)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import numpy as np


def _collate(samples) -> dict:
    out = {}
    for k in samples[0]:
        if k == "name":
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


class Loader:
    """Epoch-based loader with shuffling, per-host sharding and threaded decode."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, num_threads: int = 8,
                 process_index: int | None = None, process_count: int | None = None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pool = ThreadPoolExecutor(num_threads)
        self.pidx = jax.process_index() if process_index is None else process_index
        self.pcount = jax.process_count() if process_count is None else process_count

    def __len__(self):
        n = len(self.ds) // self.pcount
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        order = order[self.pidx::self.pcount]  # per-host shard
        nb = len(order) // self.bs if self.drop_last else -(-len(order) // self.bs)
        for b in range(nb):
            idxs = order[b * self.bs : (b + 1) * self.bs]
            samples = list(self.pool.map(self.ds.__getitem__, idxs))
            yield _collate(samples)


class DevicePrefetcher:
    """Background thread that keeps ``depth`` batches in flight on device."""

    def __init__(self, iterator, put_fn, depth: int = 2):
        self.it = iterator
        self.put = put_fn
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.t = threading.Thread(target=self._work, daemon=True)
        self.t.start()

    def _work(self):
        try:
            for batch in self.it:
                self.q.put(self.put(batch))
        finally:
            self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


def make_train_iterator(loader: Loader, mesh=None, epochs: int = 10**9,
                        start_epoch: int = 0, prefetch: int = 2,
                        transform=None, start_step: int = 0):
    """Infinite (or bounded) stream of device-resident batches.

    ``transform(step, arrays) -> arrays`` runs host-side in the prefetch
    thread before device_put — the hook for the progressive patch/batch
    schedule (train/progressive.py), which must reshape numpy batches
    before they are sharded. ``step`` counts consumed batches from
    ``start_step`` (resume-correct as long as consumption is sequential).
    """
    from image_restoration_tpu.train.trainer import shard_batch

    def put(batch):
        arrays = {k: v for k, v in batch.items() if k != "name"}
        if mesh is not None:
            return shard_batch(arrays, mesh)
        return jax.tree.map(jax.numpy.asarray, arrays)

    def gen():
        step = start_step
        for e in range(start_epoch, epochs):
            for batch in loader.epoch(e):
                if transform is not None:
                    batch = transform(step, batch)
                step += 1
                yield batch

    return iter(DevicePrefetcher(gen(), put, prefetch))
