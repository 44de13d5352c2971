"""Host data loading: sharded iteration sampling, threaded decode, prefetch.

Replaces the reference's DataLoader-worker pipeline (``codes/data/
__init__.py`` + ``data_sampler.py``):
  * ``IterationSampler`` — the DistIterSampler semantics (dataset virtually
    enlarged xratio, epoch-seeded permutation, process-strided subsample;
    data_sampler.py:46-59),
  * ``TrainLoader`` — thread-pooled __getitem__ calls with a bounded
    prefetch queue and per-(epoch, index) deterministic RNG (the reference
    relies on per-worker global RNG; explicit seeding replaces that),
  * per-process batch = global batch // process_count (data/__init__.py:
    13-14); the mesh further shards each batch over local devices.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals, axis=0)
        else:
            out[k] = vals
    return out


class IterationSampler:
    """Epoch-seeded, process-strided index stream over an enlarged dataset."""

    def __init__(self, dataset_size: int, num_replicas: int = 1, rank: int = 0,
                 ratio: int = 100):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        total = dataset_size * ratio
        self.num_samples = int(np.ceil(total / num_replicas))
        self.total_size = self.num_samples * num_replicas

    def indices(self, epoch: int) -> np.ndarray:
        g = np.random.default_rng(epoch)
        idx = g.permutation(self.total_size) % self.dataset_size
        return idx[self.rank:self.total_size:self.num_replicas]


class TrainLoader:
    """Iterator over device-ready host batches."""

    def __init__(self, dataset, batch_size: int, num_replicas: int = 1,
                 rank: int = 0, ratio: int = 200, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0):
        assert batch_size % num_replicas == 0, (
            "global batch size must divide the number of processes")
        self.dataset = dataset
        self.batch_size = batch_size // num_replicas
        self.sampler = IterationSampler(len(dataset), num_replicas, rank, ratio)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed

    def __len__(self) -> int:
        return self.sampler.num_samples // self.batch_size

    def epoch_iter(self, epoch: int) -> Iterator[dict]:
        indices = self.sampler.indices(epoch)
        n_batches = len(indices) // self.batch_size
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def fetch_sample(args):
            pos, idx = args
            rng = np.random.default_rng((self.seed, epoch, int(pos)))
            if hasattr(self.dataset, "get"):
                return self.dataset.get(int(idx), rng)
            return self.dataset[int(idx)]

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        chunk = indices[b * self.batch_size:
                                        (b + 1) * self.batch_size]
                        args = [(b * self.batch_size + i, ix)
                                for i, ix in enumerate(chunk)]
                        samples = list(pool.map(fetch_sample, args))
                        q.put(collate(samples))
            except RuntimeError:
                # interpreter shutdown while prefetching (the consumer
                # finished training mid-epoch): exit quietly — this
                # daemon thread's pool is torn down under it
                return
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class EvalLoader:
    """Sequential batch-1 loader for validation/test datasets."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            item = self.dataset[i]
            yield {
                k: (v[None] if isinstance(v, np.ndarray) else [v])
                for k, v in item.items()
            }
