"""Input pipeline: scene-block sampling + threaded prefetching batcher.

The reference feeds its samplers with a torch DataLoader driven by a custom
``MySampler`` that emits contiguous blocks of ``actualBatchSize`` indices in
shuffled scene order so every batch holds complete scenes
(ncsn_runner_kitti_simultaneous.py:54-74).  We reproduce that contract with
a plain-numpy pipeline: a block sampler, a thread pool running the numpy
projection work, and double-buffered prefetch so host projection overlaps
device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class SceneBlockSampler:
    """Yields dataset indices in contiguous view-blocks, scenes shuffled."""

    def __init__(self, num_scenes: int, views_per_scene: int, shuffle: bool = True, seed: int = 0):
        self.num_scenes = num_scenes
        self.views = views_per_scene
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.num_scenes)
        if self.shuffle:
            self._rng.shuffle(order)
        for scene in order:
            for v in range(self.views):
                yield int(scene) * self.views + v

    def __len__(self):
        return self.num_scenes * self.views


def collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        out[key] = np.stack([np.asarray(it[key]) for it in items])
    return out


class BatchLoader:
    """Iterable of stacked-dict batches with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler=None,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        shuffle: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        if sampler is None:
            self._indices = lambda: iter(
                np.random.default_rng(seed).permutation(len(dataset))
                if shuffle
                else range(len(dataset))
            )
        else:
            self._indices = lambda: iter(sampler)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error = []

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    batch = []
                    for idx in self._indices():
                        if stop.is_set():
                            return
                        batch.append(idx)
                        if len(batch) == self.batch_size:
                            items = list(pool.map(self.dataset.__getitem__, batch))
                            q.put(collate(items))
                            batch = []
                    if batch and not self.drop_last:
                        items = list(pool.map(self.dataset.__getitem__, batch))
                        q.put(collate(items))
            except BaseException as exc:  # propagate to the consumer
                error.append(exc)
            finally:
                q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
        if error:
            raise error[0]

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        return n
