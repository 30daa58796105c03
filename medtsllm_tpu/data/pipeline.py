"""Fixed-shape batch pipeline.

TPU-first replacement for the reference's torch DataLoader stack
(tasks/base.py:162-198): every batch has identical shapes (batch dim padded
to `batch_size`, with a `valid` mask), so one compiled XLA graph serves the
whole epoch — no recompilation, no dynamic shapes. String fields
(descriptions, examples) stay on host as python lists; trainers/models
tokenize them outside the jit graph.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

ARRAY_KEYS = ("x_enc", "y", "labels")


class BatchPipeline:
    """Iterates a dataset in fixed-shape numpy batches.

    Yields dicts with:
      x_enc [B, L, C] float32, y?/labels? arrays,
      index [B] int32 global window indices (for eval stitching),
      valid [B] bool (False on padding rows of the final batch),
      descriptions?: list[str], examples?: list
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    @property
    def n_samples(self) -> int:
        return len(self.dataset)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __iter__(self):
        order = self._order()
        self._epoch += 1
        B = self.batch_size
        n = len(order)
        stop = (n // B) * B if self.drop_last else n
        for i in range(0, stop, B):
            chunk = order[i:i + B]
            n_valid = len(chunk)
            if n_valid < B:  # pad final batch to fixed shape
                chunk = np.concatenate([chunk, np.repeat(chunk[-1], B - n_valid)])
            yield self._collate(chunk, n_valid)

    def _collate(self, indices: np.ndarray, n_valid: int) -> dict:
        items = [self.dataset[int(j)] for j in indices]
        batch: dict = {}
        for k in items[0]:
            if k in ARRAY_KEYS:
                batch[k] = np.stack([it[k] for it in items])
            else:
                batch[k] = [it[k] for it in items]
        batch["index"] = indices.astype(np.int32)
        valid = np.zeros(len(indices), dtype=bool)
        valid[:n_valid] = True
        batch["valid"] = valid
        return batch


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch so host batch assembly overlaps device
    compute (the reference relied on DataLoader worker processes).

    Producer exceptions re-raise in the consumer (a dead producer must
    not look like a clean end-of-epoch), and an early-exiting consumer
    unblocks the producer (generator close/GC sets the stop event) so
    the thread and its buffered batches don't leak."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()
    error: list[BaseException] = []

    def producer():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:
            error.append(e)
        finally:
            while not stop.is_set():  # consumer gone -> stop set ends us
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        if error:
            raise error[0]
    finally:
        stop.set()
