"""Batched host pipeline feeding the device.

The reference runs batch-1 DataLoader iterations with per-image H2D copies
(robust_test.py:104-124). Here: map-style datasets are batched, padded to a
fixed batch (static shapes for jit), and decode/stack work is overlapped
with device compute by a background prefetch thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np


def pad_to_batch(batch: Dict[str, np.ndarray], batch_size: int) -> Dict[str, np.ndarray]:
    """Pad a possibly-short batch to `batch_size` by repeating the last item;
    adds a 'valid' (B,) bool mask so metrics can ignore the padding."""
    n = len(batch["name"]) if "name" in batch else next(iter(batch.values())).shape[0]
    valid = np.zeros((batch_size,), dtype=bool)
    valid[:n] = True
    out = {}
    for k, v in batch.items():
        if k == "name":
            out[k] = list(v) + [v[-1]] * (batch_size - n)
            continue
        if v.shape[0] < batch_size:
            pad = np.repeat(v[-1:], batch_size - v.shape[0], axis=0)
            v = np.concatenate([v, pad], axis=0)
        out[k] = v
    out["valid"] = valid
    return out


def batch_iterator(
    dataset,
    batch_size: int,
    keys: Sequence[str] = ("vis", "ir", "label", "name"),
    drop_last: bool = False,
    indices: Sequence[int] | None = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield padded, stacked batches from a map-style (vis, ir, label, name)
    dataset. Static batch shape -> one XLA compilation."""
    idxs = list(indices) if indices is not None else list(range(len(dataset)))
    for start in range(0, len(idxs), batch_size):
        chunk = idxs[start : start + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        items = [dataset[i] for i in chunk]
        cols: Dict[str, List] = {k: [it[j] for it in items] for j, k in enumerate(keys)}
        batch = {}
        for k, vs in cols.items():
            batch[k] = vs if k == "name" else np.stack(vs)
        yield pad_to_batch(batch, batch_size)


def device_prefetch(iterator, put, depth: int = 2):
    """Keep `depth` batches in flight on device: `put` maps a host batch to
    device arrays; transfers overlap the consumer's compute (the TPU
    equivalent of DataLoader pin_memory + async H2D)."""
    import collections

    queue = collections.deque()
    for item in iterator:
        queue.append(put(item))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class PrefetchLoader:
    """Wrap an iterator factory with a daemon thread + bounded queue so host
    decoding overlaps device compute (the TPU equivalent of DataLoader
    workers)."""

    def __init__(self, make_iterator, prefetch: int = 2):
        self._make = make_iterator
        self._prefetch = prefetch

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        sentinel = object()
        err: List[BaseException] = []

        def worker():
            try:
                for item in self._make():
                    q.put(item)
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
