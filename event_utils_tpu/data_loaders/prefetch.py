"""Batching loader with double-buffered host->device prefetch.

The TPU replacement for the reference's torch ``DataLoader`` usage: a
background thread assembles (and optionally pads) batches while the device
computes, and ``device_prefetch`` keeps ``prefetch_depth`` batches resident
on the accelerator (``jax.device_put`` ahead of use) so the input pipeline
overlaps with compute — the role the reference delegates to torch workers
(README.md:125 notes HDF5 breaks under those; memmap datasets here are
thread-safe by construction).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class EventDataLoader:
    """Iterate a sequence-protocol dataset in (optionally shuffled) batches.

    @param dataset Any object with ``__len__`` / ``__getitem__`` returning
        item dicts (e.g. ``DynamicH5Dataset``).
    @param batch_size Items per batch.
    @param shuffle Shuffle item order each epoch (seeded via ``rng``).
    @param collate_fn Batch assembly; defaults to the dataset's
        ``collate_padded`` when present (static shapes) else ``collate_fn``.
    @param num_workers 0 = synchronous; 1 = one background producer thread;
        >1 = producer plus a pool of that many item-fetch threads
        (h5py/np.load release the GIL, so fetches genuinely overlap).
    @param drop_last Drop the final partial batch.
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 collate_fn: Optional[Callable] = None, num_workers: int = 0,
                 drop_last: bool = False,
                 rng: Optional[np.random.Generator] = None,
                 queue_depth: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = rng or np.random.default_rng()
        self.num_workers = num_workers
        self.queue_depth = queue_depth
        if collate_fn is None:
            collate_fn = getattr(type(dataset), "collate_padded", None)
            # collate_padded packs item["events"]; a dataset configured
            # without return_events has no such key, so defaulting to it
            # would KeyError on the first batch
            if collate_fn is not None and not getattr(dataset,
                                                      "return_events", True):
                collate_fn = None
            if collate_fn is None:
                collate_fn = getattr(type(dataset), "collate_fn", _default_collate)
        self.collate_fn = collate_fn

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for s in range(0, len(order), self.batch_size):
            idx = order[s:s + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for idx in self._batches():
                yield self.collate_fn([self.dataset[i] for i in idx])
            return
        yield from self._threaded_iter()

    def _threaded_iter(self):
        """Background batch assembly.

        - item fetches fan out over ``num_workers`` threads (h5py/np.load
          release the GIL on IO, so this is real parallelism);
        - producer errors propagate to the consumer instead of silently
          truncating the epoch;
        - abandoning the iterator (break/exception) stops the producer via
          a timeout-checked event rather than leaving it blocked on a full
          queue forever.
        """
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.queue_depth)
        stop = threading.Event()
        pool = (ThreadPoolExecutor(self.num_workers)
                if self.num_workers > 1 else None)

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def fetch(idx):
            if pool is not None:
                return list(pool.map(self.dataset.__getitem__, idx))
            return [self.dataset[i] for i in idx]

        def producer():
            try:
                for idx in self._batches():
                    if stop.is_set():
                        return
                    if not put(("ok", self.collate_fn(fetch(idx)))):
                        return
                put(("done", None))
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                put(("err", exc))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, item = q.get()
                if kind == "err":
                    raise item
                if kind == "done":
                    break
                yield item
        finally:
            stop.set()  # break/close/GC: release a blocked producer
            t.join()
            if pool is not None:
                pool.shutdown(wait=False)


def _default_collate(items):
    out = {}
    for k in items[0]:
        vals = [item[k] for item in items]
        try:
            out[k] = np.stack([np.asarray(v) for v in vals])
        except Exception:
            out[k] = vals
    return out


def device_prefetch(iterator, prefetch_depth: int = 2, device=None,
                    keys=None):
    """Keep ``prefetch_depth`` batches resident on device ahead of use.

    Wrap any batch iterator; array-valued entries (or only ``keys`` if given)
    are moved with ``jax.device_put`` as soon as a slot frees up, so the
    host->HBM transfer of batch k+1 overlaps with compute on batch k.
    """
    import collections
    import jax

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if (keys is None or k in keys) and isinstance(v, np.ndarray) \
                    and np.issubdtype(v.dtype, np.number):
                out[k] = jax.device_put(v, device)
            else:
                out[k] = v
        return out

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(prefetch_depth):
            buf.append(to_device(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.popleft()
        try:
            buf.append(to_device(next(it)))
        except StopIteration:
            pass
        yield nxt
