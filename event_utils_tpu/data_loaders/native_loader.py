"""Native-backed streaming window loader.

``NativeWindowedLoader`` goes straight from a memory-mapped event directory
to fixed-capacity padded device batches using the C++ ingest runtime
(``event_utils_tpu.native``): window tables and batch assembly run in native
threads, nothing is loaded until its window is touched, and the output is
exactly the ``(B, capacity, 4) + mask`` layout the jitted voxel/cmax kernels
consume. This is the high-throughput path for training pipelines (BASELINE
config 5); the Python ``EventDataLoader`` remains the flexible one.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .. import native
from ..data_formats.read_events import read_memmap_events
from ..errors import ConfigurationError

# Rotating-pool depth: must cover every buffer simultaneously alive —
# prefetch queue (2) + one being consumed + one being written.
_POOL_DEPTH = 4

_RotatingPool = native.RotatingPool


def _out_buffers(pool: _RotatingPool, B: int, capacity: int):
    return pool.get((B, capacity),
                    lambda: (np.zeros((B, capacity, 4), np.float32),
                             np.zeros((B, capacity), np.float32)))


class NativeWindowedLoader:
    """Iterate padded event-window batches from an RPG-style memmap dir.

    @param memmap_path Memmap directory (``t.npy, xy.npy, p.npy``)
    @param method ``'k_events'`` or ``'t_seconds'``
    @param k / sliding_window_w Window size/overlap in events
    @param t / sliding_window_t Window size/overlap in seconds
    @param batch_size Windows per batch
    @param capacity Fixed event capacity per window (defaults to the max
        window length rounded up to a power of two)
    @param shuffle Shuffle window order each epoch
    @param relative_time Shift each window's timestamps to start at 0
        (keeps float32 precision on long recordings)
    """

    def __init__(self, memmap_path: str, method: str = "k_events",
                 k: int = 20000, sliding_window_w: int = 0,
                 t: float = 0.05, sliding_window_t: float = 0.0,
                 batch_size: int = 8, capacity: Optional[int] = None,
                 shuffle: bool = False, relative_time: bool = True,
                 rng: Optional[np.random.Generator] = None,
                 nthreads: int = 0, drop_last: bool = False):
        native.build()  # explicit opt-in compile (numpy fallback if it fails)
        data = read_memmap_events(memmap_path)
        self.t = data["t"]
        self.xy = data["xy"]
        self.p = data["p"]
        self.num_events = data["num_events"]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.relative_time = relative_time
        self.rng = rng or np.random.default_rng()
        self.nthreads = nthreads

        if method == "k_events":
            self.windows = native.k_event_windows(self.num_events, k,
                                                  sliding_window_w)
        elif method == "t_seconds":
            ts = np.asarray(self.t).reshape(-1)
            self.windows = native.t_second_windows(ts, t, sliding_window_t)
        else:
            raise ConfigurationError(f"Unknown window method {method!r}")
        if len(self.windows) == 0:
            raise ConfigurationError("Window parameters produce no windows")

        if capacity is None:
            longest = int((self.windows[:, 1] - self.windows[:, 0]).max())
            capacity = int(2 ** np.ceil(np.log2(max(longest, 1))))
        self.capacity = capacity
        self.truncated_events = 0
        self._out_pool = _RotatingPool()

    def __len__(self):
        if self.drop_last:
            return len(self.windows) // self.batch_size
        return (len(self.windows) + self.batch_size - 1) // self.batch_size

    def close(self):
        """Release the memmap views (uniform loader contract with
        H5WindowedLoader/ChainLoader; numpy memmaps close on GC, so this
        is deterministic-release sugar, not a correctness requirement)."""
        self.t = self.xy = self.p = None
        self._out_pool = _RotatingPool()

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.windows))
        if self.shuffle:
            self.rng.shuffle(order)
        t_flat = np.asarray(self.t).reshape(-1)
        for s in range(0, len(order), self.batch_size):
            if self.drop_last and s + self.batch_size > len(order):
                return
            sel = self.windows[order[s:s + self.batch_size]]
            events, mask, trunc = native.fill_padded_batches(
                self.t, self.xy, self.p, sel, self.capacity,
                relative_time=self.relative_time, nthreads=self.nthreads,
                out=_out_buffers(self._out_pool, len(sel), self.capacity))
            self.truncated_events += trunc
            yield {
                "events": events,
                "events_mask": mask,
                "window_idx0": sel[:, 0],
                "window_idx1": sel[:, 1],
                "t_starts": t_flat[np.clip(sel[:, 0], 0,
                                           self.num_events - 1)],
            }


class H5WindowedLoader:
    """Streaming padded-batch loader straight from an HDF5 event file.

    The HDF5 fast path the round-1 loader lacked: windows are built from the
    on-disk timestamp dataset, then each batch's events are read as ONE
    contiguous slab per component (sequential chunk access — the layout
    HDF5 reads fastest) and assembled into the padded device layout by the
    native runtime (``evio_fill_padded_batches_components``). A background
    thread reads slab k+1 while slab k is being consumed, so HDF5 I/O
    overlaps batch assembly and device compute.

    Counterpart of reference ``lib/data_loaders/hdf5_dataset.py:18-23``
    (per-window h5 slices through Python) at streaming throughput. Reads the
    Monash layout ``events/{xs,ys,ts,ps}``; polarity {0,1} -> {-1,+1}.
    """

    def __init__(self, h5_path: str, method: str = "k_events",
                 k: int = 20000, sliding_window_w: int = 0,
                 t: float = 0.05, sliding_window_t: float = 0.0,
                 batch_size: int = 8, capacity: Optional[int] = None,
                 relative_time: bool = True, nthreads: int = 0,
                 drop_last: bool = False, prefetch: bool = True):
        import h5py

        native.build()
        self._h5 = h5py.File(h5_path, "r")
        ev = self._h5["events"]
        self._xs, self._ys = ev["xs"], ev["ys"]
        self._ts, self._ps = ev["ts"], ev["ps"]
        self.num_events = len(self._ts)
        self.batch_size = batch_size
        self.relative_time = relative_time
        self.nthreads = nthreads
        self.drop_last = drop_last
        self.prefetch = prefetch

        if method == "k_events":
            self.windows = native.k_event_windows(self.num_events, k,
                                                  sliding_window_w)
        elif method == "t_seconds":
            ts_all = np.asarray(self._ts[:], np.float64)
            self.windows = native.t_second_windows(ts_all, t,
                                                   sliding_window_t)
        else:
            raise ConfigurationError(f"Unknown window method {method!r}")
        if len(self.windows) == 0:
            raise ConfigurationError("Window parameters produce no windows")

        if capacity is None:
            longest = int((self.windows[:, 1] - self.windows[:, 0]).max())
            capacity = int(2 ** np.ceil(np.log2(max(longest, 1))))
        self.capacity = capacity
        self.truncated_events = 0
        self._out_pool = _RotatingPool()
        self._slab_pool = _RotatingPool()

    def __len__(self):
        if self.drop_last:
            return len(self.windows) // self.batch_size
        return (len(self.windows) + self.batch_size - 1) // self.batch_size

    def close(self):
        # Stop and JOIN any active prefetch reader before closing the h5
        # handle — a surviving reader would raise against the closed file
        # and then busy-loop in put() (queue full, stop never set) until
        # its generator is GC'd.
        stop = getattr(self, "_reader_stop", None)
        if stop is not None:
            stop.set()
            th = getattr(self, "_reader_thread", None)
            if th is not None and th.is_alive():
                th.join()
        self._h5.close()

    def _slab_buffers(self, m):
        """Persistent slab read buffers — fresh allocations would pay
        first-touch page faults per batch. The pool depth covers the
        prefetch queue + the slab being consumed + the one being read, so
        the reader can never overwrite a slab still in flight."""
        cap = 1 << max(int(np.ceil(np.log2(max(m, 1)))), 0)

        def make():
            return {
                "xs": np.zeros(cap, np.int32), "ys": np.zeros(cap, np.int32),
                "ts": np.zeros(cap, np.float64), "ps": np.zeros(cap, np.uint8),
                "raw_xs": np.zeros(cap, self._xs.dtype),
                "raw_ys": np.zeros(cap, self._ys.dtype),
                "raw_ps": np.zeros(cap, self._ps.dtype),
            }

        buf = self._slab_pool.get(cap, make)
        return {k: v[:m] for k, v in buf.items()}

    def _read_slab(self, sel):
        """One contiguous HDF5 read per component covering a window batch.

        Sequential batches read sequential slabs — optimal HDF5 chunk
        access; sub-window offsets are resolved slab-relative by the native
        fill."""
        import numpy as _np

        s = int(sel[:, 0].min())
        e = int(sel[:, 1].max())
        m = e - s
        buf = self._slab_buffers(m)
        src = _np.s_[s:e]
        self._xs.read_direct(buf["raw_xs"], src)
        self._ys.read_direct(buf["raw_ys"], src)
        self._ts.read_direct(buf["ts"], src)
        self._ps.read_direct(buf["raw_ps"], src)
        _np.copyto(buf["xs"], buf["raw_xs"], casting="unsafe")
        _np.copyto(buf["ys"], buf["raw_ys"], casting="unsafe")
        _np.greater(buf["raw_ps"], 0, out=buf["ps"], casting="unsafe")
        return (buf["xs"], buf["ys"], buf["ts"], buf["ps"], sel - s, sel)

    def __iter__(self) -> Iterator[dict]:
        import queue
        import threading

        batches = [self.windows[s:s + self.batch_size]
                   for s in range(0, len(self.windows), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if not self.prefetch:
            slabs = (self._read_slab(sel) for sel in batches)
        else:
            # queue depth 2 + one slab being consumed + one being read stays
            # within the slab pool's depth (no in-flight overwrite); reader
            # errors propagate to the consumer instead of silently ending
            # the epoch. An abandoned iteration's reader must STOP: it
            # shares the rotating slab pool with any subsequent iteration,
            # so a survivor would overwrite slabs the new epoch is
            # consuming (and block forever on the full queue).
            prev_stop = getattr(self, "_reader_stop", None)
            if prev_stop is not None:
                prev_stop.set()
                # The abandoned reader may be inside a long h5 read; it
                # shares the rotating slab pool with this iteration, so
                # wait for it to actually exit before handing pool buffers
                # out again (concurrent _read_slab would corrupt slabs).
                prev_th = getattr(self, "_reader_thread", None)
                if prev_th is not None and prev_th.is_alive():
                    prev_th.join()
            stop = threading.Event()
            self._reader_stop = stop
            q: "queue.Queue" = queue.Queue(maxsize=_POOL_DEPTH - 2)

            def put(item):
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        return True
                    except queue.Full:
                        continue
                return False

            def reader():
                try:
                    for sel in batches:
                        if stop.is_set():
                            return
                        if not put(("ok", self._read_slab(sel))):
                            return
                    put(("done", None))
                except BaseException as exc:  # noqa: BLE001 - re-raised below
                    put(("err", exc))

            th = threading.Thread(target=reader, daemon=True)
            self._reader_thread = th
            th.start()

            def drain():
                try:
                    while True:
                        kind, item = q.get()
                        if kind == "err":
                            raise item
                        if kind == "done":
                            return
                        yield item
                finally:
                    stop.set()  # runs on break/close/GC of the generator

            slabs = drain()

        try:
            for (xs, ys, ts, ps, rel_windows, abs_windows) in slabs:
                B = len(rel_windows)
                events, mask, trunc = native.fill_padded_batches_components(
                    ts, xs, ys, ps, rel_windows, self.capacity,
                    relative_time=self.relative_time, nthreads=self.nthreads,
                    out=_out_buffers(self._out_pool, B, self.capacity))
                self.truncated_events += trunc
                yield {
                    "events": events,
                    "events_mask": mask,
                    # ABSOLUTE event-file indices (same contract as
                    # NativeWindowedLoader; the slab-relative offsets are
                    # an internal detail of the native fill)
                    "window_idx0": abs_windows[:, 0],
                    "window_idx1": abs_windows[:, 1],
                    # ABSOLUTE window-start stamps (same contract as
                    # NativeWindowedLoader; the slab's ts is already
                    # absolute — only the padded batch is window-relative
                    # under relative_time)
                    "t_starts": ts[np.clip(rel_windows[:, 0], 0,
                                           len(ts) - 1)].copy(),
                }
        finally:
            if self.prefetch:
                stop.set()  # abandoned iteration: halt the reader thread


class ChainLoader:
    """Concatenate several windowed loaders into one epoch stream.

    The multi-recording case (e.g. a ``cli.simulate --num_sequences``
    factory): every member loader's batches are yielded in turn, so windows
    never straddle recordings. Members should share ``capacity`` (pass one
    explicitly) so downstream jitted consumers see one batch shape.
    """

    def __init__(self, loaders):
        self.loaders = list(loaders)
        if not self.loaders:
            raise ConfigurationError("ChainLoader needs at least one loader")

    def __len__(self):
        return sum(len(ld) for ld in self.loaders)

    def __iter__(self):
        for ld in self.loaders:
            yield from ld

    def close(self):
        for ld in self.loaders:
            if hasattr(ld, "close"):
                ld.close()

    @property
    def truncated_events(self):
        return sum(getattr(ld, "truncated_events", 0) for ld in self.loaders)
