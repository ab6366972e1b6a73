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
            raise ValueError(f"Unknown window method {method!r}")
        if len(self.windows) == 0:
            raise ValueError("Window parameters produce no windows")

        if capacity is None:
            longest = int((self.windows[:, 1] - self.windows[:, 0]).max())
            capacity = int(2 ** np.ceil(np.log2(max(longest, 1))))
        self.capacity = capacity
        self.truncated_events = 0

    def __len__(self):
        if self.drop_last:
            return len(self.windows) // self.batch_size
        return (len(self.windows) + self.batch_size - 1) // self.batch_size

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
                relative_time=self.relative_time, nthreads=self.nthreads)
            self.truncated_events += trunc
            yield {
                "events": events,
                "events_mask": mask,
                "window_idx0": sel[:, 0],
                "window_idx1": sel[:, 1],
                "t_starts": t_flat[np.clip(sel[:, 0], 0,
                                           self.num_events - 1)],
            }
