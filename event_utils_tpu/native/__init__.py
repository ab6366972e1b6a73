"""Native (C++) host-side ingest runtime, loaded through ctypes.

The TPU compute path is JAX/XLA/Pallas; ``libevio`` is the CPU runtime that
keeps the chip fed: binary search over memory-mapped timestamp arrays,
window-index construction, and multi-threaded assembly of fixed-capacity
padded event batches — the operations the reference delegates to torch
DataLoader workers and per-item Python loops.

Compilation is explicit: call :func:`build` once (g++, cached beside this
file) — nothing shells out at import or first call. Every entry point has a
numpy fallback, so the package works without a toolchain or without building.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np
from ..errors import DataFormatError

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "evio.cpp")
_LIB_PATH = os.path.join(_HERE, "_libevio.so")
_lock = threading.Lock()
_lib = None
_load_failed = False


def build(force: bool = False, check: bool = False) -> bool:
    """Compile (if needed) and load libevio. The ONLY entry point that runs
    the compiler — import and the accessor functions never shell out.
    Returns True when the native library is ready, False on failure (every
    caller then uses the numpy fallbacks). With ``check=True`` a failure
    raises :class:`~event_utils_tpu.errors.NativeBuildError` carrying the
    compiler/loader output instead of returning False."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None and not force:
            return True
        try:
            stale = (not os.path.exists(_LIB_PATH)
                     or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC))
            if force or stale:
                cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                       "-fPIC", "-pthread", _SRC, "-o", _LIB_PATH]
                subprocess.run(cmd, check=True, capture_output=True)
            _lib = _load(_LIB_PATH)
            _load_failed = False
            return True
        except Exception as exc:
            _load_failed = True
            if check:
                from ..errors import NativeBuildError
                detail = ""
                if isinstance(exc, subprocess.CalledProcessError):
                    detail = f": {exc.stderr.decode(errors='replace')[-2000:]}"
                raise NativeBuildError(
                    f"libevio build/load failed ({exc!r}){detail}") from exc
            return False


def _load(path):
    lib = ctypes.CDLL(path)
    lib.evio_searchsorted_f64.restype = ctypes.c_long
    lib.evio_k_event_windows.restype = ctypes.c_long
    lib.evio_t_second_windows.restype = ctypes.c_long
    lib.evio_fill_padded_batches.restype = ctypes.c_long
    lib.evio_fill_padded_batches_components.restype = ctypes.c_long
    lib.evio_bucket_fill.restype = ctypes.c_long
    return lib


def _get_lib():
    """Load a *pre-built* libevio; returns None when absent or stale (call
    :func:`build` to compile)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (os.path.exists(_LIB_PATH)
                    and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
                _lib = _load(_LIB_PATH)
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    """True when the native library is loaded or loadable (pre-built)."""
    return _get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def searchsorted_f64(ts: np.ndarray, x: float, side: str = "left") -> int:
    """Binary search over a sorted float64 array (memmap-friendly: only the
    touched pages fault in)."""
    lib = _get_lib()
    ts = np.ascontiguousarray(ts, np.float64)
    if lib is None:
        return int(np.searchsorted(ts, x, side=side))
    return int(lib.evio_searchsorted_f64(
        _ptr(ts, ctypes.c_double), ctypes.c_long(len(ts)),
        ctypes.c_double(x), ctypes.c_int(0 if side == "left" else 1)))


def k_event_windows(num_events: int, k: int, overlap: int = 0) -> np.ndarray:
    """(n, 2) fixed-count window index table."""
    if overlap >= k:
        from ..errors import ConfigurationError
        raise ConfigurationError(
            f"k_event_windows: overlap ({overlap}) must be < k ({k}) — "
            "a non-positive stride never advances")
    lib = _get_lib()
    stride = k - overlap
    max_windows = max(num_events // max(stride, 1) + 1, 1)
    if lib is None:
        starts = np.arange(0, num_events - k + 1, stride, dtype=np.int64)
        return np.stack([starts, starts + k], axis=1)
    idx0 = np.empty(max_windows, np.int64)
    idx1 = np.empty(max_windows, np.int64)
    n = lib.evio_k_event_windows(
        ctypes.c_long(num_events), ctypes.c_long(k), ctypes.c_long(overlap),
        _ptr(idx0, ctypes.c_long), _ptr(idx1, ctypes.c_long),
        ctypes.c_long(max_windows))
    return np.stack([idx0[:n], idx1[:n]], axis=1)


def t_second_windows(ts: np.ndarray, t_width: float,
                     overlap: float = 0.0) -> np.ndarray:
    """(n, 2) fixed-duration window index table over sorted timestamps."""
    if overlap >= t_width:
        from ..errors import ConfigurationError
        raise ConfigurationError(
            f"t_second_windows: overlap ({overlap}) must be < t_width "
            f"({t_width}) — a non-positive stride never advances")
    lib = _get_lib()
    ts = np.ascontiguousarray(ts, np.float64)
    if lib is None or len(ts) == 0:
        starts = np.arange(ts[0], ts[-1] - t_width + 1e-12,
                           t_width - overlap) if len(ts) else np.zeros(0)
        i0 = np.searchsorted(ts, starts)
        i1 = np.searchsorted(ts, starts + t_width)
        return np.stack([i0, i1], axis=1).astype(np.int64)
    duration = ts[-1] - ts[0]
    max_windows = int(duration / max(t_width - overlap, 1e-12)) + 2
    idx0 = np.empty(max_windows, np.int64)
    idx1 = np.empty(max_windows, np.int64)
    n = lib.evio_t_second_windows(
        _ptr(ts, ctypes.c_double), ctypes.c_long(len(ts)),
        ctypes.c_double(t_width), ctypes.c_double(overlap),
        _ptr(idx0, ctypes.c_long), _ptr(idx1, ctypes.c_long),
        ctypes.c_long(max_windows))
    return np.stack([idx0[:n], idx1[:n]], axis=1)


def fill_padded_batches(t, xy, p, windows: np.ndarray, capacity: int,
                        relative_time: bool = True,
                        nthreads: int = 0, out=None):
    """Assemble ``(B, capacity, 4)`` float32 events + ``(B, capacity)`` masks
    from memmap'd t/xy/p components for the given ``(B, 2)`` window table.

    Polarity {0,1} -> {-1,+1}; timestamps window-relative when
    ``relative_time``. Returns ``(events, mask, truncated_events)``.

    ``out``: optional ``(events, mask)`` buffer pair to fill in place —
    fresh allocations pay the first-touch page-fault cost on every call
    (measured ~25x the fill itself for large batches), so steady-state
    loaders should rotate persistent buffers (NativeWindowedLoader does).
    """
    windows = np.ascontiguousarray(windows, np.int64)
    B = len(windows)
    if out is not None:
        events, mask = out
        # hard validation (not assert): these shapes guard a raw-pointer
        # C write; python -O must not strip the check
        if (events.shape != (B, capacity, 4) or events.dtype != np.float32
                or mask.shape != (B, capacity) or mask.dtype != np.float32):
            raise DataFormatError(
                f"out buffers must be float32 ({B}, {capacity}, 4) and "
                f"({B}, {capacity}); got {events.shape}/{events.dtype}, "
                f"{mask.shape}/{mask.dtype}")
    else:
        events = np.empty((B, capacity, 4), np.float32)
        mask = np.empty((B, capacity), np.float32)
    lib = _get_lib()
    t = np.ascontiguousarray(np.asarray(t).reshape(-1), np.float64)
    xy = np.ascontiguousarray(np.asarray(xy).reshape(len(t), -1), np.int16)
    p = np.ascontiguousarray(np.asarray(p).reshape(-1), np.uint8)
    if lib is None:
        truncated = 0
        for w, (s, e) in enumerate(windows):
            # same clamps as evio.cpp: degenerate/inverted windows -> all-pad
            s = max(int(s), 0)
            e = min(int(e), len(t))
            cnt = max(min(e - s, capacity), 0)
            truncated += max(e - s - capacity, 0)
            tb = t[s] if (relative_time and cnt) else 0.0
            events[w, :cnt, 0] = xy[s:s + cnt, 0]
            events[w, :cnt, 1] = xy[s:s + cnt, 1]
            events[w, :cnt, 2] = t[s:s + cnt] - tb
            events[w, :cnt, 3] = np.where(p[s:s + cnt] > 0, 1.0, -1.0)
            mask[w, :cnt] = 1.0
            events[w, cnt:] = 0.0
            events[w, cnt:, 2] = events[w, cnt - 1, 2] if cnt else 0.0
            mask[w, cnt:] = 0.0
        return events, mask, truncated
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)
    idx0 = np.ascontiguousarray(windows[:, 0])
    idx1 = np.ascontiguousarray(windows[:, 1])
    truncated = lib.evio_fill_padded_batches(
        _ptr(t, ctypes.c_double), _ptr(xy, ctypes.c_int16),
        _ptr(p, ctypes.c_uint8), ctypes.c_long(len(t)),
        _ptr(idx0, ctypes.c_long), _ptr(idx1, ctypes.c_long),
        ctypes.c_long(B), ctypes.c_long(capacity),
        ctypes.c_int(1 if relative_time else 0),
        _ptr(events, ctypes.c_float), _ptr(mask, ctypes.c_float),
        ctypes.c_int(nthreads))
    return events, mask, int(truncated)


def fill_padded_batches_components(t, xs, ys, p, windows: np.ndarray,
                                   capacity: int, relative_time: bool = True,
                                   nthreads: int = 0, out=None):
    """Component-array variant of :func:`fill_padded_batches` (HDF5-style
    separate xs/ys arrays). Same output contract; ``windows`` indexes into
    the given component arrays (callers streaming slabs pass slab-relative
    windows)."""
    windows = np.ascontiguousarray(windows, np.int64)
    B = len(windows)
    if out is not None:
        events, mask = out
        # hard validation (not assert): these shapes guard a raw-pointer
        # C write; python -O must not strip the check
        if (events.shape != (B, capacity, 4) or events.dtype != np.float32
                or mask.shape != (B, capacity) or mask.dtype != np.float32):
            raise DataFormatError(
                f"out buffers must be float32 ({B}, {capacity}, 4) and "
                f"({B}, {capacity}); got {events.shape}/{events.dtype}, "
                f"{mask.shape}/{mask.dtype}")
    else:
        events = np.empty((B, capacity, 4), np.float32)
        mask = np.empty((B, capacity), np.float32)
    lib = _get_lib()
    t = np.ascontiguousarray(np.asarray(t).reshape(-1), np.float64)
    xs = np.ascontiguousarray(np.asarray(xs).reshape(-1), np.int32)
    ys = np.ascontiguousarray(np.asarray(ys).reshape(-1), np.int32)
    p = np.ascontiguousarray(np.asarray(p).reshape(-1), np.uint8)
    if lib is None:
        truncated = 0
        for w, (s, e) in enumerate(windows):
            # same clamps as evio.cpp: degenerate/inverted windows -> all-pad
            s = max(int(s), 0)
            e = min(int(e), len(t))
            cnt = max(min(e - s, capacity), 0)
            truncated += max(e - s - capacity, 0)
            tb = t[s] if (relative_time and cnt) else 0.0
            events[w, :cnt, 0] = xs[s:s + cnt]
            events[w, :cnt, 1] = ys[s:s + cnt]
            events[w, :cnt, 2] = t[s:s + cnt] - tb
            events[w, :cnt, 3] = np.where(p[s:s + cnt] > 0, 1.0, -1.0)
            mask[w, :cnt] = 1.0
            events[w, cnt:] = 0.0
            events[w, cnt:, 2] = events[w, cnt - 1, 2] if cnt else 0.0
            mask[w, cnt:] = 0.0
        return events, mask, truncated
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)
    idx0 = np.ascontiguousarray(windows[:, 0])
    idx1 = np.ascontiguousarray(windows[:, 1])
    truncated = lib.evio_fill_padded_batches_components(
        _ptr(t, ctypes.c_double), _ptr(xs, ctypes.c_int32),
        _ptr(ys, ctypes.c_int32), _ptr(p, ctypes.c_uint8),
        ctypes.c_long(len(t)),
        _ptr(idx0, ctypes.c_long), _ptr(idx1, ctypes.c_long),
        ctypes.c_long(B), ctypes.c_long(capacity),
        ctypes.c_int(1 if relative_time else 0),
        _ptr(events, ctypes.c_float), _ptr(mask, ctypes.c_float),
        ctypes.c_int(nthreads))
    return events, mask, int(truncated)


class RotatingPool:
    """Pre-faulted buffer sets reused round-robin (fresh allocations pay
    first-touch page faults on every call).

    Contract: a buffer handed out stays valid until ``depth - 1`` further
    ``get`` calls with the same key; consumers that retain results longer
    must copy (jnp device transfers already do)."""

    def __init__(self, depth: int = 4):
        import threading

        self.depth = depth
        self._pools: dict = {}
        self._idx: dict = {}
        self._lock = threading.Lock()

    def get(self, key, make):
        with self._lock:
            pool = self._pools.setdefault(key, [])
            if len(pool) < self.depth:
                pool.append(make())
                self._idx[key] = len(pool) - 1
                return pool[-1]
            self._idx[key] = (self._idx[key] + 1) % self.depth
            return pool[self._idx[key]]


_bucket_pool = RotatingPool(depth=2)


def bucket_fill(xs, ys, ts, ps, roi_size, grid_shape, capacity: int):
    """Counting-sort bucket fill: (R, capacity) padded per-bucket event
    arrays + masks in one O(n) native pass (time order preserved per
    bucket; over-capacity events truncated). Returns
    ``(bx, by, bt, bp, bmask, truncated)`` or None when the native library
    is unavailable (callers use their numpy path)."""
    lib = _get_lib()
    if lib is None:
        return None
    rh, rw = roi_size
    ny, nx = grid_shape
    R = ny * nx
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    ts = np.ascontiguousarray(ts, np.float64)
    ps = np.ascontiguousarray(ps, np.float64)
    # rotating pre-faulted output buffers (fresh np.empty pays first-touch
    # page faults ~10x the fill itself); per-key rotation guarantees a
    # result stays valid until the next bucket_fill with the same key
    bx, by, bt, bp, bmask = _bucket_pool.get(
        (R, capacity),
        lambda: tuple(np.zeros((R, capacity), np.float32) for _ in range(5)))
    truncated = lib.evio_bucket_fill(
        _ptr(xs, ctypes.c_double), _ptr(ys, ctypes.c_double),
        _ptr(ts, ctypes.c_double), _ptr(ps, ctypes.c_double),
        ctypes.c_long(len(xs)), ctypes.c_int(rh), ctypes.c_int(rw),
        ctypes.c_int(ny), ctypes.c_int(nx), ctypes.c_long(capacity),
        _ptr(bx, ctypes.c_float), _ptr(by, ctypes.c_float),
        _ptr(bt, ctypes.c_float), _ptr(bp, ctypes.c_float),
        _ptr(bmask, ctypes.c_float))
    return bx, by, bt, bp, bmask, int(truncated)
