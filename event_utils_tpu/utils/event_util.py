"""Event-stream primitives: bounds masks, clipping, windowing, hot pixels.

TPU-native rebuild of reference ``lib/util/event_util.py``. Two styles of
every selection op are provided:

- a *mask* form (device-friendly, static shapes — the jit/grad path), and
- a *drop* form (host-side numpy, dynamic shapes — the data-prep path).

The on-disk binary search (reference event_util.py:111-139) is kept as a
host-side helper for HDF5 datasets; on-device windowing uses
``jnp.searchsorted``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from ..errors import ConfigurationError

Array = jax.Array


def infer_resolution(xs, ys) -> Tuple[int, int]:
    """Guess sensor resolution from max coords (reference event_util.py:5-13)."""
    return (int(np.max(ys)) + 1, int(np.max(xs)) + 1)


def events_bounds_mask(xs, ys, x_min, x_max, y_min, y_max):
    """Mask of events inside the given bounds.

    Replicates the reference's asymmetric inclusivity exactly
    (event_util.py:26-27): an event is *out* when ``x <= x_min`` or
    ``x > x_max`` (same for y) — i.e. the lower bound is exclusive and the
    upper bound inclusive.
    """
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    mask = jnp.where((xs <= x_min) | (xs > x_max), 0.0, 1.0)
    mask = mask * jnp.where((ys <= y_min) | (ys > y_max), 0.0, 1.0)
    return mask


def clip_events_to_bounds(xs, ys, ts, ps, bounds, set_zero: bool = False):
    """Clip events to bounds (reference event_util.py:61-94).

    @param bounds length-2 ``[max_y, max_x]`` (lower bound 0) or length-4
        ``[min_y, max_y, min_x, max_x]``
    @param set_zero if True, return masked (coord-preserving) events as in the
        reference's multiply-by-mask mode; else drop out-of-bounds events
        (host-side numpy, dynamic shape).
    """
    if len(bounds) == 2:
        bounds = [0, bounds[0], 0, bounds[1]]
    elif len(bounds) != 4:
        raise ConfigurationError(
            f"Bounds must be of length 2 or 4 (not {len(bounds)})")
    miny, maxy, minx, maxx = bounds
    if set_zero:
        mask = events_bounds_mask(xs, ys, minx, maxx, miny, maxy)
        return (jnp.asarray(xs) * mask, jnp.asarray(ys) * mask,
                None if ts is None else jnp.asarray(ts) * mask,
                None if ps is None else jnp.asarray(ps) * mask)
    xs, ys = np.asarray(xs), np.asarray(ys)
    keep = (xs >= minx) & (xs < maxx) & (ys >= miny) & (ys < maxy)
    return (xs[keep], ys[keep],
            None if ts is None else np.asarray(ts)[keep],
            None if ps is None else np.asarray(ps)[keep])


def events_bounds_validity(xs, ys, sensor_size) -> Array:
    """Boolean mask of events strictly inside ``[0, W) x [0, H)``.

    The framework's canonical validity test (symmetric, zero-inclusive) used
    by kernels when legacy-parity masking is not requested.
    """
    H, W = sensor_size
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    return (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)


def cut_events_to_lifespan(xs, ys, ts, ps, params, pixel_crossings,
                           minimum_events: int = 100, side: str = "back"):
    """Cut events down to a motion-implied lifespan (event_util.py:30-59).

    Host-side (dynamic shape). Lifespan dt = pixel_crossings / |params|.
    Note the reference slices ``[s_idx:-1]`` (drops the final event); that is
    replicated for parity.
    """
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    magnitude = float(np.linalg.norm(np.asarray(params)))
    dt = pixel_crossings / magnitude
    if side == "back":
        s_idx = int(np.searchsorted(ts, ts[-1] - dt))
        if len(xs) - s_idx < minimum_events:
            s_idx = len(xs) - minimum_events
        return xs[s_idx:-1], ys[s_idx:-1], ts[s_idx:-1], ps[s_idx:-1]
    if side == "front":
        s_idx = int(np.searchsorted(ts, dt + ts[0]))
        if s_idx < minimum_events:
            s_idx = minimum_events
        return xs[0:s_idx], ys[0:s_idx], ts[0:s_idx], ps[0:s_idx]
    raise ConfigurationError(
        f"Invalid side {side!r}: must be 'front' or 'back'")


def lifespan_mask(ts: Array, params: Array, pixel_crossings: float,
                  minimum_events: int = 10000,
                  base_mask: Optional[Array] = None,
                  drop_last: bool = True) -> Array:
    """Jit-friendly mask form of the adaptive lifespan cut.

    The reference trims the event *array* each optimizer step
    (objectives.py:113-140) — a data-dependent shape that XLA cannot compile.
    Here the capacity stays fixed and the cut becomes a validity mask:
    events with ``t >= t_last - lifespan`` stay on, and if that leaves fewer
    than ``minimum_events`` the newest ``minimum_events`` stay on instead.

    @param ts Sorted timestamps, shape (N,)
    @param params Motion parameters (lifespan = pixel_crossings / |params|,
        or 5 s when |params| == 0, matching objectives.py:121-126)
    @param base_mask Optional pre-existing validity mask; the count of valid
        events and the "last" timestamp respect it.
    @param drop_last Reference slicing is ``[s_idx:-1]`` — the final event is
        excluded; kept here for parity.
    @returns float mask, shape (N,)
    """
    ts = jnp.asarray(ts)
    n = ts.shape[0]
    if base_mask is None:
        base_mask = jnp.ones_like(ts)
    valid = base_mask != 0
    magnitude = jnp.linalg.norm(jnp.atleast_1d(jnp.asarray(params)))
    dt = jnp.where(magnitude == 0, 5.0, pixel_crossings / jnp.maximum(magnitude, 1e-30))
    t_last = jnp.max(jnp.where(valid, ts, -jnp.inf))
    # Rank arithmetic instead of searchsorted: robust to ANY hole pattern
    # in base_mask (padded tails, bounds masks, hot-pixel masks), where a
    # where(valid, ts, inf) array would only stay sorted for prefix holes.
    keep_time = valid & (ts >= t_last - dt)
    num_valid = jnp.sum(valid)
    num_kept = jnp.sum(keep_time)
    # Minimum-events fallback: the newest `minimum_events` VALID events.
    rank_from_end = num_valid - jnp.cumsum(valid)  # 0 = last valid event
    keep_min = valid & (rank_from_end < minimum_events)
    keep = jnp.where(num_kept < minimum_events, keep_min, keep_time)
    if drop_last:
        pos = jnp.arange(n)
        last_valid = jnp.max(jnp.where(valid, pos, -1))
        keep = keep & (pos < last_valid)
    return base_mask * keep.astype(base_mask.dtype)


def get_events_from_mask(mask, xs, ys):
    """Indices of events lying on nonzero pixels of an image mask
    (reference event_util.py:96-109). Host-side."""
    xs = np.asarray(xs).astype(int)
    ys = np.asarray(ys).astype(int)
    vals = np.asarray(mask)[ys, xs]
    return np.argwhere(vals >= 0.01).squeeze()


def binary_search_h5_dset(dset, x, l=None, r=None, side="left"):
    """Binary search a (sorted, on-disk) HDF5 dataset without loading it
    (reference event_util.py:111-135)."""
    l = 0 if l is None else l
    r = len(dset) - 1 if r is None else r
    while l <= r:
        mid = l + (r - l) // 2
        midval = dset[mid]
        if midval == x:
            return mid
        elif midval < x:
            l = mid + 1
        else:
            r = mid - 1
    return l if side == "left" else r


def binary_search_h5_timestamp(hdf_path, l, r, x, side="left"):
    import h5py
    with h5py.File(hdf_path, "r") as f:
        return binary_search_h5_dset(f["events/ts"], x, l=l, r=r, side=side)


def binary_search_array(t, x, l=0, r=None, side="left"):
    """Device/array binary search (replaces reference
    ``binary_search_torch_tensor``, event_util.py:141-164)."""
    t = jnp.asarray(t)
    r = t.shape[0] if r is None else r
    return int(jnp.searchsorted(t[l:r], x, side=side)) + l


# Reference-name alias (event_util.py:141: binary_search_torch_tensor).
def binary_search_torch_tensor(t, l, r, x, side="left"):
    # The reference's r is INCLUSIVE (its callers pass len(t)-1 to search
    # the whole array, event_util.py:152-161); binary_search_array slices
    # exclusively, so widen by one.
    n = len(t)
    r_excl = n if r is None else min(int(r) + 1, n)
    return binary_search_array(t, x, l=l or 0, r=r_excl, side=side)


def remove_hot_pixels(xs, ys, ts, ps, sensor_size=(180, 240), num_hot: int = 50):
    """Remove events from the ``num_hot`` highest-count pixels
    (reference event_util.py:166-187). Host-side."""
    from ..representations.image import events_to_image

    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    img = np.array(events_to_image(xs, ys, ps, sensor_size=sensor_size))
    hot_mask = np.zeros(len(xs), dtype=bool)
    for _ in range(num_hot):
        maxc = np.unravel_index(np.argmax(img), sensor_size)
        img[maxc] = 0
        hot_mask |= (xs == maxc[1]) & (ys == maxc[0])
    keep = ~hot_mask
    return xs[keep], ys[keep], ts[keep], ps[keep]
