"""Raw-event-stream augmentation.

Rebuild of reference ``lib/augmentation/event_augmentation.py``. Two flavours:

* **Host (numpy) ops** with reference-compatible signatures — these change the
  number of events (add/remove/merge) and therefore live on the host where
  dynamic shapes are free. Randomness goes through an explicit
  ``numpy.random.Generator`` (``rng=``) instead of the reference's global
  ``np.random`` state, so augmentation is reproducible.
* **Device ops** (``*_jax``) — capacity-preserving transforms (flip, rotate,
  crop-mask, polarity-preserving jitter) as pure functions of a
  ``jax.random`` key, usable inside jitted input pipelines.

Documented divergences from catalogued reference bugs (SURVEY.md §7.3):
- ``rotate_events`` here applies a true rotation about the center
  (the reference adds the *centered* coords back instead of the center,
  event_augmentation.py:218-219, and draws the y-center from the x-range);
- ``flip_events_*`` map ``c -> (res-1) - c`` (the reference's ``res - c``
  can produce out-of-range coords equal to ``res``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _default_rng(rng):
    return np.random.default_rng() if rng is None else rng


def events_to_block(xs, ys, ts, ps) -> np.ndarray:
    """Stack event components into an ``(N, 4)`` block
    (reference event_augmentation.py:23-38)."""
    return np.stack([np.asarray(xs), np.asarray(ys), np.asarray(ts),
                     np.asarray(ps)], axis=1)


def block_to_events(block):
    return block[:, 0], block[:, 1], block[:, 2], block[:, 3]


def merge_events(event_sets, sort: bool = False):
    """Concatenate several (xs, ys, ts, ps) streams into one block
    (reference event_augmentation.py:40-58); optionally time-sort."""
    xs = np.concatenate([np.asarray(e[0]) for e in event_sets])
    ys = np.concatenate([np.asarray(e[1]) for e in event_sets])
    ts = np.concatenate([np.asarray(e[2]) for e in event_sets])
    ps = np.concatenate([np.asarray(e[3]) for e in event_sets])
    block = events_to_block(xs, ys, ts, ps)
    if sort:
        block = block[np.argsort(block[:, 2], kind="stable")]
    return block


def sample(cdf, ts, rng=None):
    """Draw an event index by sampling a CDF over timestamps
    (reference event_augmentation.py:8-21).

    Reference-parity quirk kept: the draw is uniform over the *CDF's value
    range* but searchsorted against ``ts`` — the two only agree when the
    caller passes ``cdf`` and ``ts`` spanning the same values (as the
    reference does). Neither library calls this internally."""
    rng = _default_rng(rng)
    rnd = rng.uniform(cdf[0], cdf[-1])
    return int(np.searchsorted(ts, rnd))


def _sorted_out(block, sort):
    if sort:
        block = block[np.argsort(block[:, 2], kind="stable")]
    return block[:, 0], block[:, 1], block[:, 2], block[:, 3]


def add_random_events(xs, ys, ts, ps, to_add, sensor_resolution=None,
                      sort: bool = True, return_merged: bool = True,
                      rng=None):
    """Add uniform-noise events over the stream's spatial/temporal extent
    (reference event_augmentation.py:60-92)."""
    rng = _default_rng(rng)
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    if sensor_resolution is None:
        max_x, max_y = int(np.max(xs)) + 1, int(np.max(ys)) + 1
    else:
        max_y, max_x = sensor_resolution
    xs_new = rng.integers(0, max_x, size=to_add).astype(xs.dtype)
    ys_new = rng.integers(0, max_y, size=to_add).astype(ys.dtype)
    ts_new = rng.uniform(np.min(ts), np.max(ts), size=to_add)
    ps_new = rng.integers(0, 2, size=to_add) * 2 - 1
    if return_merged:
        block = merge_events([[xs_new, ys_new, ts_new, ps_new],
                              [xs, ys, ts, ps]])
        return _sorted_out(block, sort)
    block = events_to_block(xs_new, ys_new, ts_new, ps_new)
    return _sorted_out(block, sort)


def remove_events(xs, ys, ts, ps, to_remove, add_noise: int = 0, rng=None):
    """Randomly drop ``to_remove`` events, optionally replacing with noise
    (reference event_augmentation.py:94-116)."""
    rng = _default_rng(rng)
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    if to_remove > len(xs):
        return (np.array([]),) * 4
    keep = len(xs) - to_remove
    idx = rng.choice(len(xs), size=keep, replace=False)
    idx.sort()
    if add_noise <= 0:
        return xs[idx], ys[idx], ts[idx], ps[idx]
    nsx, nsy, nst, nsp = add_random_events(xs, ys, ts, ps, add_noise,
                                           sort=False, return_merged=False,
                                           rng=rng)
    block = merge_events([[xs[idx], ys[idx], ts[idx], ps[idx]],
                          [nsx, nsy, nst, nsp]])
    return _sorted_out(block, True)


def add_correlated_events(xs, ys, ts, ps, to_add, sort: bool = True,
                          return_merged: bool = True, xy_std: float = 1.5,
                          ts_std: float = 0.001, add_noise: int = 0,
                          rng=None):
    """Densify: place a Gaussian bubble of new events around existing ones
    (reference event_augmentation.py:118-157). Vectorized: one tiled draw,
    then a uniform subsample down to ``to_add``."""
    rng = _default_rng(rng)
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    n = len(xs)
    # Source multiplicities match the reference's tile-then-subsample
    # (event_augmentation.py:137-144): every event spawns floor(to_add/n)
    # bubbles plus a without-replacement remainder — but only 8-byte source
    # INDICES are materialized, never tiled copies of the 4 float arrays.
    full = to_add // n
    src = np.arange(n, dtype=np.int64)
    parts = [np.tile(src, full)] if full else []
    rem = to_add - full * n
    if rem:
        parts.append(rng.choice(n, size=rem, replace=False))
    src = np.concatenate(parts) if parts else np.empty(0, np.int64)
    xs_new = np.clip(xs[src] + rng.normal(scale=xy_std,
                                          size=to_add).astype(int),
                     0, np.max(xs))
    ys_new = np.clip(ys[src] + rng.normal(scale=xy_std,
                                          size=to_add).astype(int),
                     0, np.max(ys))
    ts_new = ts[src] + rng.normal(scale=ts_std, size=to_add)
    ps_new = ps[src]
    sets = [[xs_new, ys_new, ts_new, ps_new]]
    if add_noise > 0:
        sets.append(add_random_events(xs, ys, ts, ps, add_noise, sort=False,
                                      return_merged=False, rng=rng))
    if return_merged:
        sets.append([xs, ys, ts, ps])
    # lean merge: one concatenate + one argsort on t, applied per component
    # (no (4, N) block round-trip)
    cx = np.concatenate([s[0] for s in sets])
    cy = np.concatenate([s[1] for s in sets])
    ct = np.concatenate([s[2] for s in sets])
    cp = np.concatenate([s[3] for s in sets])
    if sort:
        order = np.argsort(ct, kind="stable")
        return cx[order], cy[order], ct[order], cp[order]
    return cx, cy, ct, cp


def flip_events_x(xs, ys, ts, ps, sensor_resolution=(180, 240)):
    """Mirror events along x (reference event_augmentation.py:159-169;
    off-by-one fixed: ``x -> (W-1) - x``)."""
    return sensor_resolution[1] - 1 - np.asarray(xs), ys, ts, ps


def flip_events_y(xs, ys, ts, ps, sensor_resolution=(180, 240)):
    """Mirror events along y (reference event_augmentation.py:171-181;
    off-by-one fixed: ``y -> (H-1) - y``)."""
    return xs, sensor_resolution[0] - 1 - np.asarray(ys), ts, ps


def crop_events(xs, ys, sensor_resolution, new_resolution):
    """Crop events to a smaller resolution
    (reference event_augmentation.py:183-193)."""
    from ..utils.event_util import clip_events_to_bounds
    clip = clip_events_to_bounds(xs, ys, None, None, new_resolution)
    return clip[0], clip[1]


def rotate_events(xs, ys, sensor_resolution=(180, 240), theta_radians=None,
                  center_of_rotation=None, clip_to_range: bool = False,
                  rng=None):
    """Rotate events about a center (reference event_augmentation.py:195-223,
    with the rotation math corrected: ``p' = c + R(theta) (p - c)``).

    Returns ``(xs', ys', theta_radians, center_of_rotation)``.
    """
    rng = _default_rng(rng)
    xs, ys = np.asarray(xs), np.asarray(ys)
    if theta_radians is None:
        theta_radians = rng.uniform(0, 2 * np.pi)
    if center_of_rotation is None:
        center_of_rotation = (int(rng.uniform(0, sensor_resolution[1])),
                              int(rng.uniform(0, sensor_resolution[0])))
    cx, cy = center_of_rotation
    rx = xs - cx
    ry = ys - cy
    c, s = np.cos(theta_radians), np.sin(theta_radians)
    new_xs = c * rx - s * ry + cx
    new_ys = s * rx + c * ry + cy
    if clip_to_range:
        from ..utils.event_util import clip_events_to_bounds
        clip = clip_events_to_bounds(new_xs, new_ys, None, None,
                                     sensor_resolution)
        new_xs, new_ys = clip[0], clip[1]
    return new_xs, new_ys, theta_radians, center_of_rotation


# ---------------------------------------------------------------------------
# Device-side (jit-friendly, capacity-preserving) augmentation
# ---------------------------------------------------------------------------

def flip_events_x_jax(xs, ys, ts, ps, sensor_resolution=(180, 240)):
    return sensor_resolution[1] - 1 - jnp.asarray(xs), ys, ts, ps


def flip_events_y_jax(xs, ys, ts, ps, sensor_resolution=(180, 240)):
    return xs, sensor_resolution[0] - 1 - jnp.asarray(ys), ts, ps


def rotate_events_jax(key, xs, ys, sensor_resolution=(180, 240),
                      theta_radians=None, center_of_rotation=None):
    """Device rotation with jax.random; returns (xs', ys', theta, center)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if theta_radians is None:
        theta_radians = jax.random.uniform(k1, (), minval=0.0,
                                           maxval=2 * jnp.pi)
    if center_of_rotation is None:
        cx = jax.random.uniform(k2, (), minval=0.0,
                                maxval=float(sensor_resolution[1]))
        cy = jax.random.uniform(k3, (), minval=0.0,
                                maxval=float(sensor_resolution[0]))
        center_of_rotation = (cx, cy)
    cx, cy = center_of_rotation
    rx = jnp.asarray(xs, jnp.float32) - cx
    ry = jnp.asarray(ys, jnp.float32) - cy
    c, s = jnp.cos(theta_radians), jnp.sin(theta_radians)
    return c * rx - s * ry + cx, s * rx + c * ry + cy, theta_radians, center_of_rotation


def _f32_time_offset(ts) -> float:
    """Host-side float64 origin to subtract before a float32 device cast.

    Absolute (epoch-style) stamps ~1e9 s have float32 ulp ~128 s — a cast
    would collapse every stamp in a window to one value, silently zeroing
    jitters and randomizing time sorts. Device ops therefore work in
    relative time and the caller's float64 origin is added back on return.
    Traced inputs (already f32 on device) get offset 0.0.
    """
    if isinstance(ts, (np.ndarray, list, tuple)) and len(ts):
        return float(np.asarray(ts).reshape(-1)[0])
    return 0.0


def _restore_time_origin(t_rel, t0: float):
    """Add a float64 time origin back onto a relative-time result.

    Concrete outputs come back as float64 numpy at full precision; traced
    outputs (the op ran under jit, which cannot return float64) get a
    float32 add — the jitter/sort still happened exactly in relative time,
    only the returned absolute stamps are f32-quantized.
    """
    if not t0:
        return t_rel
    if isinstance(t_rel, jax.core.Tracer):
        return t_rel + np.float32(t0)
    return np.asarray(t_rel, np.float64) + t0


def jitter_events_jax(key, xs, ys, ts, xy_std: float = 1.5,
                      ts_std: float = 0.001):
    """Gaussian spatio-temporal jitter — the device-side core of
    ``add_correlated_events`` (capacity-preserving: jitter a copy, then merge
    on the host or keep as an extra batch). Host (numpy) timestamps may be
    absolute float64; they are jittered in relative float32 time and the
    origin restored, so epoch-style stamps keep sub-ms resolution."""
    kx, ky, kt = jax.random.split(key, 3)
    t0 = _f32_time_offset(ts)
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    ts_rel = jnp.asarray(np.asarray(ts) - t0 if t0 else ts, jnp.float32)
    nx = xs + jnp.trunc(jax.random.normal(kx, xs.shape) * xy_std)
    ny = ys + jnp.trunc(jax.random.normal(ky, ys.shape) * xy_std)
    nt = ts_rel + jax.random.normal(kt, ts_rel.shape) * ts_std
    return nx, ny, _restore_time_origin(nt, t0)


def add_correlated_events_jax(key, xs, ys, ts, ps, mask=None,
                              xy_std: float = 1.5, ts_std: float = 0.001,
                              sensor_resolution=(180, 240),
                              sort: bool = True, sort_block="auto"):
    """Full on-device densify (2x): every valid event spawns one jittered
    copy (the device analogue of ``add_correlated_events`` with
    ``to_add = N``); the doubled stream is re-sorted by time on device.

    Static shapes: returns ``(xs', ys', ts', ps', mask')`` each of length
    ``2N`` with pad slots (mask 0) sorted to the tail — ready for the
    masked voxel/IWE kernels.

    ``sort=False`` skips the time sort entirely: every masked scatter/IWE
    path is order-independent — only the Pallas ``voxel_matmul`` kernel
    requires time-sorted input.

    ``sort_block`` picks the sort strategy. The doubled stream is NEARLY
    sorted (each copy is a bounded ``ts_std`` jitter from a sorted source
    event), so the default ``'auto'`` computes the exact rank-displacement
    bound from the data (``ops.sort.sort_block_for``; needs a sorted
    time-ordered input and one scalar host sync — eager calls only) and
    sorts with two vectorized block-sort passes instead of one global
    sort (``ops.sort.nearly_sorted_sort``); an on-device monotonicity
    check falls back to the global sort if the bound is ever violated.
    Pass an int to pin the block statically (jit-safe), or ``None`` for
    the global sort (always jit-safe; also the automatic fallback under
    tracing or when the stream is too dense for blocking to pay). Every
    path carries all five event fields as ``lax.sort`` payloads — never
    argsort + gathers, whose five gathers are the measured TPU cliff
    (~18 Mev/s vs ~150 for the payload global sort on v5e-1).

    **Packed sort fast path**: when ``xs``/``ys`` arrive with an INTEGER
    dtype (the raw-DVS contract — sensors emit integer pixel coords; file
    readers keep int16/int32), the four payload fields pack losslessly
    into ONE int32 word (14-bit x, 14-bit y, polarity sign, mask bit) and
    the sort carries 2 operands instead of 6 — the sort's cost on TPU is
    ~proportional to total payload bytes (measured on v5e-1: the full
    sorted densify at 2M events goes 77 -> 270 Mev/s median / 311 best).
    Timestamps are reconstructed from the sort
    key itself (key == t for valid slots; pad slots return the stream's
    time origin with mask 0). The packed path assumes polarity in {-1, +1}
    (zeros read
    back as -1) and sensors <= 16384 px per side; float-dtype coords use
    the general 6-operand sort unchanged.
    """
    H, W = sensor_resolution
    # Packed-sort eligibility is a TRACE-TIME property (input dtypes +
    # static sensor size), so it is jit-safe — see docstring.
    pack = (sort
            and jnp.issubdtype(jnp.asarray(xs).dtype, jnp.integer)
            and jnp.issubdtype(jnp.asarray(ys).dtype, jnp.integer)
            and H <= (1 << 14) and W <= (1 << 14))
    # Work in relative float32 time (see _f32_time_offset): jitter, merge
    # and sort stay exact for absolute-epoch host stamps; the origin is
    # restored (float64, on host) before returning.
    t0 = _f32_time_offset(ts)
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    ts = jnp.asarray(np.asarray(ts) - t0 if t0 else ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)
    if mask is None:
        mask = jnp.ones_like(ts)
    mask = jnp.asarray(mask, jnp.float32)
    nx, ny, nt = jitter_events_jax(key, xs, ys, ts, xy_std=xy_std,
                                   ts_std=ts_std)
    nx = jnp.clip(nx, 0, W - 1)
    ny = jnp.clip(ny, 0, H - 1)
    if sort and sort_block == "auto" and not isinstance(ts, jax.core.Tracer):
        # jitter_events_jax draws from N(0, ts_std); use a 6-sigma bound
        # with the exact max as backstop (both one cheap device reduction).
        # The bound is computed over the SAME masked keys the sort uses
        # (pads -> +inf): raw pad-slot timestamps are arbitrary and would
        # otherwise make the searchsorted bound garbage. Interior mask
        # holes make the masked key stream unsorted — the displacement
        # analysis doesn't apply, so fall back to the global sort.
        from ..ops.sort import sort_block_for

        src_keys = jnp.where(mask != 0, ts, jnp.inf)
        src_sorted = bool(jnp.all(src_keys[1:] >= src_keys[:-1])) \
            if src_keys.shape[0] > 1 else True
        if src_sorted:
            valid_jit = jnp.abs(nt - ts) * (mask != 0)
            delta = float(jnp.maximum(jnp.max(valid_jit), 6 * ts_std))
            sort_block = sort_block_for(src_keys, delta, copies=2)
        else:
            sort_block = None
    if sort:
        # interleave [orig_i, copy_i] pairs so the combined stream keeps
        # the source's time order up to the jitter bound (a concatenation
        # would put every copy N ranks away from its slot)
        interleave = lambda a, b: jnp.stack([a, b], axis=1).reshape(-1)
        cx = interleave(xs, nx)
        cy = interleave(ys, ny)
        ct = interleave(ts, nt)
        cp = interleave(ps, ps)
        cm = interleave(mask, mask)
        keys = jnp.where(cm != 0, ct, jnp.inf)
        # payload-carrying lax.sort, NOT argsort + gathers: on TPU the five
        # gathers dominate (measured ~18 Mev/s with vs ~150 without)
        from ..ops.sort import nearly_sorted_sort, time_sort

        if pack:
            # one int32 payload instead of five f32 (see docstring)
            packed = ((cx.astype(jnp.int32) << 16)
                      | (cy.astype(jnp.int32) << 2)
                      | ((cp > 0).astype(jnp.int32) << 1)
                      | (cm != 0).astype(jnp.int32))
            if isinstance(sort_block, int):
                k2, packed = nearly_sorted_sort(keys, packed,
                                                block=sort_block)
            else:
                k2, packed = time_sort(keys, packed)
            cx = (packed >> 16).astype(jnp.float32)
            cy = ((packed >> 2) & ((1 << 14) - 1)).astype(jnp.float32)
            cp = ((packed >> 1) & 1).astype(jnp.float32) * 2.0 - 1.0
            cm = (packed & 1).astype(jnp.float32)
            # valid slots: key IS the jittered time; pad slots (+inf key,
            # sorted to the tail, mask 0) read back as t = 0
            ct = jnp.where(jnp.isfinite(k2), k2, 0.0)
        elif isinstance(sort_block, int):
            _, cx, cy, ct, cp, cm = nearly_sorted_sort(
                keys, cx, cy, ct, cp, cm, block=sort_block)
        else:
            _, cx, cy, ct, cp, cm = time_sort(keys, cx, cy, ct, cp, cm)
    else:
        cx = jnp.concatenate([xs, nx])
        cy = jnp.concatenate([ys, ny])
        ct = jnp.concatenate([ts, nt])
        cp = jnp.concatenate([ps, ps])
        cm = jnp.concatenate([mask, mask])
    return cx, cy, _restore_time_origin(ct, t0), cp, cm


def remove_events_mask_jax(key, n: int, to_remove: int):
    """Random keep-mask over a fixed-capacity batch: device analogue of
    ``remove_events`` (drops exactly ``to_remove`` of ``n`` slots).
    ``to_remove >= n`` drops everything (a clamped gather would otherwise
    keep the max-score slot)."""
    scores = jax.random.uniform(key, (n,))
    if to_remove >= n:
        return jnp.zeros((n,), bool)
    thresh = jnp.sort(scores)[to_remove]
    return scores >= thresh
