"""Event-stream denoising — TPU-native background-activity filtering.

The reference's only denoiser is the count-based hot-pixel remover
(reference ``lib/util/event_util.py:166-187``, mirrored here as
``utils.event_util.remove_hot_pixels``). This module adds the standard
*background-activity filter* (BAF, after Delbruck's spatiotemporal
correlation filter): an event is genuine if a NEIGHBOURING pixel fired
within ``delta_t`` before it; isolated events (sensor leak/shot noise) have
no such support and are dropped. Together with the simulator's labelled
background activity (``simulation.esim.SimulatedEvents.labels``) this gives
a fully scored denoising loop with exact ground truth.

TPU-first design: the classic implementation is a sequential per-event
update of a last-timestamp map — unvectorizable. Here time is quantized
into ``n_slices`` static slices and the filter becomes four dense passes:

1. scatter-max event times into a ``(S, H, W)`` per-slice last-time volume,
2. neighbourhood max over each slice (unrolled static shifts, centre
   excluded so a lone hot/noisy pixel cannot validate itself),
3. running max over slices (``lax.cummax`` — latest neighbour firing up to
   each slice),
4. per-event gather + compare against ``t - delta_t``.

Everything is static-shaped, mask-aware (padded events neither vote nor
survive) and jittable; temporal quantization gives a one-slice-width
acceptance tolerance (events later in the SAME slice can validate), which
is the usual accuracy/parallelism trade and shrinks as ``n_slices`` grows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..errors import ConfigurationError

Array = jax.Array


def background_activity_filter(xs, ys, ts, delta_t,
                               sensor_size: Tuple[int, int] = (180, 240),
                               n_slices: int = 64, support: int = 1,
                               include_center: bool = False,
                               mask: Optional[Array] = None) -> Array:
    """Per-event keep mask of the spatiotemporal correlation filter.

    An event at ``(x, y, t)`` is kept iff some pixel within the
    ``(2*support+1)²`` neighbourhood carries an event in
    ``[t - delta_t, t]`` — up to the one-slice quantization tolerance
    described in the module docstring. The centre pixel never validates
    within its own slice (an event must not validate itself);
    ``include_center=True`` additionally counts same-pixel events from
    strictly earlier slices as support. Jittable: ``sensor_size``/
    ``n_slices``/``support``/``include_center`` are static, ``delta_t``
    may be traced.

    Args:
        xs, ys, ts: event coordinates and timestamps (any float/int dtype;
            times may be float64 epoch stamps — the filter works in
            float32 *relative* time internally).
        delta_t: correlation window in the units of ``ts``.
        mask: optional validity mask (``!= 0`` = real event); padded
            events get ``keep = False`` and never validate others.

    Returns:
        bool ``(N,)`` array — True = keep (signal), False = drop (noise).
    """
    if n_slices < 1:
        raise ConfigurationError(f"n_slices must be >= 1, got {n_slices}")
    if support < 1:
        raise ConfigurationError(f"support must be >= 1, got {support}")
    H, W = int(sensor_size[0]), int(sensor_size[1])
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    if not isinstance(ts, jax.Array):
        # Host float64 epoch stamps: subtract the origin IN FLOAT64 before
        # any device cast — jnp.asarray would quantize ~1.7e9 s stamps to
        # ~128 s resolution under the default x64-disabled config, folding
        # the whole recording into one slice.
        import numpy as _np

        ts_np = _np.asarray(ts)
        if ts_np.dtype == _np.float64 and ts_np.size:
            sel = ts_np if mask is None else ts_np[_np.asarray(mask) != 0]
            ts = ts_np - (sel.min() if sel.size else 0.0)
    ts64 = jnp.asarray(ts)
    valid = jnp.ones(ts64.shape, bool) if mask is None else (
        jnp.asarray(mask) != 0)

    # Relative float32 time.
    t0 = jnp.min(jnp.where(valid, ts64, jnp.inf))
    t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
    t = (ts64 - t0).astype(jnp.float32)
    t1 = jnp.max(jnp.where(valid, t, -jnp.inf))
    t1 = jnp.where(jnp.isfinite(t1), t1, 0.0)
    slice_dt = jnp.maximum(t1, 1e-30) / n_slices
    q = jnp.clip((t / slice_dt).astype(jnp.int32), 0, n_slices - 1)

    xi = jnp.clip(xs.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(ys.astype(jnp.int32), 0, H - 1)
    # xs < W (not <= W-1): fractional coords in (W-1, W) rasterize to the
    # last pixel, matching every scatter kernel in ops/.
    in_frame = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H) & valid
    flat = q * (H * W) + yi * W + xi
    flat = jnp.where(in_frame, flat, n_slices * H * W)  # OOB -> dropped

    last = jnp.full((n_slices * H * W,), -jnp.inf, jnp.float32)
    last = last.at[flat].max(t, mode="drop").reshape(n_slices, H, W)

    r = int(support)
    padded = jnp.pad(last, ((0, 0), (r, r), (r, r)),
                     constant_values=-jnp.inf)
    ring = jnp.full_like(last, -jnp.inf)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                # Never in `ring`: the event's own scattered timestamp
                # would validate itself (keep == in_frame, a no-op filter).
                continue
            ring = jnp.maximum(
                ring, padded[:, r + dy:r + dy + H, r + dx:r + dx + W])
    latest = jax.lax.cummax(ring, axis=0)  # latest support up to slice s
    if include_center:
        # Same-pixel support from STRICTLY EARLIER slices only (shift the
        # centre cummax by one slice) — same-slice same-pixel history is
        # indistinguishable from the event itself under quantization.
        cum_center = jax.lax.cummax(last, axis=0)
        prev_center = jnp.concatenate(
            [jnp.full((1, H, W), -jnp.inf, last.dtype), cum_center[:-1]], 0)
        latest = jnp.maximum(latest, prev_center)

    support_t = latest.reshape(-1)[jnp.minimum(flat, n_slices * H * W - 1)]
    keep = support_t >= t - jnp.asarray(delta_t, jnp.float32)
    return keep & in_frame


def filter_background_activity(xs, ys, ts, ps, delta_t,
                               sensor_size: Tuple[int, int] = (180, 240),
                               **kwargs):
    """Host convenience: apply :func:`background_activity_filter` and
    return the surviving ``(xs, ys, ts, ps)`` (same family as
    ``utils.event_util.remove_hot_pixels``)."""
    import numpy as np

    keep = np.asarray(background_activity_filter(
        xs, ys, ts, delta_t, sensor_size=sensor_size, **kwargs))
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    return xs[keep], ys[keep], ts[keep], ps[keep]
