"""Temporally-bilinear voxel grids.

TPU-native rebuild of reference ``lib/representations/voxel_grid.py``.

The reference forms a B-bin grid with one full-stream scatter per bin
(voxel_grid.py:136-142: per-bin weights ``max(0, 1-|t_norm-bi|)``). Since the
temporal-bilinear weight is nonzero for at most the two bins bracketing each
event, the rebuild scatters each event into exactly two (bin, y, x) cells of a
single flattened ``B*H*W`` accumulator — one fused kernel launch instead of B,
and mathematically identical (fp32 tolerance).

Like the reference's torch path (voxel_grid.py:140-142 calls
``events_to_image_torch`` with default ``interpolation=None``), spatial
accumulation truncates coordinates to integers; pass
``spatial_interpolation='bilinear'`` for 4-tap spatial splatting (new
capability).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scatter import scatter_add_flat

# Spatial tile of the multi-tile MXU voxel builder (events_to_voxel_tiled)
# and of the auto-route's "would the tiled builder fit VMEM?" guard. Best
# median across the benchmarks/bench_tiled.py sweep on v5e.
DEFAULT_TILE = (96, 128)

Array = jax.Array


def events_to_voxel(xs, ys, ts, ps, B: int, sensor_size=(180, 240),
                    temporal_bilinear: bool = True,
                    spatial_interpolation: Optional[str] = None,
                    mask: Optional[Array] = None,
                    t0: Optional[Array] = None, t1: Optional[Array] = None,
                    impl: Optional[str] = None) -> Array:
    """Turn events into a ``(B, H, W)`` voxel grid.

    Matches reference ``events_to_voxel_torch`` (voxel_grid.py:114-153):
    ``t_norm = (ts - t_first) / (t_last - t_first) * (B-1)``; each event adds
    ``ps * max(0, 1 - |t_norm - bi|)`` to bin ``bi`` at its (integer) pixel.
    With ``temporal_bilinear=False``, events are assigned to B equal-duration
    slices (the reference's intent at voxel_grid.py:143-150, whose torch
    branch is dead code — rebuilt here correctly).

    @param mask Optional per-event validity mask (padded batches)
    @param t0, t1 Override the time window (default: first/last valid event)
    """
    H, W = sensor_size
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)

    if impl == "tiled":
        # Explicit large-sensor route (host bucketing; see
        # events_to_voxel_tiled for the restrictions it asserts).
        if not (temporal_bilinear and spatial_interpolation is None
                and mask is None and t0 is None and t1 is None):
            from ..errors import ConfigurationError
            raise ConfigurationError(
                "impl='tiled' supports only the default temporal-bilinear "
                "integer-coordinate path with no mask/t0/t1 overrides "
                "(host-side bucketing; call events_to_voxel_tiled directly "
                "for tile/capacity control)")
        return events_to_voxel_tiled(xs, ys, ts, ps, B, sensor_size)
    if impl in ("matmul", "matmul_hilo", "matmul_bf16", "matmul_int8") \
            and temporal_bilinear and spatial_interpolation is None:
        # Pallas MXU kernel (ops/pallas_scatter.py): requires time-sorted
        # events (true for every reader/loader in this framework).
        from ..ops.pallas_scatter import voxel_matmul, voxel_matmul_max_chunk
        if voxel_matmul_max_chunk(B, sensor_size) is not None:
            precision = {"matmul": "hilo", "matmul_hilo": "hilo",
                         "matmul_bf16": "bf16", "matmul_int8": "int8"}[impl]
            return voxel_matmul(xs, ys, ts, ps, B, sensor_size=sensor_size,
                                mask=mask, t0=t0, t1=t1, precision=precision)
        # Sensor too large for the one-hot formulation's VMEM working set.
        # Outside jit with no overrides the spatially-tiled builder restores
        # MXU rates (host counting-sort per tile) — provided the default
        # tile itself fits at this bin count; under tracing, with mask/t0/t1
        # overrides, or for huge B, degrade to the exact scatter.
        concrete = not any(isinstance(a, jax.core.Tracer)
                           for a in (xs, ys, ts, ps))
        if (concrete and mask is None and t0 is None and t1 is None
                and voxel_matmul_max_chunk(B, DEFAULT_TILE) is not None):
            return events_to_voxel_tiled(xs, ys, ts, ps, B, sensor_size)
        import warnings
        warnings.warn(
            f"events_to_voxel: sensor {tuple(sensor_size)} x {B} bins "
            "exceeds the MXU kernel's VMEM budget, and the tiled builder "
            "requires concrete (non-traced) inputs, no mask/t0/t1 "
            "overrides, and a tile that fits VMEM at this bin count; "
            "using the exact XLA scatter. Pass impl=None to silence.",
            stacklevel=2)
        impl = None
    if impl == "matmul_int8":
        # int8 exists only for the temporal-bilinear Pallas kernel above;
        # every other route maps it to the hilo path (same tolerance class)
        impl = "matmul"

    if t0 is None or t1 is None:
        if mask is None:
            t_first, t_last = ts[0], ts[-1]
        else:
            big = jnp.float32(jnp.finfo(jnp.float32).max)
            t_first = jnp.min(jnp.where(mask != 0, ts, big))
            t_last = jnp.max(jnp.where(mask != 0, ts, -big))
        t0 = t_first if t0 is None else t0
        t1 = t_last if t1 is None else t1
    dt = t1 - t0
    dt = jnp.where(dt == 0, 1.0, dt)

    if mask is not None:
        ps = ps * jnp.asarray(mask, ps.dtype)

    ixs = jnp.trunc(xs.astype(jnp.float32)).astype(jnp.int32)
    iys = jnp.trunc(ys.astype(jnp.float32)).astype(jnp.int32)
    in_img = (ixs >= 0) & (ixs < W) & (iys >= 0) & (iys < H)

    if temporal_bilinear:
        t_norm = (ts - t0) / dt * (B - 1)
        b0 = jnp.floor(t_norm)
        fb = (t_norm - b0).astype(ps.dtype)
        ib0 = b0.astype(jnp.int32)

        if spatial_interpolation == "bilinear":
            from ..ops.scatter import bilinear_scatter
            fx = xs.astype(jnp.float32)
            fy = ys.astype(jnp.float32)
            # Bin stride H+1 (not H): each bin gets one guard row so that a
            # y0+1 tap of an event with fy in (H-1, H) lands in its own
            # bin's guard row (sliced away) instead of crossing into the
            # NEXT bin's row 0, and a y0 tap of fy in (-1, 0) lands in the
            # previous bin's guard row instead of its last row.
            SH = H + 1
            # events with no valid y tap (fy <= -1 or fy >= H) must be
            # dropped entirely — one guard row only absorbs single-row
            # spill, anything further would alias into a neighbouring bin
            y_ok = (fy > -1.0) & (fy < H)
            flat = []
            for ib, wb in ((ib0, 1.0 - fb), (ib0 + 1, fb)):
                bin_ok = (ib >= 0) & (ib < B) & y_ok
                m = jnp.where(bin_ok, 1.0, 0.0)
                flat.append((fx, fy + jnp.clip(ib, 0, B - 1).astype(jnp.float32) * SH,
                             ps * wb * m))
            img = bilinear_scatter(
                jnp.concatenate([f[0] for f in flat]),
                jnp.concatenate([f[1] for f in flat]),
                jnp.concatenate([f[2] for f in flat]),
                (B * SH, W), impl=impl)
            return img.reshape(B, SH, W)[:, :H, :]

        # Integer-coordinate path (reference parity): 2 temporal taps.
        flat_px = iys * W + ixs
        ids, ws = [], []
        for ib, wb in ((ib0, 1.0 - fb), (ib0 + 1, fb)):
            ok = in_img & (ib >= 0) & (ib < B)
            ids.append(jnp.where(ok, ib * (H * W) + flat_px, -1))
            ws.append(ps * wb)
        flat = scatter_add_flat(jnp.concatenate(ids), jnp.concatenate(ws),
                                B * H * W, impl=impl)
        return flat.reshape(B, H, W)

    # Equal-duration slice binning (non-bilinear).
    bin_idx = jnp.clip(((ts - t0) / dt * B).astype(jnp.int32), 0, B - 1)
    if impl in ("matmul", "matmul_hilo", "matmul_bf16"):
        # MXU route: flat id bin*H*W + iy*W + ix == (bin*H + iy)*W + ix, so
        # the whole grid is one (B*H, W) image scatter; out-of-image events
        # get row -1 (dropped) so they cannot alias into another bin's rows.
        from ..ops.scatter import scatter_add_2d
        iy_eff = jnp.where(in_img, bin_idx * H + iys, -1)
        img = scatter_add_2d(jnp.where(in_img, ixs, -1), iy_eff, ps,
                             (B * H, W), impl=impl)
        return img.reshape(B, H, W)
    ok = in_img
    ids = jnp.where(ok, bin_idx * (H * W) + iys * W + ixs, -1)
    flat = scatter_add_flat(ids, ps, B * H * W, impl=impl)
    return flat.reshape(B, H, W)


def events_to_voxel_tiled(xs, ys, ts, ps, B: int, sensor_size,
                          tile=DEFAULT_TILE, impl: str = "matmul",
                          capacity=None):
    """Voxel grid for ANY sensor size via spatial tiling — the fast ingest
    path.

    The one-hot-matmul kernel's cost is ~``6*HP*WP`` FLOPs/event, so
    running it per TILE both (a) restores MXU rates beyond the monolithic
    kernel's VMEM limit (~DAVIS346) and (b) beats the monolithic kernel
    outright on small sensors (fewer FLOPs/event — measured 3-4x at
    DAVIS240/346, r3). Events are bucketed by sensor tile on the host (one
    counting-sort pass — ``native.evio_bucket_fill`` at memcpy speed —
    preserving time order within each tile), then ONE Pallas launch
    (``voxel_matmul_tiles``, 2-D grid over (tile, chunk)) accumulates every
    tile and the result is stitched.

    On-device bucketing was measured and rejected (r3): ``argsort`` by tile
    id costs 84 ms for 2M events on a v5e (25 Mev/s — the TPU sort, not the
    kernel, would dominate), and a cumsum-rank + unique-scatter formulation
    did not finish compiling in 7 min. Host bucketing breaks jit-ability —
    this is an ingest-path builder (like the loaders), not a loss-path one
    (no VJP). Returns ``(B, H, W)``.
    """
    from ..contrast_max.events_cmax import bucket_events_by_roi
    from ..ops.pallas_scatter import voxel_matmul_max_chunk, voxel_matmul_tiles

    H, W = sensor_size
    th, tw = tile
    if voxel_matmul_max_chunk(B, tile) is None:
        from ..errors import SensorLimitError
        raise SensorLimitError(f"tile {tile} itself exceeds the VMEM "
                               "budget; use a smaller tile")
    ny = (H + th - 1) // th
    nx = (W + tw - 1) // tw
    ts = np.asarray(ts, np.float64)
    t0 = float(ts[0]) if len(ts) else 0.0
    t1 = float(ts[-1]) if len(ts) else 1.0
    bx, by, bt, bp, bmask, origins, overflow = bucket_events_by_roi(
        xs, ys, ts, ps, (ny * th, nx * tw), tile, capacity=capacity,
        capacity_cap=None)
    if overflow:
        # an accumulating representation must never subsample mass (the
        # overflow path uniform-subsamples, which is only valid for
        # contrast objectives)
        from ..errors import ConfigurationError
        raise ConfigurationError(
            f"events_to_voxel_tiled: capacity={capacity} drops {overflow} "
            "events in the densest tile; pass capacity=None (auto) or a "
            "larger value")
    ox = jnp.asarray(origins[:, 1:2], jnp.int32)   # (T, 1) broadcast
    oy = jnp.asarray(origins[:, 0:1], jnp.int32)

    precision = {"matmul": "hilo", "matmul_hilo": "hilo",
                 "matmul_bf16": "bf16", "matmul_int8": "int8"}.get(impl,
                                                                   "hilo")
    tiles = voxel_matmul_tiles(
        jnp.asarray(bx, jnp.int32) - ox, jnp.asarray(by, jnp.int32) - oy,
        bt, bp, B, tile, jnp.float32(t0), jnp.float32(t1), mask=bmask,
        precision=precision)
    # stitch (ny*nx, B, th, tw) -> (B, ny*th, nx*tw) -> crop to (B, H, W)
    grid = tiles.reshape(ny, nx, B, th, tw).transpose(2, 0, 3, 1, 4)
    return grid.reshape(B, ny * th, nx * tw)[:, :H, :W]


# Signature-compatible alias for the reference's torch entry point
# (voxel_grid.py:114: events_to_voxel_torch(xs, ys, ts, ps, B, device, ...)).
def events_to_voxel_torch(xs, ys, ts, ps, B, device=None,
                          sensor_size=(180, 240), temporal_bilinear=True, **kw):
    del device
    return events_to_voxel(xs, ys, ts, ps, B, sensor_size=sensor_size,
                           temporal_bilinear=temporal_bilinear, **kw)


def events_to_neg_pos_voxel(xs, ys, ts, ps, B: int, sensor_size=(180, 240),
                            temporal_bilinear: bool = True,
                            mask: Optional[Array] = None,
                            impl: Optional[str] = None):
    """Polarity-split voxel grids (reference voxel_grid.py:155-182).

    Positive events are ``ps > 0``, negative ``ps <= 0`` (the torch
    reference's convention; the numpy variant's ``np.where(ps, 1, 0)`` counts
    -1 polarities as positive — a catalogued bug, deliberately not
    replicated).
    Returns ``(voxel_pos, voxel_neg)``.
    """
    ps = jnp.asarray(ps, jnp.float32)
    pos_w = jnp.where(ps > 0, 1.0, 0.0)
    neg_w = jnp.where(ps <= 0, 1.0, 0.0)
    vp = events_to_voxel(xs, ys, ts, pos_w, B, sensor_size=sensor_size,
                         temporal_bilinear=temporal_bilinear, mask=mask, impl=impl)
    vn = events_to_voxel(xs, ys, ts, neg_w, B, sensor_size=sensor_size,
                         temporal_bilinear=temporal_bilinear, mask=mask, impl=impl)
    return vp, vn


def events_to_neg_pos_voxel_torch(xs, ys, ts, ps, B, device=None, **kw):
    del device
    return events_to_neg_pos_voxel(xs, ys, ts, ps, B, **kw)


def events_to_voxel_timesync(xs, ys, ts, ps, B: int, t0, t1, np_ts=None,
                             sensor_size=(180, 240),
                             temporal_bilinear: bool = True,
                             impl: Optional[str] = None) -> Array:
    """Voxel of the events between ``t0`` and ``t1``
    (reference voxel_grid.py:82-112).

    Host-side windowing (searchsorted slice) + device accumulation; prefer the
    mask/jit path (``events_to_voxel`` with ``mask``) inside compiled code.
    """
    assert t1 > t0
    np_ts = np.asarray(ts) if np_ts is None else np_ts
    start = int(np.searchsorted(np_ts, t0))
    end = int(np.searchsorted(np_ts, t1))
    assert start < end, "no events in [t0, t1)"
    return events_to_voxel(xs[start:end], ys[start:end], ts[start:end],
                           ps[start:end], B, sensor_size=sensor_size,
                           temporal_bilinear=temporal_bilinear, impl=impl)


events_to_voxel_timesync_torch = events_to_voxel_timesync


def voxel_grids_fixed_n(xs, ys, ts, ps, B: int, n: int,
                        sensor_size=(180, 240), temporal_bilinear: bool = True,
                        impl: Optional[str] = None):
    """Sequence of voxel grids over fixed-count windows
    (reference voxel_grid.py:37-57).

    TPU-first: the stream is reshaped to ``(num_windows, n)`` and a single
    vmapped kernel builds every grid at once (the reference loops in Python).
    Returns a ``(num_windows, B, H, W)`` array.
    """
    num = (len(xs) - n) // n + 1 if len(xs) >= n else 0
    if num <= 0:
        return jnp.zeros((0, B) + tuple(sensor_size))
    cut = num * n
    rx = jnp.asarray(xs[:cut]).reshape(num, n)
    ry = jnp.asarray(ys[:cut]).reshape(num, n)
    rt = jnp.asarray(ts[:cut]).reshape(num, n)
    rp = jnp.asarray(ps[:cut]).reshape(num, n)
    fn = jax.vmap(lambda a, b, c, d: events_to_voxel(
        a, b, c, d, B, sensor_size=sensor_size,
        temporal_bilinear=temporal_bilinear, impl=impl))
    return fn(rx, ry, rt, rp)


voxel_grids_fixed_n_torch = voxel_grids_fixed_n


def voxel_grids_fixed_t(xs, ys, ts, ps, B: int, t: float,
                        sensor_size=(180, 240), temporal_bilinear: bool = True,
                        impl: Optional[str] = None):
    """Sequence of voxel grids over fixed-duration windows
    (reference voxel_grid.py:59-80). Returns a list (ragged windows)."""
    np_ts = np.asarray(ts)
    voxels = []
    for t_start in np.arange(np_ts[0], np_ts[-1] - t, t):
        voxels.append(events_to_voxel_timesync(
            xs, ys, ts, ps, B, t_start, t_start + t, np_ts=np_ts,
            sensor_size=sensor_size, temporal_bilinear=temporal_bilinear,
            impl=impl))
    return voxels


voxel_grids_fixed_t_torch = voxel_grids_fixed_t


def get_voxel_grid_as_image(voxelgrid, normalize: bool = True):
    """Bins side-by-side debug image (reference voxel_grid.py:9-24)."""
    vg = np.asarray(voxelgrid)
    splitter = np.ones((vg.shape[1], 2)) * vg.max()
    parts = []
    for image in vg:
        parts.append(image)
        parts.append(splitter)
    parts.pop()
    sidebyside = np.hstack(parts)
    if normalize:
        mn, mx = sidebyside.min(), sidebyside.max()
        sidebyside = (sidebyside - mn) / max(mx - mn, 1e-12) * 255.0
    return sidebyside


def plot_voxel_grid(voxelgrid, cmap="gray", show: bool = True):
    """Display a voxel grid as side-by-side bins (reference voxel_grid.py:26-35)."""
    import matplotlib.pyplot as plt
    sidebyside = get_voxel_grid_as_image(voxelgrid)
    plt.imshow(sidebyside, cmap=cmap)
    if show:
        plt.show()
    return sidebyside
