"""Dense-optic-flow event warping.

Rebuild of reference ``lib/transforms/optic_flow.py``. The reference looks up
per-event flow with ``F.grid_sample(align_corners=True)`` over coordinates
normalized to [-1, 1] (optic_flow.py:36-40); with align_corners that is
mathematically identical to a direct bilinear gather at pixel coordinates,
which is what the TPU path does (one fused 4-tap gather, no normalization
round-trip).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.scatter import bilinear_gather

Array = jax.Array


def warp_events_flow(xs, ys, ts, ps, flow_field, t0=None,
                     mask: Optional[Array] = None) -> Tuple[Array, Array]:
    """Warp each event along the dense flow at its location
    (reference optic_flow.py:5-46):

        x' = x + u(x, y) * (t - t0),    y' = y + v(x, y) * (t - t0)

    @param flow_field ``(2, H, W)`` array: channel 0 = x-flow u, channel 1 =
        y-flow v (extra leading singleton dims are squeezed, as the reference
        unsqueezes to NCHW).
    @param t0 Reference time (defaults to the last event's timestamp).
    @returns ``(warped_xs, warped_ys)``.
    """
    del ps
    xs = jnp.asarray(xs, jnp.float32).squeeze()
    ys = jnp.asarray(ys, jnp.float32).squeeze()
    ts = jnp.asarray(ts, jnp.float32).squeeze()
    flow_field = jnp.asarray(flow_field, jnp.float32)
    while flow_field.ndim > 3:
        flow_field = flow_field.squeeze(0)
    if t0 is None:
        t0 = ts[-1] if mask is None else jnp.max(
            jnp.where(mask != 0, ts, -jnp.inf))

    # grid_sample(align_corners=True) clamps out-of-range samples to the
    # border; replicate by clamping coordinates to the valid range.
    H, W = flow_field.shape[-2:]
    cx = jnp.clip(xs, 0.0, W - 1.0)
    cy = jnp.clip(ys, 0.0, H - 1.0)
    u = bilinear_gather(cx, cy, flow_field[0])
    v = bilinear_gather(cx, cy, flow_field[1])
    dt = ts - t0
    xw = xs + u * dt
    yw = ys + v * dt
    if mask is not None:
        m = jnp.asarray(mask, xs.dtype)
        xw = jnp.where(m != 0, xw, xs)
        yw = jnp.where(m != 0, yw, ys)
    return xw, yw


# Reference-signature alias (optic_flow.py:5).
def warp_events_flow_torch(xt, yt, tt, pt, flow_field, t0=None, batched=False,
                           batch_indices=None, **kw):
    del batched, batch_indices
    return warp_events_flow(xt, yt, tt, pt, flow_field, t0=t0, **kw)
