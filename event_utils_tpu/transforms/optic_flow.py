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

    SIGN CONVENTION (reference-faithful, worth knowing): with the default
    ``t0 = t_last``, ``dt <= 0``, so this moves events AGAINST the sampled
    flow. Events from a feature moving at true scene velocity ``+v`` align
    (motion-compensate) only when ``flow_field = -v`` — i.e. the function
    treats its input as *backward* flow. To compensate a *forward* flow
    (the simulator's ground truth, `linvel_warp`'s recovered params, what
    `contrast_flow_loss` trains EVFlowNet to emit), pass ``-flow_field``.

    @param flow_field ``(2, H, W)`` array: channel 0 = x-flow u, channel 1 =
        y-flow v (extra leading singleton dims are squeezed, as the reference
        unsqueezes to NCHW).
    @param t0 Reference time (defaults to the last valid event's timestamp;
        an all-masked window falls back to 0, keeping warps finite).
    @returns ``(warped_xs, warped_ys)``.
    """
    del ps

    def _flatten(a):
        # The reference squeezes only multi-dim inputs (optic_flow.py:23-24);
        # an unconditional squeeze would collapse single-event (1,) arrays
        # to 0-d and crash/return scalars.
        a = jnp.asarray(a, jnp.float32)
        return a.reshape(-1) if a.ndim != 1 else a

    xs, ys, ts = _flatten(xs), _flatten(ys), _flatten(ts)
    flow_field = jnp.asarray(flow_field, jnp.float32)
    while flow_field.ndim > 3:
        flow_field = flow_field.squeeze(0)
    if t0 is None:
        if mask is None:
            t0 = ts[-1]
        else:
            any_valid = jnp.any(mask != 0)
            t0 = jnp.where(any_valid,
                           jnp.max(jnp.where(mask != 0, ts, -jnp.inf)), 0.0)

    # Reference parity for out-of-range events: grid_sample defaults to
    # padding_mode='zeros', so samples outside the field bilinearly fade to
    # zero flow over the border pixel and are exactly zero beyond — events
    # far outside stay put (align_corners only affects in-range coordinate
    # mapping, not padding). A zero ring + shifted clamped gather
    # reproduces this exactly.
    H, W = flow_field.shape[-2:]
    padded = jnp.pad(flow_field, ((0, 0), (1, 1), (1, 1)))
    cx = jnp.clip(xs + 1.0, 0.0, W + 1.0)
    cy = jnp.clip(ys + 1.0, 0.0, H + 1.0)
    u = bilinear_gather(cx, cy, padded[0])
    v = bilinear_gather(cx, cy, padded[1])
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
    if batched or batch_indices is not None:
        raise NotImplementedError(
            "batched warp_events_flow_torch is not supported; vmap "
            "warp_events_flow over the batch axis instead")
    return warp_events_flow(xt, yt, tt, pt, flow_field, t0=t0, **kw)
