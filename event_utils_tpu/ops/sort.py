"""Nearly-sorted time ordering for event streams on TPU.

XLA's global sort maps poorly onto the TPU vector unit (one long
bitonic network); a 2M-element float argsort costs ~100 ms on a v5e —
the measured cliff behind the "sorted densify at 18 Mev/s" row
(BENCH_r03). But densified streams are not random: every synthetic
event is a bounded time-jitter away from a sorted source event
(reference event_augmentation.py:118-157 draws the jitter from
``N(0, ts_std)``), so the doubled stream is *k-sorted* — every element
sits within a computable rank distance ``D`` of its final position.

A k-sorted array is fully sorted by two passes of DISJOINT block sorts
(block ``B >= 2 D``, second pass offset by ``B/2``): pass one makes
each block internally sorted, and any residual inversion then spans at
most one block boundary within ``D`` of it, which the offset pass's
block (boundary +- B/2 >= D) contains and fixes. Row sorts of shape
``(M, B)`` vectorize across the ``M`` lanes, so the cost scales like a
*small* sort times one, not a big sort — 10-30x the global argsort's
throughput at the bench's densities.

Correctness is not left to the displacement analysis alone:
:func:`nearly_sorted_argsort` re-checks monotonicity of its own output
on device and falls back to the global argsort via ``lax.cond`` if the
caller's ``block`` underestimated ``D`` — the fast path is an
optimization, never a behavior change. Sorts are stable throughout
(ties keep source order), preserving the framework's determinism
guarantee for downstream scatter ordering.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nearly_sorted_argsort", "nearly_sorted_sort", "time_sort",
           "displacement_bound", "MAX_SORT_BLOCK"]

# Largest useful block: beyond this the two row-sort passes cost about as
# much as one global sort, so callers should fall back.
MAX_SORT_BLOCK = 1 << 14


def _row_sorted(keys, payloads, block):
    """Stable-sort disjoint ``block``-sized rows of a flat (padded) array,
    carrying ``payloads`` (tuple). Length must be a multiple of ``block``."""
    m = keys.shape[0] // block
    out = jax.lax.sort(tuple(a.reshape(m, block) for a in (keys,) + payloads),
                       dimension=1, is_stable=True, num_keys=1)
    return tuple(a.reshape(-1) for a in out)


def time_sort(keys, *payloads):
    """Stable global sort of ``keys`` carrying ``payloads`` — ONE fused
    ``lax.sort`` instead of argsort + per-array gathers. On TPU the gathers
    are the dominant cost of the argsort formulation (measured: the full
    densify re-sort goes ~18 -> ~150 Mev/s on v5e-1 from this change
    alone), so every sort in the package carries payloads through
    ``lax.sort`` rather than materializing a permutation. jit-safe.

    Returns ``(sorted_keys, *permuted_payloads)``.
    """
    return jax.lax.sort((jnp.asarray(keys),)
                        + tuple(jnp.asarray(p) for p in payloads),
                        dimension=0, is_stable=True, num_keys=1)


def nearly_sorted_sort(keys, *payloads, block: int):
    """Stable sort of a k-sorted ``keys`` (displacement <= ``block // 2``)
    carrying ``payloads``, with the on-device exactness check of
    :func:`nearly_sorted_argsort` (falls back to :func:`time_sort` via
    ``lax.cond`` if the displacement bound was violated). jit-safe
    (``block`` static). Returns ``(sorted_keys, *permuted_payloads)``."""
    n = int(keys.shape[0])
    block = int(block)
    keys = jnp.asarray(keys)
    payloads = tuple(jnp.asarray(p) for p in payloads)
    if block < 2 or n <= block:
        return time_sort(keys, *payloads)
    half = block // 2
    pad_tail = (-n) % block
    inf = jnp.asarray(jnp.inf, keys.dtype)

    def pad(a, lo, hi, fill_lo, fill_hi):
        return jnp.concatenate([jnp.full((lo,), fill_lo, a.dtype), a,
                                jnp.full((hi,), fill_hi, a.dtype)])

    kp = pad(keys, 0, pad_tail, inf, inf)
    pp = tuple(pad(p, 0, pad_tail, 0, 0) for p in payloads)
    out1 = _row_sorted(kp, pp, block)
    # offset pass: pad the head with -inf / the tail with +inf so blocks
    # straddle the first pass's boundaries
    k1 = pad(out1[0], half, block - half, -inf, inf)
    p1 = tuple(pad(p, half, block - half, 0, 0) for p in out1[1:])
    out2 = _row_sorted(k1, p1, block)
    k2 = out2[0][half:half + n]
    p2 = tuple(p[half:half + n] for p in out2[1:])
    ok = jnp.all(k2[1:] >= k2[:-1]) if n > 1 else jnp.asarray(True)
    return jax.lax.cond(ok, lambda: (k2,) + p2,
                        lambda: time_sort(keys, *payloads))


def nearly_sorted_argsort(keys, block: int):
    """Stable argsort of a k-sorted ``keys`` array (displacement <=
    ``block // 2``), with an on-device exactness check.

    Returns ``order`` such that ``keys[order]`` is non-decreasing and ties
    keep their source order. Two disjoint block-sort passes (the second
    offset ``block // 2`` via +-inf padding, not a wrap-around roll);
    if the result fails the monotonicity check — the displacement bound
    was wrong — a ``lax.cond`` branch re-runs the global stable argsort,
    so the output is correct for ANY input, just slower. jit-safe
    (``block`` must be static).
    """
    n = int(keys.shape[0])
    block = int(block)
    if block < 2 or n <= block:
        return jnp.argsort(keys, stable=True)
    half = block // 2
    keys = jnp.asarray(keys)
    pad_tail = (-n) % block
    inf = jnp.asarray(jnp.inf, keys.dtype)
    kp = jnp.concatenate([keys, jnp.full((pad_tail,), inf, keys.dtype)])
    ip = jnp.arange(n + pad_tail, dtype=jnp.int32)
    k1, i1 = _row_sorted(kp, (ip,), block)
    # offset pass: pad the head with -inf / the tail with +inf so blocks
    # straddle the first pass's boundaries (a roll would wrap the largest
    # keys into the first block)
    k1 = jnp.concatenate([jnp.full((half,), -inf, keys.dtype), k1,
                          jnp.full((block - half,), inf, keys.dtype)])
    i1 = jnp.concatenate([jnp.zeros((half,), jnp.int32), i1,
                          jnp.zeros((block - half,), jnp.int32)])
    k2, i2 = _row_sorted(k1, (i1,), block)
    k2 = k2[half:half + n]
    order = i2[half:half + n]
    ok = jnp.all(k2[1:] >= k2[:-1]) if n > 1 else jnp.asarray(True)
    return jax.lax.cond(ok, lambda: order,
                        lambda: jnp.argsort(keys, stable=True)
                        .astype(jnp.int32))


def displacement_bound(ts_sorted, delta, copies: int = 2) -> jnp.ndarray:
    """Max rank displacement of a stream built from ``copies`` interleaved
    per-event copies of the sorted ``ts_sorted``, each perturbed by at most
    ``delta`` in time.

    Elements ``j < k`` of such a stream can invert only if their
    unperturbed times are within ``2 * delta``, so the displacement is
    bounded by the densest ``+-2 delta`` time window, times ``copies``.
    One vectorized double-searchsorted — O(N log N) gathers, device-side;
    returns a scalar (int32) array so eager callers can pick a static
    block size with one host sync.

    Non-finite entries (``+inf`` pad-slot sentinels, the masked-stream key
    convention) are excluded from the max: tail pads are already in their
    final positions and must not inflate the bound. The FINITE prefix must
    still be sorted — callers with interior mask holes fall back to the
    global sort instead (see ``add_correlated_events_jax``).
    """
    ts_sorted = jnp.asarray(ts_sorted)
    w = 2.0 * delta
    hi = jnp.searchsorted(ts_sorted, ts_sorted + w, side="right")
    lo = jnp.searchsorted(ts_sorted, ts_sorted - w, side="left")
    span = jnp.where(jnp.isfinite(ts_sorted), hi - lo, 0)
    return (jnp.max(span) * copies).astype(jnp.int32)


def sort_block_for(ts_sorted, delta, copies: int = 2,
                   max_block: int = MAX_SORT_BLOCK) -> Optional[int]:
    """Static block size for :func:`nearly_sorted_argsort` over a stream
    of ``copies`` interleaved jittered copies of ``ts_sorted`` (host sync:
    eager callers only). ``None`` means the stream is too dense for the
    fast path — use the global argsort."""
    d = int(displacement_bound(ts_sorted, delta, copies))
    block = 1 << int(np.ceil(np.log2(max(2 * d, 2))))
    return block if block <= max_block else None
