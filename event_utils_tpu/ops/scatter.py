"""Scatter-add accumulation kernels — the compute core of the framework.

Every dense representation in the reference bottoms out in one of three
accumulation primitives (reference ``lib/representations/image.py``):

- 4-tap bilinear scatter-add          (``interpolate_to_image``, image.py:102-115)
- Jacobian-weighted bilinear scatter  (``interpolate_to_derivative_img``, image.py:117-136)
- integer scatter-add                 (``index_put_`` image.py:95 / ``np.bincount`` image.py:37)

Here they are rebuilt TPU-first:

* Static shapes: all functions take fixed-capacity arrays plus an optional
  validity ``mask``; invalid events scatter *nowhere* (index ``drop`` mode),
  not to pixel (0, 0) like the reference's coord-zeroing trick
  (reference objectives.py:188, image.py:83-85) — representation-layer
  callers expose ``legacy_mask=True`` where exact legacy output matters.
* One flattened 1-D scatter over ``H*W`` pixel ids per image — XLA lowers
  this to its native scatter-add; the MXU one-hot-matmul fast paths are
  selected with ``impl='matmul'``/``'matmul_hilo'`` (see matmul_scatter.py
  and pallas_scatter.py).
* Fully differentiable: gradients w.r.t. ``x``, ``y`` and ``w`` flow through
  the bilinear weights (the scatter-add VJP is a gather), so a jitted
  ``jax.grad`` of any IWE objective works out of the box.
* Deterministic: XLA TPU scatter-add accumulates in a fixed order, unlike
  CUDA atomics — bitwise-reproducible results are a stated guarantee
  (tested in tests/test_ops.py::test_scatter_determinism).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from ..errors import ConfigurationError

Array = jax.Array

_IMPLEMENTATIONS = ("xla", "sort", "pallas")
# MXU one-hot-matmul routes accepted by the 2-D/bilinear entry points.
# Unified semantics (same string -> same precision everywhere):
#   'matmul'       = hi/lo split, ~1e-5 relative   (the default fast path)
#   'matmul_hilo'  = explicit alias of 'matmul'
#   'matmul_bf16'  = single bf16 pass, ~2e-3 relative (fastest, opt-in)
_MATMUL_IMPLS = ("matmul", "matmul_hilo", "matmul_bf16")
_DEFAULT_IMPL = "xla"


def _matmul_precision(impl: str) -> str:
    return "bf16" if impl == "matmul_bf16" else "hilo"


def set_default_impl(impl: str) -> None:
    """Select the default scatter implementation ('xla', 'sort' or 'pallas')."""
    global _DEFAULT_IMPL
    if impl not in _IMPLEMENTATIONS:
        raise ConfigurationError(
            f"impl must be one of {_IMPLEMENTATIONS}, got {impl!r}")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


# ---------------------------------------------------------------------------
# Flat scatter core
# ---------------------------------------------------------------------------

def scatter_add_flat(idx: Array, w: Array, num_buckets: int, *,
                     impl: Optional[str] = None) -> Array:
    """Sum ``w`` into ``num_buckets`` buckets by integer id ``idx``.

    Out-of-range ids (negative or >= num_buckets) are dropped. This is the
    single primitive behind every image/voxel accumulation.
    """
    impl = impl or _DEFAULT_IMPL
    if impl not in _IMPLEMENTATIONS:
        raise ConfigurationError(
            f"scatter_add_flat impl must be one of {_IMPLEMENTATIONS}, got "
            f"{impl!r} (the matmul fast paths exist only for the 2-D/bilinear "
            "entry points — a flat scatter has no factorized form)")
    idx = idx.astype(jnp.int32)
    # JAX wraps negative indices before the drop-mode bounds check; remap all
    # invalid ids to num_buckets so they are reliably dropped.
    idx = jnp.where(idx < 0, num_buckets, idx)
    if impl == "sort":
        return _scatter_add_flat_sorted(idx, w, num_buckets)
    if impl == "pallas":
        from . import pallas_scatter
        return pallas_scatter.scatter_add_flat_pallas(idx, w, num_buckets)
    out = jnp.zeros((num_buckets,), dtype=w.dtype)
    return out.at[idx].add(w, mode="drop")


def _scatter_add_flat_sorted(idx: Array, w: Array, num_buckets: int) -> Array:
    """Sort-based segment-sum scatter (deterministic, collision-free).

    sort (idx, w) by idx -> cumulative sum -> per-bucket total via a
    vectorized binary search of bucket boundaries. O(N log N) but every step
    is a dense vector op, no serialized scatter.
    """
    # Map dropped ids past the end so they sort to the tail.
    idx = jnp.where((idx < 0) | (idx >= num_buckets), num_buckets, idx)
    order = jnp.argsort(idx)
    idx_s = idx[order]
    w_s = w[order]
    csum = jnp.cumsum(w_s.astype(jnp.float32))
    # boundary[b] = first position with idx_s >= b  (searchsorted 'left')
    boundaries = jnp.searchsorted(idx_s, jnp.arange(num_buckets + 1, dtype=idx.dtype))
    csum0 = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum])
    totals = csum0[boundaries[1:]] - csum0[boundaries[:-1]]
    return totals.astype(w.dtype)


# ---------------------------------------------------------------------------
# 2-D integer scatter
# ---------------------------------------------------------------------------

def scatter_add_2d(ix: Array, iy: Array, w: Array, shape: Tuple[int, int], *,
                   mask: Optional[Array] = None,
                   impl: Optional[str] = None) -> Array:
    """Integer scatter-add into an ``(H, W)`` image.

    Equivalent of reference ``img.index_put_((ys, xs), ps, accumulate=True)``
    (image.py:95) with out-of-bounds events dropped rather than wrapped.

    ``ix``/``iy`` are truncated toward zero if floating (matching torch's
    ``.long()`` cast at image.py:89-91).
    """
    H, W = shape
    ix = ix.astype(jnp.int32) if jnp.issubdtype(ix.dtype, jnp.integer) else jnp.trunc(ix).astype(jnp.int32)
    iy = iy.astype(jnp.int32) if jnp.issubdtype(iy.dtype, jnp.integer) else jnp.trunc(iy).astype(jnp.int32)
    oob = (ix < 0) | (ix >= W) | (iy < 0) | (iy >= H)
    if mask is not None:
        oob = oob | (mask == 0)
    if (impl or _DEFAULT_IMPL) in _MATMUL_IMPLS:
        from .pallas_scatter import image_matmul
        w = jnp.where(oob, 0.0, jnp.asarray(w, jnp.float32))
        return image_matmul(jnp.where(oob, 0, ix), jnp.where(oob, 0, iy), w,
                            shape, precision=_matmul_precision(impl))
    flat = jnp.where(oob, -1, iy * W + ix)
    img = scatter_add_flat(flat, w, H * W, impl=impl)
    return img.reshape(H, W)


# ---------------------------------------------------------------------------
# Bilinear scatter
# ---------------------------------------------------------------------------

def _bilinear_taps(x: Array, y: Array, w: Array, shape: Tuple[int, int],
                   mask: Optional[Array]):
    """Return the 4 (flat index, weight) tap pairs of bilinear interpolation.

    Taps falling outside ``shape`` get index -1 (dropped by the scatter).
    Weights follow reference image.py:111-114:
      (x0,y0): w(1-dx)(1-dy)   (x0+1,y0): w dx (1-dy)
      (x0,y0+1): w(1-dx)dy     (x0+1,y0+1): w dx dy
    """
    H, W = shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(w.dtype)
    dy = (y - y0).astype(w.dtype)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    if mask is not None:
        w = w * mask.astype(w.dtype)

    wx = (1.0 - dx, dx)
    wy = (1.0 - dy, dy)
    idxs, ws = [], []
    for oy in (0, 1):
        for ox in (0, 1):
            ix = ix0 + ox
            iy = iy0 + oy
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            if mask is not None:
                valid = valid & (mask != 0)
            idxs.append(jnp.where(valid, iy * W + ix, -1))
            ws.append(w * wx[ox] * wy[oy])
    return idxs, ws


def bilinear_scatter(x: Array, y: Array, w: Array, shape: Tuple[int, int], *,
                     mask: Optional[Array] = None,
                     impl: Optional[str] = None) -> Array:
    """4-tap bilinear scatter-add of weights ``w`` at float coords ``(x, y)``.

    TPU-native equivalent of reference ``interpolate_to_image``
    (image.py:102-115). Differentiable in ``x``, ``y`` and ``w``.
    Out-of-image taps are dropped (no wraparound, no origin-pixel dumping).

    ``impl='matmul'`` (alias ``'matmul_hilo'``, ~3e-5 relative) and
    ``'matmul_bf16'`` (~2e-3 relative, fastest) select the MXU
    one-hot-matmul fast paths; the default XLA scatter is exact.
    """
    impl = impl or _DEFAULT_IMPL
    if impl in _MATMUL_IMPLS:
        # Pallas kernel (VMEM-resident accumulator; ~2x the pure-XLA
        # lax.scan formulation in ops/matmul_scatter.py — an independent
        # same-factorization implementation kept as a parity cross-check
        # and for non-Pallas backends; oversized sensors fall back to the
        # exact scatter inside bilinear_matmul itself)
        from .pallas_scatter import bilinear_matmul
        return bilinear_matmul(x, y, w, shape, mask=mask,
                               precision=_matmul_precision(impl))
    H, W = shape
    idxs, ws = _bilinear_taps(x, y, w, shape, mask)
    flat_idx = jnp.concatenate(idxs)
    flat_w = jnp.concatenate(ws)
    img = scatter_add_flat(flat_idx, flat_w, H * W, impl=impl)
    return img.reshape(H, W)


def bilinear_scatter_derivative(x: Array, y: Array, jx: Array, jy: Array,
                                w: Array, shape: Tuple[int, int], *,
                                mask: Optional[Array] = None,
                                impl: Optional[str] = None) -> Array:
    """Jacobian-weighted bilinear scatter producing dIWE/dparams images.

    Equivalent of reference ``interpolate_to_derivative_img``
    (image.py:117-136): for each motion-parameter dimension k the image

        d_img[k] = Σ_n  w1[k,n] * dTap/dx + w2[k,n] * dTap/dy

    with ``w1 = jx*w``, ``w2 = jy*w`` and the signed bilinear-derivative tap
    weights of image.py:132-135.

    Args:
      jx, jy: Jacobians of the warped coords w.r.t. params, shape (D, N).
      w:      per-event weights (polarity), shape (N,).
    Returns:
      (D, H, W) derivative image stack.
    """
    H, W = shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(w.dtype)
    dy = (y - y0).astype(w.dtype)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    w1 = jx * w[None, :]
    w2 = jy * w[None, :]
    if mask is not None:
        m = mask.astype(w.dtype)[None, :]
        w1 = w1 * m
        w2 = w2 * m

    # Signed derivative weights of the four bilinear taps (image.py:132-135):
    #   tap (y0, x0):     w1*(-(1-dy)) + w2*(-(1-dx))
    #   tap (y0, x0+1):   w1*(1-dy)    + w2*(-dx)
    #   tap (y0+1, x0):   w1*(-dy)     + w2*(1-dx)
    #   tap (y0+1, x0+1): w1*dy        + w2*dx
    tap_wts = (
        (0, 0, -(1.0 - dy), -(1.0 - dx)),
        (0, 1, (1.0 - dy), -dx),
        (1, 0, -dy, (1.0 - dx)),
        (1, 1, dy, dx),
    )
    idxs, ws = [], []
    for oy, ox, a, b in tap_wts:
        ix = ix0 + ox
        iy = iy0 + oy
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        if mask is not None:
            valid = valid & (mask != 0)
        idxs.append(jnp.where(valid, iy * W + ix, -1))
        ws.append(w1 * a[None, :] + w2 * b[None, :])  # (D, N)

    flat_idx = jnp.concatenate(idxs)          # (4N,)
    flat_w = jnp.concatenate(ws, axis=1)      # (D, 4N)

    if (impl or _DEFAULT_IMPL) in _MATMUL_IMPLS:
        # The signed derivative taps don't share the standard bilinear
        # row/column factorization, but the tap list is a plain flat
        # scatter — route it through the MXU flat-scatter kernel rather
        # than rejecting the impl (hilo ~1e-5 relative). Python loop over
        # the small D axis: vmapping a program_id(0)-gated Pallas kernel
        # would turn the batch into a grid dim and skip the accumulator
        # zeroing.
        from .pallas_scatter import scatter_add_flat_pallas
        prec = _matmul_precision(impl or _DEFAULT_IMPL)
        return jnp.stack([
            scatter_add_flat_pallas(flat_idx, flat_w[d], H * W,
                                    precision=prec).reshape(H, W)
            for d in range(flat_w.shape[0])])

    def one_dim(wd):
        return scatter_add_flat(flat_idx, wd, H * W, impl=impl).reshape(H, W)

    return jax.vmap(one_dim)(flat_w)


# ---------------------------------------------------------------------------
# Bilinear gather (the reverse op)
# ---------------------------------------------------------------------------

def bilinear_gather(x: Array, y: Array, img: Array, *,
                    mask: Optional[Array] = None) -> Array:
    """Sample ``img`` at float coords with 4-tap bilinear interpolation.

    Equivalent of reference ``image_to_event_weights`` (image.py:138-160) and
    the per-event ``F.grid_sample`` lookup (transforms/optic_flow.py:40).
    Out-of-image taps contribute 0; fully masked/out-of-range events return 0.
    """
    H, W = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    def tap(oy, ox, wt):
        ix = jnp.clip(ix0 + ox, 0, W - 1)
        iy = jnp.clip(iy0 + oy, 0, H - 1)
        valid = ((ix0 + ox) >= 0) & ((ix0 + ox) < W) & ((iy0 + oy) >= 0) & ((iy0 + oy) < H)
        v = img[..., iy, ix]
        return jnp.where(valid, v, 0.0) * wt

    out = (tap(0, 0, (1 - dx) * (1 - dy)) + tap(0, 1, dx * (1 - dy))
           + tap(1, 0, (1 - dx) * dy) + tap(1, 1, dx * dy))
    if mask is not None:
        out = out * mask.astype(out.dtype)
    return out
