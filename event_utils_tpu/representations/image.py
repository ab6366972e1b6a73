"""Dense event-image representations (event image, timestamp image, IWE).

TPU-native rebuild of reference ``lib/representations/image.py``. All
functions are jit-compatible (static shapes + optional validity mask) and
differentiable. Instead of the reference's numpy/torch dual backend, there is
one JAX implementation; the reference's two entry points are kept as
signature-compatible wrappers:

- ``events_to_image``        (numpy-style semantics, image.py:5-44)
- ``events_to_image_torch``  (torch-style semantics, image.py:46-100)

Masking policy: by default out-of-bounds events are *dropped* (zero
contribution). ``legacy_mask=True`` reproduces the reference's
coordinate-zeroing trick (image.py:83-85, 94) including its quirks (integer
route dumps the unmasked weight onto pixel (0, 0); integer route with
``padding=True`` drops the last row/column), for bit-parity testing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scatter import (
    bilinear_gather,
    bilinear_scatter,
    bilinear_scatter_derivative,
    scatter_add_2d,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Core accumulation
# ---------------------------------------------------------------------------

def _legacy_clip_mask(xs, ys, clipx, clipy):
    """Upper-bound-only clip mask of reference image.py:73-75."""
    return jnp.where(xs >= clipx, 0.0, 1.0) * jnp.where(ys >= clipy, 0.0, 1.0)


def events_to_image_torch(xs, ys, ps, device=None, sensor_size=(180, 240),
                          clip_out_of_range: bool = True,
                          interpolation: Optional[str] = None,
                          padding: bool = True, default: float = 0,
                          mask: Optional[Array] = None,
                          legacy_mask: bool = False,
                          impl: Optional[str] = None) -> Array:
    """Accumulate events into an image (reference image.py:46-100 semantics).

    Bilinear + padding returns the *padded* ``(H+1, W+1)`` image, exactly like
    the reference. ``device`` is accepted for signature parity and ignored
    (placement is JAX's job).
    """
    del device
    H, W = sensor_size
    xs = jnp.asarray(xs, jnp.float32) if interpolation == "bilinear" else jnp.asarray(xs)
    ys = jnp.asarray(ys, jnp.float32) if interpolation == "bilinear" else jnp.asarray(ys)
    ps = jnp.asarray(ps, jnp.float32)

    if interpolation == "bilinear" and padding:
        img_size = (H + 1, W + 1)
    else:
        img_size = (H, W)

    if interpolation == "bilinear":
        clipx = img_size[1] - 1
        clipy = img_size[0] - 1
        if legacy_mask and clip_out_of_range:
            m = _legacy_clip_mask(xs, ys, clipx, clipy)
            if mask is not None:
                m = m * mask
            # Reference: pxs = floor(x)*mask (long), residuals unmasked,
            # weights masked (image.py:79-86). Equivalent to dropping, because
            # masked weights are zero — but replicate exactly for parity.
            px = jnp.floor(xs) * m
            py = jnp.floor(ys) * m
            dx = xs - jnp.floor(xs)
            dy = ys - jnp.floor(ys)
            img = bilinear_scatter(px + dx, py + dy, ps * m, img_size, impl=impl)
        else:
            m = mask
            if clip_out_of_range:
                valid = (xs < clipx) & (ys < clipy) & (xs >= 0) & (ys >= 0)
                m = valid if m is None else (m != 0) & valid
            img = bilinear_scatter(xs, ys, ps, img_size, mask=m, impl=impl)
    else:
        # Integer route (image.py:87-95): coords truncated toward zero.
        if legacy_mask and clip_out_of_range:
            clipx = img_size[1] if not padding else img_size[1] - 1
            clipy = img_size[0] if not padding else img_size[0] - 1
            m = _legacy_clip_mask(xs, ys, clipx, clipy)
            if mask is not None:
                m = m * mask
            ixs = jnp.trunc(jnp.asarray(xs, jnp.float32)).astype(jnp.int32) * m.astype(jnp.int32)
            iys = jnp.trunc(jnp.asarray(ys, jnp.float32)).astype(jnp.int32) * m.astype(jnp.int32)
            # NB reference does NOT mask ps here (image.py:95): out-of-range
            # events dump their weight onto pixel (0, 0).
            img = scatter_add_2d(ixs, iys, ps, img_size, impl=impl)
        else:
            img = scatter_add_2d(xs, ys, ps, img_size, mask=mask, impl=impl)

    if default != 0:
        img = img + default * (img == 0)
    return img


def events_to_image(xs, ys, ps, sensor_size=(180, 240),
                    interpolation: Optional[str] = None, padding: bool = False,
                    meanval: bool = False, default: float = 0,
                    mask: Optional[Array] = None,
                    impl: Optional[str] = None) -> Array:
    """Accumulate events into an ``(H, W)`` image (reference image.py:5-44).

    Integer route scatters into a padded ``(H+1, W+1)`` grid then crops, so
    events at exactly ``x == W`` / ``y == H`` are silently discarded, matching
    the numpy reference. ``meanval`` divides by the per-pixel event count
    (``default`` where the count is zero).
    """
    H, W = sensor_size
    if interpolation == "bilinear":
        img = events_to_image_torch(xs, ys, ps, sensor_size=sensor_size,
                                    clip_out_of_range=True,
                                    interpolation="bilinear", padding=padding,
                                    mask=mask, impl=impl)
        img = jnp.where(img == 0, default, img)
        if meanval:
            # Latent reference defect repaired (image.py:24-27 counts on the
            # UNPADDED grid, so meanval+bilinear+padding crashes upstream
            # with a (H+1, W+1) vs (H, W) broadcast error): count events at
            # their integer pixel on the image's own grid, and only events
            # the numerator's bilinear clip kept (clipx = W-1 unpadded, W
            # padded) — otherwise border events deflate the mean at the
            # last row/column.
            fxs = jnp.asarray(xs, jnp.float32)
            fys = jnp.asarray(ys, jnp.float32)
            clipx = float(W if padding else W - 1)
            clipy = float(H if padding else H - 1)
            valid = ((fxs >= 0) & (fys >= 0)
                     & (fxs < clipx) & (fys < clipy)).astype(jnp.float32)
            if mask is not None:
                valid = valid * jnp.asarray(mask, jnp.float32)
            cnt = scatter_add_2d(jnp.floor(fxs), jnp.floor(fys),
                                 jnp.ones_like(fxs), img.shape,
                                 mask=valid, impl=impl)
    else:
        img_size = (H + 1, W + 1)
        img = scatter_add_2d(xs, ys, jnp.asarray(ps, jnp.float32), img_size,
                             mask=mask, impl=impl)
        if meanval:
            cnt = scatter_add_2d(xs, ys, jnp.ones(jnp.asarray(xs).shape, jnp.float32),
                                 img_size, mask=mask, impl=impl)
    if meanval:
        cnt = cnt[:img.shape[0], :img.shape[1]]
        img = jnp.where(cnt != 0, img / jnp.where(cnt == 0, 1.0, cnt), default)
    return img[0:H, 0:W]


def interpolate_to_image(pxs, pys, dxs, dys, weights, img):
    """Signature-compatible shim for the reference's hot kernel
    (image.py:102-115): accumulate bilinear taps into ``img``.

    JAX arrays are immutable, so unlike the reference this *returns* the
    updated image rather than mutating in place; prefer
    ``ops.bilinear_scatter`` in new code.
    """
    x = jnp.asarray(pxs, jnp.float32) + jnp.asarray(dxs, jnp.float32)
    y = jnp.asarray(pys, jnp.float32) + jnp.asarray(dys, jnp.float32)
    return jnp.asarray(img) + bilinear_scatter(
        x, y, jnp.asarray(weights, jnp.float32), tuple(jnp.asarray(img).shape))


def interpolate_to_derivative_img(pxs, pys, dxs, dys, d_img, w1, w2):
    """Signature-compatible shim for reference image.py:117-136 (returns the
    updated derivative-image stack; see ``ops.bilinear_scatter_derivative``)."""
    x = jnp.asarray(pxs, jnp.float32) + jnp.asarray(dxs, jnp.float32)
    y = jnp.asarray(pys, jnp.float32) + jnp.asarray(dys, jnp.float32)
    d_img = jnp.asarray(d_img)
    return d_img + bilinear_scatter_derivative(
        x, y, jnp.asarray(w1, jnp.float32), jnp.asarray(w2, jnp.float32),
        jnp.ones(x.shape, jnp.float32), tuple(d_img.shape[1:]))


# ---------------------------------------------------------------------------
# IWE + analytic derivative images
# ---------------------------------------------------------------------------

def events_to_image_drv(xn, yn, pn, jacobian_xn, jacobian_yn,
                        sensor_size=(180, 240), clip_out_of_range: bool = True,
                        interpolation: str = "bilinear", padding: bool = True,
                        compute_gradient: bool = False,
                        mask: Optional[Array] = None,
                        legacy_mask: bool = False,
                        impl: Optional[str] = None):
    """Image of (warped) events + analytic dIWE/dparams stack.

    Rebuild of reference image.py:162-217. Returns ``(iwe, d_iwe)`` where
    ``d_iwe`` is ``(D, H+1, W+1)`` (``None`` if ``compute_gradient=False``).
    Differentiable — but on TPU prefer ``jax.grad`` straight through
    ``bilinear_scatter``; this function exists for analytic-gradient parity.
    """
    H, W = sensor_size
    xs = jnp.asarray(xn, jnp.float32)
    ys = jnp.asarray(yn, jnp.float32)
    ps = jnp.asarray(pn, jnp.float32)
    img_size = (H + 1, W + 1) if padding else (H, W)
    clipx, clipy = img_size[1] - 1, img_size[0] - 1

    if legacy_mask and clip_out_of_range:
        m = _legacy_clip_mask(xs, ys, clipx, clipy)
        if mask is not None:
            m = m * mask
        px = jnp.floor(xs) * m
        py = jnp.floor(ys) * m
        dx = xs - jnp.floor(xs)
        dy = ys - jnp.floor(ys)
        wx, wy, wp, wm = px + dx, py + dy, ps * m, None
    else:
        m = mask
        if clip_out_of_range:
            valid = (xs < clipx) & (ys < clipy) & (xs >= 0) & (ys >= 0)
            m = valid if m is None else (m != 0) & valid
        wx, wy, wp, wm = xs, ys, ps, m

    iwe = bilinear_scatter(wx, wy, wp, img_size, mask=wm, impl=impl)
    d_iwe = None
    if compute_gradient:
        jx = jnp.asarray(jacobian_xn, jnp.float32)
        jy = jnp.asarray(jacobian_yn, jnp.float32)
        if legacy_mask and clip_out_of_range:
            d_iwe = bilinear_scatter_derivative(wx, wy, jx, jy, wp, img_size,
                                                impl=impl)
        else:
            d_iwe = bilinear_scatter_derivative(wx, wy, jx, jy, wp, img_size,
                                                mask=wm, impl=impl)
    return iwe, d_iwe


def image_to_event_weights(xs, ys, img, mask: Optional[Array] = None) -> Array:
    """Per-event image values via bilinear gather (reference image.py:138-160).

    The reference zeroes coords of events beyond the image (upper bound only)
    and still gathers at (0, 0) scaled by 0; equivalent to returning 0 for
    those events, which is what the drop-mode gather does.
    """
    img = jnp.asarray(img)
    H, W = img.shape[-2], img.shape[-1]
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    valid = (xs < W - 1) & (ys < H - 1) & (xs >= 0) & (ys >= 0)
    if mask is not None:
        valid = valid & (mask != 0)
    return bilinear_gather(xs, ys, img, mask=valid)


# ---------------------------------------------------------------------------
# Average-timestamp images (Zhu, CVPR'19)
# ---------------------------------------------------------------------------

def _timestamp_weight_sums(xs, ys, normalized_ts, ps, mask, img_size,
                           clipx, clipy, clip_out_of_range, legacy_mask,
                           impl):
    """The four raw accumulations behind the timestamp image:
    ``(ts*pos, pos, ts*neg, neg)`` as a (4, H', W') stack, BEFORE the
    count division — the shardable core (`parallel.sharding` psums these
    across an event-sharded mesh, then divides globally)."""
    pos_mask = jnp.where(ps > 0, 1.0, 0.0)
    neg_mask = jnp.where(ps <= 0, 1.0, 0.0)
    if mask is not None:
        pos_mask = pos_mask * mask
        neg_mask = neg_mask * mask

    if legacy_mask and clip_out_of_range:
        m = _legacy_clip_mask(xs, ys, clipx, clipy)
        if mask is not None:
            m = m * mask
        # Reference zeroes coords but NOT the count/ts weights
        # (image.py:267-277): clipped events pile up at pixel (0, 0).
        px = jnp.floor(xs) * m
        py = jnp.floor(ys) * m
        dx = xs - jnp.floor(xs)
        dy = ys - jnp.floor(ys)
        gx, gy, gm = px + dx, py + dy, None
    else:
        valid = (xs < clipx) & (ys < clipy) & (xs >= 0) & (ys >= 0) if clip_out_of_range else None
        gx, gy, gm = xs, ys, valid

    weights = jnp.stack([normalized_ts * pos_mask, pos_mask,
                         normalized_ts * neg_mask, neg_mask])
    if gm is not None:
        weights = weights * gm.astype(weights.dtype)[None, :]

    if impl in ("matmul", "matmul_hilo", "matmul_bf16"):
        # MXU path: all 4 accumulations (ts*pos, pos, ts*neg, neg) share the
        # same coordinates, so ONE multi-channel Pallas kernel builds the
        # one-hot factors once and emits a (4, H, W) stack from VMEM.
        from ..ops.pallas_scatter import bilinear_matmul
        return bilinear_matmul(
            gx, gy, weights, img_size,
            precision="bf16" if impl == "matmul_bf16" else "hilo")
    return jnp.stack([bilinear_scatter(gx, gy, w, img_size, impl=impl)
                      for w in weights])



def events_to_timestamp_image(xn, yn, ts, pn, sensor_size=(180, 240),
                              clip_out_of_range: bool = True,
                              interpolation: str = "bilinear",
                              padding: bool = True,
                              normalize_timestamps: bool = True,
                              timestamp_reverse: bool = False,
                              mask: Optional[Array] = None,
                              legacy_mask: bool = False,
                              impl: Optional[str] = None):
    """Average-timestamp images of positive / negative events.

    NB ``interpolation`` only selects the clip bounds, never the
    accumulation: events always splat bilinearly — exactly the reference's
    behavior (image.py:315-346 calls ``interpolate_to_image``
    unconditionally; its ``interpolation=None`` route likewise only widens
    ``clipx/clipy``).

    Single implementation covering both reference variants
    (image.py:219-284 numpy, image.py:286-353 torch, incl.
    ``timestamp_reverse`` for backward warping). Count images are initialised
    to *ones* before accumulation, exactly like the reference
    (image.py:269-272) — the average is ``Σ(t·w) / (1 + Σw)``.

    Returns ``(img_pos, img_neg)``, padded ``(H+1, W+1)`` when ``padding``.
    """
    H, W = sensor_size
    xs = jnp.asarray(xn, jnp.float32)
    ys = jnp.asarray(yn, jnp.float32)
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(pn, jnp.float32)
    img_size = (H + 1, W + 1) if padding else (H, W)
    clipx, clipy = (img_size[1] - 1, img_size[0] - 1) if interpolation == "bilinear" or padding else (img_size[1], img_size[0])

    eps = 1e-6
    if mask is None:
        t_first, t_last = ts[0], ts[-1]
    else:
        big = jnp.float32(jnp.finfo(jnp.float32).max)
        t_first = jnp.min(jnp.where(mask != 0, ts, big))
        t_last = jnp.max(jnp.where(mask != 0, ts, -big))
    if timestamp_reverse:
        normalized_ts = (-ts + t_last) / (t_last - t_first + eps)
    elif normalize_timestamps:
        normalized_ts = (ts - t_first) / (t_last - t_first + eps)
    else:
        normalized_ts = ts

    stack = _timestamp_weight_sums(xs, ys, normalized_ts, ps, mask,
                                   img_size, clipx, clipy,
                                   clip_out_of_range, legacy_mask, impl)
    img_pos, img_neg = stack[0], stack[2]
    img_pos_cnt = 1.0 + stack[1]
    img_neg_cnt = 1.0 + stack[3]

    img_pos = img_pos / jnp.where(img_pos_cnt == 0, 1.0, img_pos_cnt)
    img_neg = img_neg / jnp.where(img_neg_cnt == 0, 1.0, img_neg_cnt)
    return img_pos, img_neg


# torch-signature alias (reference image.py:286-353)
def events_to_timestamp_image_torch(xs, ys, ts, ps, device=None,
                                    sensor_size=(180, 240),
                                    clip_out_of_range=True,
                                    interpolation="bilinear", padding=True,
                                    timestamp_reverse=False, **kw):
    del device
    return events_to_timestamp_image(xs, ys, ts, ps, sensor_size=sensor_size,
                                     clip_out_of_range=clip_out_of_range,
                                     interpolation=interpolation,
                                     padding=padding,
                                     timestamp_reverse=timestamp_reverse, **kw)


# ---------------------------------------------------------------------------
# Stateful incremental accumulators (reference image.py:355-396)
# ---------------------------------------------------------------------------

class TimestampImage:
    """Online last-timestamp image; ``get_image`` rank-normalizes.

    Vectorized rebuild of reference image.py:355-377 (which loops in Python
    per event); the last event per pixel wins, as there.
    """

    def __init__(self, sensor_size):
        self.sensor_size = tuple(sensor_size)
        self.num_pixels = sensor_size[0] * sensor_size[1]
        self.image = np.ones(self.sensor_size)

    def set_init(self, value):
        self.image = np.ones_like(self.image) * value

    def add_event(self, x, y, t, p):
        self.image[int(y), int(x)] = t

    def add_events(self, xs, ys, ts, ps):
        np_xs = np.asarray(xs).astype(int)
        np_ys = np.asarray(ys).astype(int)
        self.image[np_ys, np_xs] = np.asarray(ts)  # last write wins

    def get_image(self):
        flat = self.image.ravel()
        # dense ranking (scipy.stats.rankdata(method='dense') - 1)
        _, inv = np.unique(flat, return_inverse=True)
        ranks = inv.reshape(self.sensor_size).astype(np.float64)
        return ranks / max(ranks.max(), 1)


class EventImage:
    """Online polarity-accumulation image (reference image.py:379-396)."""

    def __init__(self, sensor_size):
        self.sensor_size = tuple(sensor_size)
        self.num_pixels = sensor_size[0] * sensor_size[1]
        self.image = np.ones(self.sensor_size)

    def add_event(self, x, y, t, p):
        self.image[int(y), int(x)] += p

    def add_events(self, xs, ys, ts, ps):
        np.add.at(self.image, (np.asarray(ys).astype(int),
                               np.asarray(xs).astype(int)), np.asarray(ps))

    def get_image(self):
        mn, mx = self.image.min(), self.image.max()
        return (self.image - mn) / max(mx - mn, 1e-12)
