"""Minimal pure-numpy oracles mirroring the reference formulas.

Written independently from the reference source (formulas per SURVEY.md §2);
used to property-test the JAX kernels on random streams.
"""

import numpy as np


def np_bilinear_scatter(x, y, w, shape):
    """4-tap bilinear scatter-add, taps outside the image dropped."""
    H, W = shape
    img = np.zeros(shape, dtype=np.float64)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    dx = x - x0
    dy = y - y0
    for ox, oy, wt in ((0, 0, (1 - dx) * (1 - dy)), (1, 0, dx * (1 - dy)),
                       (0, 1, (1 - dx) * dy), (1, 1, dx * dy)):
        ix, iy = x0 + ox, y0 + oy
        ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        np.add.at(img, (iy[ok], ix[ok]), (w * wt)[ok])
    return img


def np_integer_scatter(x, y, w, shape):
    H, W = shape
    img = np.zeros(shape, dtype=np.float64)
    ix = np.trunc(x).astype(int)
    iy = np.trunc(y).astype(int)
    ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    np.add.at(img, (iy[ok], ix[ok]), np.asarray(w, np.float64)[ok])
    return img


def np_voxel(xs, ys, ts, ps, B, shape):
    """Reference voxel formula: per-bin weights max(0, 1-|t_norm-bi|),
    integer-coordinate spatial accumulation."""
    ts = np.asarray(ts, np.float64)
    dt = ts[-1] - ts[0]
    t_norm = (ts - ts[0]) / dt * (B - 1)
    bins = []
    for bi in range(B):
        wb = np.maximum(0.0, 1.0 - np.abs(t_norm - bi))
        bins.append(np_integer_scatter(xs, ys, ps * wb, shape))
    return np.stack(bins)


def np_timestamp_image(xs, ys, ts, ps, shape_padded):
    """Reference timestamp-image formula: bilinear scatter of normalized ts
    per polarity, divided by (1 + bilinear count)."""
    ts = np.asarray(ts, np.float64)
    nt = (ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)
    pos = (ps > 0).astype(np.float64)
    neg = (ps <= 0).astype(np.float64)
    ip = np_bilinear_scatter(xs, ys, nt * pos, shape_padded)
    cp = 1.0 + np_bilinear_scatter(xs, ys, pos, shape_padded)
    im = np_bilinear_scatter(xs, ys, nt * neg, shape_padded)
    cm = 1.0 + np_bilinear_scatter(xs, ys, neg, shape_padded)
    return ip / cp, im / cm


def np_jacobian_scatter(x, y, jx, jy, w, shape):
    """Reference interpolate_to_derivative_img formula."""
    D = jx.shape[0]
    H, W = shape
    d_img = np.zeros((D,) + shape, dtype=np.float64)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    dx = x - x0
    dy = y - y0
    w1 = jx * w[None, :]
    w2 = jy * w[None, :]
    taps = ((0, 0, -(1 - dy), -(1 - dx)), (1, 0, (1 - dy), -dx),
            (0, 1, -dy, (1 - dx)), (1, 1, dy, dx))
    for ox, oy, a, b in taps:
        ix, iy = x0 + ox, y0 + oy
        ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        for d in range(D):
            np.add.at(d_img[d], (iy[ok], ix[ok]), (w1[d] * a + w2[d] * b)[ok])
    return d_img
