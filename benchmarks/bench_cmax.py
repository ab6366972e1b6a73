"""grid_cmax benchmark: ROI-tiled contrast-max flow vs the reference CPU path.

BASELINE config 4: tile the sensor into ROIs and solve per-ROI optic flow by
contrast maximisation. The baseline is a faithful pure-numpy/scipy
implementation of the reference algorithm (per-ROI SOFAS grid search +
BFGS on the variance objective, np.add.at bilinear IWE, scipy blur —
the numpy path of reference events_cmax.py:28-76); ours is the vmapped
whole-solve-on-device ``grid_cmax_batched``.

Run: python benchmarks/bench_cmax.py  (diagnostics to stderr, JSON to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 180, 240
ROI = (20, 20)
N_EVENTS = 200_000
T_MAX = 0.2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_scene(seed=0):
    """Rotating-scene events: flow varies across the sensor (what grid_cmax
    exists for), locally ~constant within each ROI."""
    rng = np.random.default_rng(seed)
    n_pts = 400
    px = rng.uniform(10, W - 10, n_pts)
    py = rng.uniform(10, H - 10, n_pts)
    pol = rng.choice([-1.0, 1.0], n_pts)
    omega = 1.2  # rad/s about the sensor center
    cx, cy = W / 2, H / 2
    idx = rng.integers(0, n_pts, N_EVENTS)
    ts = np.sort(rng.uniform(0, T_MAX, N_EVENTS))
    ang = omega * ts
    rx = px[idx] - cx
    ry = py[idx] - cy
    xs = cx + np.cos(ang) * rx - np.sin(ang) * ry + rng.normal(0, 0.2, N_EVENTS)
    ys = cy + np.sin(ang) * rx + np.cos(ang) * ry + rng.normal(0, 0.2, N_EVENTS)
    ps = pol[idx]
    keep = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    return xs[keep], ys[keep], ts[keep], ps[keep]


# ---------------------------------------------------------------------------
# Reference CPU path (pure numpy/scipy, the reference's algorithm)
# ---------------------------------------------------------------------------

def np_iwe(params, xs, ys, ts, ps, img_size):
    t0 = ts[-1] if len(ts) else 0.0
    xw = xs - (ts - t0) * params[0]
    yw = ys - (ts - t0) * params[1]
    Hh, Ww = img_size
    img = np.zeros((Hh + 1, Ww + 1))
    ok = (xw > 0) & (xw < Ww) & (yw > 0) & (yw < Hh)
    x0 = np.floor(xw[ok]).astype(int)
    y0 = np.floor(yw[ok]).astype(int)
    dx = xw[ok] - x0
    dy = yw[ok] - y0
    w = ps[ok]
    np.add.at(img, (y0, x0), w * (1 - dx) * (1 - dy))
    np.add.at(img, (y0, x0 + 1), w * dx * (1 - dy))
    np.add.at(img, (y0 + 1, x0), w * (1 - dx) * dy)
    np.add.at(img, (y0 + 1, x0 + 1), w * dx * dy)
    return img


def np_variance_loss(params, xs, ys, ts, ps, img_size, blur):
    from scipy.ndimage import gaussian_filter
    iwe = np_iwe(params, xs, ys, ts, ps, img_size)
    if blur > 0:
        iwe = gaussian_filter(iwe, blur)
    return -np.var(iwe - iwe.mean())


def reference_grid_cmax(xs, ys, ts, ps, max_rois=None):
    """Per-ROI grid search + BFGS, Python loop (reference algorithm)."""
    import scipy.optimize as opt

    results = []
    rois = []
    count = 0
    for yc in range(0, H, ROI[0]):
        for xc in range(0, W, ROI[1]):
            sel = (xs >= xc) & (xs < xc + ROI[1]) & (ys >= yc) & (ys < yc + ROI[0])
            if sel.sum() <= 10:
                continue
            rxs, rys, rts, rps = xs[sel], ys[sel], ts[sel], ps[sel]
            # coarse grid init (5x5 over +-150, as the reference)
            axes = np.linspace(-150, 150, 5)
            best, best_v = np.zeros(2), np.inf
            for vx in axes:
                for vy in axes:
                    v = np_variance_loss((vx, vy), rxs, rys, rts, rps,
                                         (H, W), 1.0)
                    if v < best_v:
                        best, best_v = np.array([vx, vy]), v
            params = opt.fmin_bfgs(
                np_variance_loss, best,
                args=(rxs, rys, rts, rps, (H, W), 1.0),
                epsilon=1, disp=False, maxiter=30)
            results.append(params)
            rois.append((yc, xc))
            count += 1
            if max_rois is not None and count >= max_rois:
                return results, rois
    return results, rois


def main():
    from event_utils_tpu.contrast_max import grid_cmax_batched

    xs, ys, ts, ps = make_scene()
    log(f"scene: {len(xs)} events, rotating flow field")

    # --- reference CPU timing (sampled ROIs, extrapolated) -----------------
    n_sample = 6
    t0 = time.perf_counter()
    ref_params, ref_rois = reference_grid_cmax(xs, ys, ts, ps,
                                               max_rois=n_sample)
    ref_per_roi = (time.perf_counter() - t0) / n_sample
    total_rois = (H // ROI[0]) * (W // ROI[1])
    ref_total = ref_per_roi * total_rois
    log(f"reference CPU: {ref_per_roi:.2f} s/ROI -> {ref_total:.1f} s "
        f"for {total_rois} ROIs (extrapolated from {n_sample})")

    # --- ours: all ROIs on device ------------------------------------------
    # warmup/compile on a perturbed copy with identical shapes (capacity is
    # pinned so the timed call reuses the compiled executable but cannot hit
    # the runtime's execution cache). The shift is a whole ROI width so
    # per-ROI event counts are exactly PERMUTED across ROIs — a +1 shift
    # changed the count distribution enough to alter the overflow-refine
    # tier's batch shape and recompile the timed call (measured 10.7 s vs
    # the true 0.28 s in bench.py before the same fix).
    cap = 2048
    wp = np.asarray(grid_cmax_batched(
        (xs + ROI[1]) % W, ys, ts, ps, roi_size=ROI, img_size=(H, W),
        maxiter=30, capacity=cap)[0])
    t0 = time.perf_counter()
    params, rois, f_evals, valid = grid_cmax_batched(
        xs, ys, ts, ps, roi_size=ROI, img_size=(H, W), maxiter=30,
        capacity=cap)
    params = np.asarray(params)  # forces execution + transfer
    ours_total = time.perf_counter() - t0
    del wp
    log(f"grid_cmax_batched (TPU): {ours_total:.2f} s for all "
        f"{params.shape[0]} ROIs")

    # --- output agreement on the sampled ROIs ------------------------------
    # ground truth flow at each ROI center (rotation field, t ~ 0)
    errs_ref, errs_ours = [], []
    omega, cx, cy = 1.2, W / 2, H / 2
    rois_np = np.asarray(rois)
    for (yc, xc), rp in zip(ref_rois, ref_params):
        ctr_x, ctr_y = xc + ROI[1] / 2, yc + ROI[0] / 2
        gt = np.array([-omega * (ctr_y - cy), omega * (ctr_x - cx)])
        errs_ref.append(np.linalg.norm(rp - gt))
        match = np.where((rois_np[:, 0] == yc) & (rois_np[:, 1] == xc))[0]
        if len(match):
            errs_ours.append(np.linalg.norm(params[match[0]] - gt))
    log(f"flow error vs GT (px/s): reference {np.median(errs_ref):.1f}, "
        f"ours {np.median(errs_ours):.1f}")

    speedup = ref_total / ours_total
    print(json.dumps({
        "metric": "grid_cmax_roi_flow_wallclock",
        "value": round(ours_total, 2),
        "unit": "s",
        "vs_baseline": round(speedup, 1),
    }))


if __name__ == "__main__":
    main()
