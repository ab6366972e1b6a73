"""Pin the grid_cmax reference baseline: time the reference CPU path on ALL
108 ROIs of the bench scene ONCE and cache the per-ROI distribution in-repo.

Why: the bench denominator used to be extrapolated from 6 ROIs timed live on
a noisy 1-vCPU host, and the certified speedup swung 68x <-> 117x across
rounds — too wide to detect a real 20% regression. With the full per-ROI
distribution pinned (`ref_grid_cmax_baseline.json`), bench.py divides by a
FIXED denominator and separately reports the live host's drift against it,
so the speedup figure moves only when OUR wall-clock moves.

Run (CPU-only, no jax — safe any time):
    python benchmarks/pin_cmax_baseline.py [--out ref_grid_cmax_baseline.json]

Reference algorithm being timed: per-ROI SOFAS grid search + scipy BFGS on
the variance objective (/root/reference/lib/contrast_max/events_cmax.py:28-76),
as reimplemented faithfully in bench_cmax.reference_grid_cmax.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_cmax import (H, W, N_EVENTS, ROI, T_MAX, make_scene,  # noqa: E402
                        np_variance_loss)


def scene_fingerprint(xs, ys, ts, ps) -> str:
    h = hashlib.sha256()
    for a in (xs, ys, ts, ps):
        h.update(np.ascontiguousarray(a, np.float64).tobytes())
    return h.hexdigest()[:16]


def time_all_rois(xs, ys, ts, ps):
    """Per-ROI reference solve times over the full sensor (the loop body of
    bench_cmax.reference_grid_cmax, timed per ROI)."""
    import scipy.optimize as opt

    rows = []
    for yc in range(0, H, ROI[0]):
        for xc in range(0, W, ROI[1]):
            sel = ((xs >= xc) & (xs < xc + ROI[1])
                   & (ys >= yc) & (ys < yc + ROI[0]))
            if sel.sum() <= 10:
                continue
            rxs, rys, rts, rps = xs[sel], ys[sel], ts[sel], ps[sel]
            t0 = time.perf_counter()
            axes = np.linspace(-150, 150, 5)
            best, best_v = np.zeros(2), np.inf
            for vx in axes:
                for vy in axes:
                    v = np_variance_loss((vx, vy), rxs, rys, rts, rps,
                                         (H, W), 1.0)
                    if v < best_v:
                        best, best_v = np.array([vx, vy]), v
            params = opt.fmin_bfgs(np_variance_loss, best,
                                   args=(rxs, rys, rts, rps, (H, W), 1.0),
                                   epsilon=1, disp=False, maxiter=30)
            rows.append({"yc": yc, "xc": xc, "n_events": int(sel.sum()),
                         "seconds": round(time.perf_counter() - t0, 4),
                         "params": [round(float(p), 3) for p in params]})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "ref_grid_cmax_baseline.json"))
    args = ap.parse_args()

    xs, ys, ts, ps = make_scene()
    fp = scene_fingerprint(xs, ys, ts, ps)
    print(f"scene: {len(xs)} events, fingerprint {fp}", file=sys.stderr)

    t0 = time.perf_counter()
    rows = time_all_rois(xs, ys, ts, ps)
    wall = time.perf_counter() - t0
    secs = np.array([r["seconds"] for r in rows])
    # reference all-ROI flow error vs the analytic rotation-field GT — the
    # pinned counterpart of bench.py's all-ROI "ours" accuracy row
    omega, ccx, ccy = 1.2, W / 2, H / 2
    errs = []
    for r in rows:
        ctr_x, ctr_y = r["xc"] + ROI[1] / 2, r["yc"] + ROI[0] / 2
        gt = np.array([-omega * (ctr_y - ccy), omega * (ctr_x - ccx)])
        errs.append(float(np.linalg.norm(np.array(r["params"]) - gt)))
    out = {
        "scene": {"seed": 0, "n_events_requested": N_EVENTS,
                  "n_events": len(xs), "t_max": T_MAX,
                  "sensor": [H, W], "roi": list(ROI),
                  "fingerprint": fp},
        "n_rois": len(rows),
        "total_s": round(float(secs.sum()), 2),
        "per_roi_median_s": round(float(np.median(secs)), 4),
        "per_roi_mean_s": round(float(secs.mean()), 4),
        "per_roi_p10_s": round(float(np.percentile(secs, 10)), 4),
        "per_roi_p90_s": round(float(np.percentile(secs, 90)), 4),
        "flow_err_median_px": round(float(np.median(errs)), 2),
        "flow_err_mean_px": round(float(np.mean(errs)), 2),
        "rois": rows,
        "host": {"machine": platform.machine(),
                 "processor": platform.processor(),
                 "cpu_count": os.cpu_count(),
                 "python": platform.python_version(),
                 "numpy": np.__version__},
        "pinned_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_s": round(wall, 2),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"pinned {len(rows)} ROIs: total {out['total_s']} s "
          f"(median {out['per_roi_median_s']} s/ROI) -> {args.out}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
