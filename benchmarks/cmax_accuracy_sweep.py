"""grid_cmax accuracy sweep on the bench scene (VERDICT r4 #7).

The certified bench prints a flow-error median over the 6 reference-timed
ROIs (4.7 px/s, flat for three rounds). This sweep measures the ALL-ROI
median/mean AEE vs the exact rotation-field ground truth across solver
knobs (capacity, blur_sigma, maxiter, median smoothing) to answer whether
4.7 is a floor of the objective or of the solver configuration.

Accuracy is platform-independent; run host-side:
    EVENT_UTILS_TPU_PLATFORM=cpu python benchmarks/cmax_accuracy_sweep.py
Wall-clock certification of a winning config belongs in bench.py on the
real chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import os as _os

_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, _os.path.join(_root, "benchmarks"))

from bench_cmax import H, W, ROI, make_scene  # noqa: E402


def gt_for(rois):
    omega, ccx, ccy = 1.2, W / 2, H / 2
    ctr_x = rois[:, 1] + ROI[1] / 2
    ctr_y = rois[:, 0] + ROI[0] / 2
    return np.stack([-omega * (ctr_y - ccy), omega * (ctr_x - ccx)], 1)


def main():
    from event_utils_tpu.contrast_max.events_cmax import grid_cmax_batched

    xs, ys, ts, ps = make_scene()
    print(f"scene: {len(xs)} events", file=sys.stderr, flush=True)

    grid = []
    for capacity in (2048, 4096):
        for blur in (1.0, 1.5):
            for maxiter in (30, 60):
                for smooth in (None, "median"):
                    grid.append(dict(capacity=capacity, blur_sigma=blur,
                                     maxiter=maxiter, smooth=smooth))
    rows = []
    for cfg in grid:
        t0 = time.perf_counter()
        p, rois, f, v = grid_cmax_batched(xs, ys, ts, ps, roi_size=ROI,
                                          img_size=(H, W), **cfg)
        host_s = time.perf_counter() - t0
        p = np.asarray(p)
        v = np.asarray(v)
        gt = gt_for(np.asarray(rois))
        e = np.linalg.norm(p[v] - gt[v], axis=1)
        row = dict(cfg, aee_median=round(float(np.median(e)), 2),
                   aee_mean=round(float(np.mean(e)), 2),
                   host_wall_s=round(host_s, 1))
        rows.append(row)
        print(row, file=sys.stderr, flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
