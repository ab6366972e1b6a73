"""Contrast-maximisation flow accuracy against ground truth.

Companion of ``infer_flow --eval_gt`` for the *model-free* flow path: per
between-frames window, solve ROI-tiled contrast maximisation
(`grid_cmax_batched`) and score the recovered per-ROI velocities against
the recording's ground-truth flow (e.g. a `cli.simulate` recording or any
dataset with dense flow), reporting the median/mean AEE. New capability —
the reference has no quantitative evaluation of its own headline algorithm.

Example:
    python -m event_utils_tpu.cli.simulate scene.h5 --velocity 30 -20
    python -m event_utils_tpu.cli.eval_cmax scene.h5 --roi_size 16 16
"""

from __future__ import annotations

import argparse


def _pyramid_arg(v):
    """argparse type for --pyramid: an int level count or 'auto' — reject
    anything else at parse time, before any dataset work."""
    if v == "auto":
        return v
    try:
        return int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"--pyramid must be an integer or 'auto', got {v!r}")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Evaluate grid_cmax flow against ground-truth flow")
    parser.add_argument("path", help="H5 file or memmap dir WITH flow")
    parser.add_argument("--method", default="k_events",
                        choices=["k_events", "between_frames"],
                        help="k_events (default): longer windows with real "
                             "displacement; between_frames windows can be "
                             "too short for any contrast signal")
    parser.add_argument("--k", type=int, default=20000,
                        help="events per window (k_events)")
    parser.add_argument("--roi_size", type=int, nargs=2, default=(20, 20))
    parser.add_argument("--min_events", type=int, default=10)
    parser.add_argument("--maxiter", type=int, default=50)
    parser.add_argument("--capacity", type=int, default=None)
    parser.add_argument("--max_windows", type=int, default=None)
    parser.add_argument("--warm_start", action="store_true",
                        help="Seed each window's solve from the previous "
                             "window's params (3.9x faster per window)")
    parser.add_argument("--smooth", default=None,
                        choices=["median"],
                        help="Neighbor-median flow smoothing (helps "
                             "textured scenes; see grid_cmax_batched)")
    parser.add_argument("--pyramid", default=1, type=_pyramid_arg,
                        help="Coarse-to-fine pyramid levels: level k solves "
                             "at roi_size*2^k and seeds the finer level's "
                             "warm-started refine (textured scenes); "
                             "'auto' selects per ROI between the plain "
                             "solve and the pyramid field by local field "
                             "coherence (no scene foreknowledge needed)")
    parser.add_argument("--output", default=None,
                        help="Optional metrics.json path")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import os

    from ..data_loaders import DynamicH5Dataset, MemMapDataset

    vm = ({"method": "k_events", "k": args.k, "sliding_window_w": 0}
          if args.method == "k_events"
          else {"method": "between_frames", "sliding_window_w": 0})
    cls = MemMapDataset if os.path.isdir(args.path) else DynamicH5Dataset
    dataset = cls(args.path, voxel_method=vm,
                  return_events=True, return_voxelgrid=False,
                  return_format="numpy")
    try:
        _eval(dataset, args)
    finally:
        dataset.close()


def _eval(dataset, args):
    import numpy as np

    from ..contrast_max.events_cmax import grid_cmax_batched

    if not dataset.has_flow:
        raise SystemExit(f"{args.path} carries no ground-truth flow")
    if len(np.asarray(dataset.frame_ts)) == 0:
        raise SystemExit(f"{args.path} has flow but no frame timestamps to "
                         "pair windows with")

    if args.pyramid != 1 and args.warm_start:
        print("note: --pyramid runs on the FIRST window only — a warm "
              "start (x0) suppresses the coarse-to-fine cascade on "
              "subsequent windows (see grid_cmax_batched)")

    H, W = dataset.sensor_resolution
    rh, rw = args.roi_size
    n = len(dataset) if args.max_windows is None \
        else min(len(dataset), args.max_windows)
    errs = []
    prev_params = None
    for i in range(n):
        item = dataset[i]
        ev = np.asarray(item["events"])
        if len(ev) < args.min_events:
            continue
        xs, ys, ts, ps = (ev[:, 0].astype(np.float32),
                          ev[:, 1].astype(np.float32),
                          ev[:, 2].astype(np.float32),
                          ev[:, 3].astype(np.float32))
        params, rois, f_evals, valid = grid_cmax_batched(
            xs, ys, ts, ps, roi_size=(rh, rw), img_size=(H, W),
            min_events=args.min_events, maxiter=args.maxiter,
            capacity=args.capacity, smooth=args.smooth,
            x0=prev_params if args.warm_start else None,
            pyramid=args.pyramid)
        params = np.asarray(params)
        rois = np.asarray(rois)
        valid = np.asarray(valid)
        if args.warm_start:
            # Invalid (empty/under-populated) ROIs carry garbage solver
            # output; seeding the next window's warm refine (which skips
            # the grid search) from them strands the solve far from the
            # optimum when the ROI later populates. Zero velocity is the
            # neutral seed.
            prev_params = np.where(valid[:, None], params, 0.0)
        # GT velocity field nearest the window's MID-time for both methods
        # (pairing between_frames window i with the flow AT frame i scores
        # against the end of the interval — a half-interval bias under
        # time-varying flow, and inconsistent with the k_events pairing)
        t_mid = 0.5 * (float(ts[0]) + float(ts[-1]))
        stamps = np.asarray(dataset.frame_ts)
        if len(stamps) == 1:
            # np.clip(x, 1, 0) would return 0 -> lo = -1 -> a negative
            # flow index (KeyError on H5, silent wraparound on memmap)
            gt_idx = 0
        else:
            hi = int(np.clip(np.searchsorted(stamps, t_mid), 1,
                             len(stamps) - 1))
            lo = hi - 1
            gt_idx = lo if (t_mid - stamps[lo]) <= (stamps[hi] - t_mid) \
                else hi
        gt = np.asarray(dataset.get_flow(gt_idx), np.float32)  # (2, H, W)
        for p, r, v in zip(params, rois, valid):
            if not v:
                continue
            yc = int(min(r[0] + rh // 2, H - 1))
            xc = int(min(r[1] + rw // 2, W - 1))
            errs.append(float(np.hypot(p[0] - gt[0, yc, xc],
                                       p[1] - gt[1, yc, xc])))
        running = (f"{np.median(errs):.2f}" if errs else "n/a")
        print(f"window {i + 1}/{n}: {int(valid.sum())} ROIs, "
              f"running median AEE {running} px/s", flush=True)

    if not errs:
        raise SystemExit("no window had enough events to evaluate")
    metrics = {"median_aee_px_s": round(float(np.median(errs)), 3),
               "mean_aee_px_s": round(float(np.mean(errs)), 3),
               "num_rois": len(errs), "roi_size": [rh, rw]}
    print(f"grid_cmax vs GT flow: median AEE {metrics['median_aee_px_s']} "
          f"px/s over {len(errs)} ROIs")
    if args.output:
        import json
        with open(args.output, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
