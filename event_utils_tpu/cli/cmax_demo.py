"""Contrast-maximisation demo CLI: optimize every objective on an H5 slice
and print loss vs ground truth (the reference's __main__ demo,
events_cmax.py:391-432, as a proper entry point)."""

from __future__ import annotations

import argparse

import numpy as np

from ..errors import ConfigurationError, DataError


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Optimize all contrast objectives on an event slice")
    parser.add_argument("path", help="h5 events path")
    parser.add_argument("--gt", nargs="+", type=float, default=(0, 0))
    parser.add_argument("--img_size", nargs="+", type=int, default=(180, 240))
    parser.add_argument("--start_idx", type=int, default=20000)
    parser.add_argument("--num_events", type=int, default=15000)
    parser.add_argument("--draw_landscape", action="store_true")
    parser.add_argument("--jit", action="store_true",
                        help="Use the fully-compiled device solver")
    args = parser.parse_args(argv)

    from ..contrast_max import (OBJECTIVE_REGISTRY, draw_objective_function,
                                linvel_warp, optimize, optimize_contrast_jit)
    from ..data_formats import read_h5_event_components

    xs, ys, ts, ps = read_h5_event_components(args.path)
    if len(ts) == 0:
        raise DataError(f"{args.path} contains no events")
    total = len(ts)
    ts = ts - ts[0]
    s = args.start_idx
    e = s + args.num_events
    xs, ys, ts, ps = xs[s:e], ys[s:e], ts[s:e], ps[s:e]
    if len(ts) == 0:
        raise ConfigurationError(
            f"empty slice [{s}:{e}] of the file's {total} events — check "
            "--start_idx / --num_events")
    img_size = tuple(args.img_size)
    gt = tuple(args.gt)
    warp = linvel_warp()

    if args.draw_landscape:
        from ..contrast_max import variance_objective
        draw_objective_function(xs, ys, ts, ps, variance_objective(), warp,
                                gt=gt, img_size=img_size, show=True)

    for name, obj_cls in OBJECTIVE_REGISTRY.items():
        obj = obj_cls()
        if args.jit and obj.has_derivative:
            argmax = np.asarray(optimize_contrast_jit(
                xs, ys, ts, ps, warp, obj, img_size=img_size,
                grid_search_init=True))
        else:
            argmax = optimize(xs, ys, ts, ps, warp, obj, numeric_grads=True,
                              img_size=img_size)
        loss = obj.evaluate_function(argmax, xs, ys, ts, ps, warp,
                                     img_size=img_size)
        gtloss = obj.evaluate_function(np.asarray(gt), xs, ys, ts, ps, warp,
                                       img_size=img_size)
        print(f"{name}: argmax={np.round(argmax, 2)} loss={loss:.4f} "
              f"gt_loss={gtloss:.4f}")


if __name__ == "__main__":
    main()
