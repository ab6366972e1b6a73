"""Augmentation figure-sweep demo CLI.

Counterpart of the reference's runnable ``__main__`` demo
(``lib/augmentation/event_augmentation.py:225-267``, the README figure
reproduction): load an event file, render the raw window plus the
add_correlated / add_random / remove / rotate / flip augmentations as 3-D
event-cloud figures.

Differences from the reference demo (documented): output files are named
after their augmentation (the reference's ``img0..img6`` skips ``img2``);
the rotate/flip figures plot the *augmented* events with their own ts/ps
(the reference plots stale full-length ``ts, ps`` against the windowed
augmented coords, which only renders because matplotlib broadcasts —
``rotate_events``' coordinate bug itself is catalogued in SURVEY.md §7.3 and
deliberately fixed in ``augmentation.event_augmentation``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(
        description="Render augmentation demo figures from an event file")
    parser.add_argument("path", help="HDF5 event file or memmap dir")
    parser.add_argument("--output_path", default="/tmp/extracted_data",
                        help="Folder for the rendered figures")
    parser.add_argument("--to_add", type=float, default=2.0,
                        help="Events to add, as a proportion of the window")
    parser.add_argument("--num", type=int, default=50000,
                        help="Events in the plotted window")
    parser.add_argument("--start", type=int, default=0,
                        help="First event of the window")
    parser.add_argument("--num_compress", type=int, default=5000)
    parser.add_argument("--elev", type=float, default=30)
    parser.add_argument("--show_plot", action="store_true")
    parser.add_argument("--sensor", type=int, nargs=2, default=(180, 240))
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..augmentation.event_augmentation import (
        add_correlated_events, add_random_events, flip_events_x,
        remove_events, rotate_events)
    from ..data_formats.read_events import (read_h5_event_components,
                                            read_memmap_events)
    from ..visualization.draw_event_stream import plot_events

    if os.path.isdir(args.path):
        data = read_memmap_events(args.path)
        xs = data["xy"][:, 0].astype(np.float64)
        ys = data["xy"][:, 1].astype(np.float64)
        ts = np.asarray(data["t"]).squeeze()
        ps = np.asarray(data["p"]).squeeze() * 2.0 - 1.0
    else:
        xs, ys, ts, ps = read_h5_event_components(args.path)
    H = args.sensor[0]
    ys = H - ys  # flip like the reference demo (event_augmentation.py:240)

    s, num = args.start, args.num
    xs, ys, ts, ps = xs[s:s + num], ys[s:s + num], ts[s:s + num], ps[s:s + num]
    to_add = int(len(xs) * args.to_add)
    os.makedirs(args.output_path, exist_ok=True)

    def render(name, axs, ays, ats, aps):
        pth = os.path.join(args.output_path, name)
        plot_events(axs, ays, ats, aps, elev=args.elev,
                    num_compress=args.num_compress, num_show=-1,
                    save_path=pth, show_axes=True, compress_front=True,
                    show_plot=args.show_plot)
        print(f"wrote {pth}")

    rng = np.random.default_rng(0)
    render("raw", xs, ys, ts, ps)

    nx, ny, nt, npo = add_correlated_events(xs, ys, ts, ps, to_add, rng=rng)
    render("add_correlated", nx, ny, nt, npo)

    nx, ny, nt, npo = add_random_events(xs, ys, ts, ps, to_add,
                                        sensor_resolution=tuple(args.sensor),
                                        rng=rng)
    render("add_random", nx, ny, nt, npo)

    nx, ny, nt, npo = remove_events(xs, ys, ts, ps, len(xs) // 2, rng=rng)
    render("remove", nx, ny, nt, npo)

    # center_of_rotation is (cx, cy) = (x, y); keep clip_to_range=False so
    # the rotated coords stay index-aligned with their ts/ps
    rx, ry = rotate_events(xs, ys, sensor_resolution=tuple(args.sensor),
                           theta_radians=1.4,
                           center_of_rotation=(args.sensor[1] // 2,
                                               args.sensor[0] // 2),
                           clip_to_range=False)[:2]
    render("rotate", rx, ry, ts, ps)

    fx, fy, ft, fp = flip_events_x(xs, ys, ts, ps,
                                   sensor_resolution=tuple(args.sensor))
    render("flip_x", fx, fy, ft, fp)


if __name__ == "__main__":
    main()
