"""Dense-flow visualization: motion compensation and flow/event 3-D plots.

Rebuild of reference ``lib/visualization/draw_flow.py`` on the JAX flow-warp
path (no torch/cv2).
"""

from __future__ import annotations

import os

import numpy as np

from ..representations.image import events_to_image_torch
from ..transforms.optic_flow import warp_events_flow
from ..utils.event_util import clip_events_to_bounds
from ..utils.util import ensure_dir, flow2bgr_np, normalize_image
from .visualization_utils import (frame_stamps_to_start_end,
                                  get_frame_indices, parse_crop)


def motion_compensate(xs, ys, ts, ps, flow, fname="/tmp/img.png", crop=None,
                      forward_flow: bool = True):
    """Warp events by a dense flow field and save the resulting IWE
    (reference draw_flow.py:15-26).

    Divergence (documented): this framework's flows are TRUE forward optic
    flow (simulator ground truth, trained EVFlowNet output), which
    `warp_events_flow`'s reference-faithful formula only compensates when
    negated — so the default negates. Pass ``forward_flow=False`` for the
    reference's raw behavior (correct for backward-convention flow files).
    """
    import matplotlib.pyplot as plt

    xs = np.asarray(xs, np.float32)
    ys = np.asarray(ys, np.float32)
    ts = np.asarray(ts, np.float32)
    ps = np.asarray(ps, np.float32)
    flow = np.asarray(flow, np.float32)
    while flow.ndim > 3:  # batched model output: squeeze leading dims
        flow = flow.squeeze(0)
    xw, yw = warp_events_flow(xs, ys, ts, ps,
                              -flow if forward_flow else flow)
    img_size = list(flow.shape[-2:])  # (2, H, W) after the squeeze
    img = np.asarray(events_to_image_torch(
        np.asarray(xw), np.asarray(yw), ps, sensor_size=tuple(img_size),
        interpolation="bilinear"))
    img = np.flip(np.flip(img, axis=0), axis=1)
    img = normalize_image(img)
    if crop is not None:
        img = img[crop[0]:crop[1], crop[2]:crop[3]]
    ensure_dir(os.path.dirname(fname) or ".")
    plt.imsave(fname, img, cmap="gray")
    return img


def plot_flow_and_events(xs, ys, ts, ps, flow, save_path=None,
                         num_show: int = 1000, event_size: float = 2,
                         elev: float = 0, azim: float = 45,
                         show_events: bool = True, show_plot: bool = False,
                         crop=None, marker: str = ".", stride: int = 20,
                         img_size=None, show_axes: bool = False,
                         invert: bool = False, quiver_stride: int = 20):
    """3-D plot of events over a color-coded flow ground plane with flow
    quivers (reference draw_flow.py:28-98)."""
    import matplotlib.pyplot as plt

    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    flow = np.asarray(flow)
    while flow.ndim > 3:
        flow = flow[0]
    if img_size is None:
        img_size = flow.shape[1:3]
    crop = [0, img_size[0], 0, img_size[1]] if crop is None else crop
    xs, ys, ts, ps = clip_events_to_bounds(xs, ys, ts, ps, crop)
    xs, ys = xs - crop[2], ys - crop[0]
    flow = flow[:, crop[0]:crop[1], crop[2]:crop[3]]
    img_size = [crop[1] - crop[0], crop[3] - crop[2]]
    if len(xs) == 0:
        return None

    num_show = len(xs) if num_show == -1 else num_show
    skip = max(len(xs) // max(num_show, 1), 1)
    xs, ys, ts, ps = xs[::skip], ys[::skip], ts[::skip], ps[::skip]

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d", proj_type="ortho")
    colors = np.where(ps > 0, "r", "#00DAFF" if invert else "b")

    # flow color map as the ground plane at t0
    bgr = flow2bgr_np(flow[0], flow[1])
    rgb = bgr[..., ::-1].astype(float) / 255.0
    gy, gx = np.ogrid[0:img_size[0], 0:img_size[1]]
    ax.plot_surface(gx, np.full_like(gx, float(ts[0]), dtype=float), gy,
                    rstride=stride, cstride=stride, facecolors=rgb,
                    alpha=0.7)

    # sparse flow quivers
    qy, qx = np.mgrid[0:img_size[0]:quiver_stride, 0:img_size[1]:quiver_stride]
    u = flow[0][qy, qx]
    v = flow[1][qy, qx]
    ax.quiver(qx, np.full_like(qx, float(ts[0]), dtype=float), qy,
              u, np.zeros_like(u), v, length=0.05, normalize=True,
              color="k", alpha=0.5)

    if show_events:
        ax.scatter(xs, ts, ys, zdir="z", c=colors, s=event_size,
                   marker=marker, linewidths=0)

    ax.view_init(elev=elev, azim=azim)
    ax.grid(False)
    for pane in (ax.xaxis.pane, ax.yaxis.pane, ax.zaxis.pane):
        pane.fill = False
    if not show_axes:
        ax.set_axis_off()
    ax.set_xticks([])
    ax.set_yticks([])
    ax.set_zticks([])

    if save_path is not None:
        ensure_dir(os.path.dirname(save_path) or ".")
        plt.savefig(save_path, transparent=True, dpi=300, bbox_inches="tight")
    if show_plot:
        plt.show()
    plt.close()
    return ax


def plot_between_frames(xs, ys, ts, ps, flows, flow_imgs, flow_ts, args,
                        plttype: str = "events"):
    """Flow-synchronized sequence rendering (reference draw_flow.py:100-156):
    for each flow frame, render the enclosed events over the flow plane and
    save the motion-compensated / uncompensated IWE pair.

    ``flow_imgs`` and ``plttype`` are accepted for reference-signature
    parity but unused: the flow ground plane is colored from ``flows``
    directly, and only the events rendering exists (the reference's voxel
    variant lives in `draw_event_stream.plot_between_frames`)."""
    crop = None if args.crop is None else (
        args.crop if isinstance(args.crop, (list, tuple))
        else parse_crop(args.crop))
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    flow_ts = np.asarray(flow_ts)
    if flow_ts.ndim == 1:
        flow_ts = frame_stamps_to_start_end(flow_ts)
    flow_event_idx = get_frame_indices(ts, flow_ts)

    # n flow frames span n-1 intervals
    for i in range(0, min(len(flows), len(flow_event_idx)),
                   args.skip_frames):
        flow = flows[i]
        s, e = (int(flow_event_idx[i, 0]), int(flow_event_idx[i, 1]))
        if e <= s:
            continue
        base = os.path.join(args.output_path, f"flow_{i:09d}")
        # plain forward flow: motion_compensate's default negates into the
        # warp's backward convention (the old -flip(flip(...)) calibration
        # double-negated after that default landed)
        motion_compensate(xs[s:e], ys[s:e], ts[s:e], ps[s:e],
                          np.asarray(flow),
                          fname=base + "_compensated.png", crop=crop)
        motion_compensate(xs[s:e], ys[s:e], ts[s:e], ps[s:e],
                          np.zeros_like(np.asarray(flow)),
                          fname=base + "_raw.png", crop=crop)
        plot_flow_and_events(xs[s:e], ys[s:e], ts[s:e], ps[s:e], flow,
                             save_path=base + "_3d.png",
                             num_show=args.num_show,
                             event_size=args.event_size, elev=args.elev,
                             azim=args.azim,
                             show_events=not args.hide_events,
                             show_plot=args.show_plot, crop=crop,
                             stride=args.stride, show_axes=args.show_axes,
                             invert=args.invert)
