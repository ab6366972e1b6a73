"""Visualization smoke tests (headless Agg backend)."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from conftest import make_events

SENSOR = (32, 48)


def test_plot_events(tmp_path, rng):
    from event_utils_tpu.visualization import plot_events
    xs, ys, ts, ps = make_events(rng, n=800, sensor=SENSOR)
    out = str(tmp_path / "ev.png")
    plot_events(xs, ys, ts, ps, save_path=out, num_show=400, dpi=80,
                img_size=SENSOR)
    assert os.path.getsize(out) > 1000


def test_plot_events_with_frame(tmp_path, rng):
    from event_utils_tpu.visualization import plot_events
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR)
    frame = rng.integers(0, 255, SENSOR).astype(np.uint8)
    out = str(tmp_path / "evf.png")
    plot_events(xs, ys, ts, ps, save_path=out, num_show=300, dpi=80,
                imgs=[frame], img_ts=[float(ts[len(ts) // 2])],
                img_size=SENSOR)
    assert os.path.getsize(out) > 1000


def test_plot_voxel_grid_3d(tmp_path, rng):
    from event_utils_tpu.visualization import plot_voxel_grid
    xs, ys, ts, ps = make_events(rng, n=800, sensor=SENSOR)
    out = str(tmp_path / "vox.png")
    plot_voxel_grid(xs, ys, ts, ps, bins=3, sensor_size=SENSOR,
                    save_path=out, show_plot=False, downsample=8)
    assert os.path.getsize(out) > 500


def test_visualizer_registry(tmp_path, rng):
    """Registry dispatch + error path + one real render (the other two
    renders are the slow-marked test below — each is a dpi-600 mpl save)."""
    from event_utils_tpu.visualization import get_visualizer
    xs, ys, ts, ps = make_events(rng, n=600, sensor=SENSOR)
    data = {"events": np.stack([xs, ys, ts, ps], 1),
            "frame": [], "frame_ts": []}
    viz = get_visualizer("event_image", SENSOR)
    out = str(tmp_path / "event_image.png")
    viz.plot_events(data, out)
    assert os.path.getsize(out) > 500
    for name in ("ts_image", "voxel_image"):
        assert get_visualizer(name, SENSOR) is not None
    with pytest.raises(KeyError):
        get_visualizer("nope", SENSOR)


@pytest.mark.slow  # two more dpi-600 matplotlib renders
def test_visualizer_registry_all_render(tmp_path, rng):
    from event_utils_tpu.visualization import get_visualizer
    xs, ys, ts, ps = make_events(rng, n=600, sensor=SENSOR)
    data = {"events": np.stack([xs, ys, ts, ps], 1),
            "frame": [], "frame_ts": []}
    for name in ("ts_image", "voxel_image"):
        viz = get_visualizer(name, SENSOR)
        out = str(tmp_path / f"{name}.png")
        viz.plot_events(data, out)
        assert os.path.getsize(out) > 500


def test_motion_compensate(tmp_path, rng):
    from event_utils_tpu.visualization import motion_compensate
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR, int_coords=False)
    flow = np.zeros((2,) + SENSOR, np.float32)
    out = str(tmp_path / "mc.png")
    img = motion_compensate(xs, ys, ts, ps, flow, fname=out)
    assert img.shape == (SENSOR[0] + 1, SENSOR[1] + 1)
    assert os.path.getsize(out) > 500


def test_flow2bgr(rng):
    from event_utils_tpu.utils import flow2bgr_np
    u = rng.normal(size=SENSOR)
    v = rng.normal(size=SENSOR)
    bgr = flow2bgr_np(u, v)
    assert bgr.shape == SENSOR + (3,)
    assert bgr.dtype == np.uint8


def test_draw_plane(tmp_path):
    from event_utils_tpu.visualization import draw_plane_figure
    out = str(tmp_path / "plane.png")
    draw_plane_figure(save_path=out)
    assert os.path.getsize(out) > 1000


def test_parse_crop():
    from event_utils_tpu.visualization import crop_to_size, parse_crop
    assert parse_crop("100x80+10+20") == [20, 100, 10, 110]
    assert crop_to_size([20, 100, 10, 110]) == [80, 100]
    with pytest.raises(ValueError):
        parse_crop("garbage")


def test_incremental_accumulators(rng):
    from event_utils_tpu.representations import EventImage, TimestampImage
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR)
    ti = TimestampImage(SENSOR)
    ti.add_events(xs, ys, ts, ps)
    img = ti.get_image()
    assert img.shape == SENSOR and 0 <= img.min() and img.max() <= 1

    ei = EventImage(SENSOR)
    ei.add_events(xs, ys, ts, ps)
    norm = ei.get_image()
    assert norm.shape == SENSOR and norm.max() <= 1


def test_crop_parameters():
    from event_utils_tpu.utils import CropParameters
    cp = CropParameters(240, 180, num_encoders=3)
    x = np.zeros((1, 180, 240))
    padded = cp.pad(x)
    assert padded.shape[-2] % 8 == 0 and padded.shape[-1] % 8 == 0
    assert cp.crop(padded).shape == x.shape


def test_mayavi_helpers_without_gl():
    """The mayavi twin's renderer-independent math (padding, windowing,
    polarity LUT) runs without a GL stack; GL entry points raise a clear
    ImportError when mayavi is absent."""
    from event_utils_tpu.visualization import draw_event_stream_mayavi as m

    ts = np.linspace(1.0, 2.0, 100)
    xs = np.arange(100.0)
    ys = np.arange(100.0)
    ps = np.where(np.arange(100) % 2 == 0, 1.0, -1.0)
    fts = np.asarray([1.2, 1.7])
    px, py, pt, pp, pf = m.pad_sliding_head(xs, ys, ts, ps, fts, dt=0.2,
                                            sdt=0.05)
    assert pt[0] == 0.0                       # time re-zeroed
    assert len(px) == len(xs) + 4             # one window of sdt pads
    assert np.all(pp[:4] == 0)                # dummy events carry p=0
    assert np.allclose(pf - fts, pf[0] - fts[0])  # frames shifted rigidly

    wins = m.sliding_windows(pt, pf, dt=0.2, sdt=0.1)
    assert len(wins) > 5
    (e0, e1), (f0, f1) = wins[0]
    assert 0 <= e0 < e1 <= len(pt)
    assert 0 <= f0 <= f1 <= len(pf)

    colors, ones = m.event_colors_lut(pp)
    assert set(np.unique(colors)) <= {0, 240}
    assert np.all(ones[:4] == 0)              # padding glyphs scale 0

    if not m.available():
        with pytest.raises(ImportError, match="mayavi"):
            m.plot_events(xs, ys, ts, ps)
