"""Native (C++) ingest runtime tests — compiled vs numpy fallback parity."""

import numpy as np
import pytest

from event_utils_tpu import native
from conftest import make_events


def test_library_builds():
    assert native.build(), "libevio failed to build (g++ required)"
    assert native.available()


def test_searchsorted_parity(rng):
    ts = np.sort(rng.uniform(0, 10, 5000))
    for x in (0.0, 3.3, 10.5, float(ts[17])):
        for side in ("left", "right"):
            assert native.searchsorted_f64(ts, x, side) == int(
                np.searchsorted(ts, x, side=side))


def test_k_event_windows():
    win = native.k_event_windows(10000, 1000, 0)
    assert win.shape == (10, 2)
    assert (win[:, 1] - win[:, 0] == 1000).all()
    win = native.k_event_windows(10000, 1000, 500)
    assert (np.diff(win[:, 0]) == 500).all()


def test_t_second_windows(rng):
    ts = np.sort(rng.uniform(0, 1.0, 10000))
    win = native.t_second_windows(ts, 0.25, 0.0)
    assert len(win) >= 3
    for s, e in win:
        if e > s:
            assert ts[e - 1] - ts[s] <= 0.25 + 1e-9


def test_fill_padded_batches_parity(rng):
    n = 5000
    t = np.sort(rng.uniform(0, 1, n)).astype(np.float64)
    xy = rng.integers(0, 200, (n, 2)).astype(np.int16)
    p = (rng.uniform(size=n) > 0.5).astype(np.uint8)
    windows = native.k_event_windows(n, 1000, 0)
    ev, mask, trunc = native.fill_padded_batches(t, xy, p, windows, 1024)
    assert ev.shape == (5, 1024, 4)
    assert trunc == 0
    assert mask.sum() == 5000
    # spot-check window 2 against numpy
    s, e = windows[2]
    np.testing.assert_allclose(ev[2, :1000, 0], xy[s:e, 0])
    np.testing.assert_allclose(ev[2, :1000, 2], t[s:e] - t[s], atol=1e-6)
    np.testing.assert_allclose(ev[2, :1000, 3], np.where(p[s:e], 1, -1))
    # padding carries last timestamp + zero mask
    assert (mask[2, 1000:] == 0).all()
    np.testing.assert_allclose(ev[2, 1000:, 2], ev[2, 999, 2])


def test_fill_padded_truncation(rng):
    n = 3000
    t = np.sort(rng.uniform(0, 1, n))
    xy = rng.integers(0, 100, (n, 2)).astype(np.int16)
    p = (rng.uniform(size=n) > 0.5).astype(np.uint8)
    windows = np.array([[0, 3000]], np.int64)
    ev, mask, trunc = native.fill_padded_batches(t, xy, p, windows, 2048)
    assert trunc == 3000 - 2048
    assert mask.sum() == 2048


def test_threaded_matches_single(rng):
    n = 20000
    t = np.sort(rng.uniform(0, 1, n))
    xy = rng.integers(0, 300, (n, 2)).astype(np.int16)
    p = (rng.uniform(size=n) > 0.5).astype(np.uint8)
    windows = native.k_event_windows(n, 512, 0)
    a = native.fill_padded_batches(t, xy, p, windows, 512, nthreads=1)
    b = native.fill_padded_batches(t, xy, p, windows, 512, nthreads=8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_native_windowed_loader(tmp_path, rng):
    from event_utils_tpu.data_formats import memmap_packager
    from event_utils_tpu.data_loaders import NativeWindowedLoader
    xs, ys, ts, ps = make_events(rng, n=10000, sensor=(32, 48), t_max=1.0)
    out = str(tmp_path / "mm")
    mp = memmap_packager(out)
    mp.package_events(xs, ys, ts, ps)
    mp.add_metadata(len(xs), 0, 0, 1.0, 0.0, 1.0, 0, 0, sensor_size=(32, 48))

    loader = NativeWindowedLoader(out, method="k_events", k=1000,
                                  batch_size=4)
    batches = list(loader)
    assert len(batches) == 3  # 10 windows / 4
    b0 = batches[0]
    assert b0["events"].shape == (4, 1024, 4)
    assert b0["events_mask"].sum() == 4000
    # window-relative timestamps start at 0 and stay sorted
    assert b0["events"][0, 0, 2] == 0.0
    assert (np.diff(b0["events"][0, :1000, 2]) >= 0).all()
    # feeds the jitted voxel kernel directly
    import jax.numpy as jnp
    from event_utils_tpu.representations import events_to_voxel
    ev = b0["events"]
    vox = events_to_voxel(ev[0, :, 0], ev[0, :, 1], ev[0, :, 2], ev[0, :, 3],
                          5, sensor_size=(32, 48),
                          mask=jnp.asarray(b0["events_mask"][0]))
    assert np.isfinite(np.asarray(vox)).all()


def test_h5_windowed_loader_matches_memmap_loader(tmp_path, rng):
    """The H5 slab-streaming loader must produce byte-identical batches to
    the memmap loader over the same events (same windows, same capacity)."""
    import h5py

    from event_utils_tpu.data_loaders.native_loader import (
        H5WindowedLoader, NativeWindowedLoader)

    n = 50000
    t = np.sort(rng.uniform(0, 2, n))
    xs = rng.integers(0, 240, n).astype(np.int16)
    ys = rng.integers(0, 180, n).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.uint8)

    h5p = str(tmp_path / "ev.h5")
    with h5py.File(h5p, "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=xs)
        g.create_dataset("ys", data=ys)
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=p.astype(bool))

    mmd = tmp_path / "mm"
    mmd.mkdir()
    np.save(mmd / "t.npy", t[:, None])
    np.save(mmd / "xy.npy", np.stack([xs, ys], axis=1))
    np.save(mmd / "p.npy", p[:, None])

    kw = dict(method="k_events", k=4000, batch_size=4, capacity=4096)
    lh = H5WindowedLoader(h5p, **kw)
    lm = NativeWindowedLoader(str(mmd), **kw)
    assert len(lh) == len(lm)
    total = 0
    for bh, bm in zip(lh, lm):
        np.testing.assert_array_equal(bh["events"], bm["events"])
        np.testing.assert_array_equal(bh["events_mask"], bm["events_mask"])
        total += 1
    assert total == len(lh)
    lh.close()


def test_h5_windowed_loader_t_seconds_and_no_prefetch(tmp_path, rng):
    import h5py

    from event_utils_tpu.data_loaders.native_loader import H5WindowedLoader

    n = 20000
    t = np.sort(rng.uniform(0, 1, n))
    with h5py.File(str(tmp_path / "e.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=rng.integers(0, 64, n).astype(np.int16))
        g.create_dataset("ys", data=rng.integers(0, 48, n).astype(np.int16))
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=rng.integers(0, 2, n).astype(bool))
    ld = H5WindowedLoader(str(tmp_path / "e.h5"), method="t_seconds", t=0.1,
                          batch_size=2, prefetch=False)
    batches = list(ld)
    assert len(batches) == len(ld)
    for b in batches:
        m = b["events_mask"]
        ev = b["events"]
        # masked-on events in bounds, polarity +-1
        on = m != 0
        assert set(np.unique(ev[..., 3][on])) <= {-1.0, 1.0}
        # window-relative timestamps start at ~0 and are sorted per window
        for w in range(ev.shape[0]):
            tw = ev[w, :, 2][m[w] != 0]
            if len(tw):
                assert tw[0] == 0.0
                assert np.all(np.diff(tw) >= 0)
    ld.close()


def test_h5_prefetch_slow_consumer_no_corruption(tmp_path, rng):
    """Regression (r2 review): the prefetch reader must never overwrite a
    slab still queued or being consumed — a slow consumer has to receive
    byte-identical batches to the synchronous path."""
    import time

    import h5py

    from event_utils_tpu.data_loaders.native_loader import H5WindowedLoader

    n = 60000
    t = np.sort(rng.uniform(0, 2, n))
    with h5py.File(str(tmp_path / "p.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=rng.integers(0, 240, n).astype(np.int16))
        g.create_dataset("ys", data=rng.integers(0, 180, n).astype(np.int16))
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=rng.integers(0, 2, n).astype(bool))

    kw = dict(method="k_events", k=1500, batch_size=2, capacity=2048)
    ref = [(b["events"].copy(), b["events_mask"].copy())
           for b in H5WindowedLoader(str(tmp_path / "p.h5"), prefetch=False,
                                     **kw)]
    ld = H5WindowedLoader(str(tmp_path / "p.h5"), prefetch=True, **kw)
    got = []
    for b in ld:
        time.sleep(0.002)  # slow consumer: reader runs far ahead
        got.append((b["events"].copy(), b["events_mask"].copy()))
    assert len(got) == len(ref)
    bad = sum(not np.array_equal(g[0], r[0]) for g, r in zip(got, ref))
    assert bad == 0, f"{bad}/{len(ref)} corrupted batches"
    ld.close()


def test_h5_prefetch_reader_errors_propagate(tmp_path, rng):
    """Regression (r2 review): a reader-thread failure must raise in the
    consumer, not silently end the epoch early."""
    import h5py

    from event_utils_tpu.data_loaders.native_loader import H5WindowedLoader

    n = 20000
    t = np.sort(rng.uniform(0, 1, n))
    with h5py.File(str(tmp_path / "e.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=rng.integers(0, 64, n).astype(np.int16))
        g.create_dataset("ys", data=rng.integers(0, 48, n).astype(np.int16))
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=rng.integers(0, 2, n).astype(bool))
    ld = H5WindowedLoader(str(tmp_path / "e.h5"), method="k_events", k=1000,
                          batch_size=2, capacity=1024)
    it = iter(ld)
    next(it)
    ld._h5.close()  # kill the file under the reader
    with pytest.raises(Exception):
        for _ in it:
            pass


def test_native_bucket_fill_matches_numpy(rng):
    """Native counting-sort bucket fill == the numpy vectorized pack."""
    import event_utils_tpu.native as nat
    from event_utils_tpu.contrast_max.events_cmax import bucket_events_by_roi

    assert nat.build()
    n = 30000
    H, W = 96, 128
    xs = rng.uniform(0, W - 1, n)
    ys = rng.uniform(0, H - 1, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    got = bucket_events_by_roi(xs, ys, ts, ps, (H, W), (32, 32),
                               capacity_cap=None)
    lib, failed = nat._lib, nat._load_failed
    nat._lib, nat._load_failed = None, True
    try:
        ref = bucket_events_by_roi(xs, ys, ts, ps, (H, W), (32, 32),
                                   capacity_cap=None)
    finally:
        nat._lib, nat._load_failed = lib, failed
    for a, b, name in zip(got[:6], ref[:6], "xytpmo"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)


def test_h5_loader_abandoned_iteration_no_corruption(tmp_path, rng):
    """Breaking out of a prefetching iteration must stop its reader thread:
    a survivor shares the rotating slab pool with the next epoch and would
    overwrite in-flight slabs (review r2)."""
    import time

    import h5py

    from event_utils_tpu.data_loaders.native_loader import H5WindowedLoader

    n = 20000
    t = np.sort(rng.uniform(0, 1, n))
    path = str(tmp_path / "a.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=rng.integers(0, 64, n).astype(np.int16))
        g.create_dataset("ys", data=rng.integers(0, 48, n).astype(np.int16))
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=rng.integers(0, 2, n).astype(bool))
    loader = H5WindowedLoader(path, method="k_events", k=500,
                              batch_size=2, prefetch=True)
    full = [np.array(b["events"]) for b in loader]  # reference epoch

    it = iter(loader)
    next(it)  # consume one batch, then abandon
    del it
    time.sleep(0.2)  # give an orphaned reader time to misbehave (pre-fix)

    again = [np.array(b["events"]) for b in loader]
    assert len(again) == len(full)
    for a, b in zip(full, again):
        np.testing.assert_array_equal(a, b)
    stop = getattr(loader, "_reader_stop", None)
    assert stop is not None and stop.is_set()


def test_window_tables_reject_degenerate_stride():
    """overlap >= width is a typed configuration error, not an infinite
    window table / giant allocation (review r2)."""
    import pytest

    from event_utils_tpu import native
    from event_utils_tpu.errors import ConfigurationError

    with pytest.raises(ConfigurationError):
        native.k_event_windows(1000, k=100, overlap=100)
    with pytest.raises(ConfigurationError):
        native.t_second_windows(np.linspace(0, 1, 100), t_width=0.1,
                                overlap=0.1)


def test_h5_loader_window_indices_absolute(tmp_path, rng):
    """H5WindowedLoader must yield ABSOLUTE event-file indices for
    window_idx0/1 — the same contract as NativeWindowedLoader (they used
    to be slab-relative from the second slab on)."""
    import h5py

    from event_utils_tpu.data_loaders.native_loader import H5WindowedLoader

    n = 8000
    t = np.sort(rng.uniform(0, 1, n))
    with h5py.File(str(tmp_path / "abs.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=rng.integers(0, 64, n).astype(np.int16))
        g.create_dataset("ys", data=rng.integers(0, 48, n).astype(np.int16))
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=rng.integers(0, 2, n).astype(bool))
    ld = H5WindowedLoader(str(tmp_path / "abs.h5"), method="k_events",
                          k=500, batch_size=2, prefetch=False)
    expected_start = 0
    count = 0
    for b in ld:
        for i0, i1 in zip(b["window_idx0"], b["window_idx1"]):
            assert i0 == expected_start, (i0, expected_start)
            assert i1 == expected_start + 500
            # stamps must agree with the absolute index into the file
            expected_start += 500
            count += 1
        np.testing.assert_allclose(
            b["t_starts"], t[np.asarray(b["window_idx0"], np.int64)])
    assert count > 4  # spans multiple slabs
