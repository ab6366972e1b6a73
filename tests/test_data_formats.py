"""IO-layer tests: packagers, readers, converters (tmp-file roundtrips)."""

import os

import numpy as np
import pytest

from event_utils_tpu.data_formats import (
    BagExtractor, compute_indices, h5_to_memmap, hdf5_packager,
    memmap_packager, read_h5_event_components, read_h5_events,
    read_h5_events_dict, read_memmap_events, read_memmap_events_dict,
    add_attribute, get_filepaths_from_path_or_file,
)
from conftest import make_events


@pytest.fixture
def h5_file(tmp_path, rng):
    """A packaged H5 with events + frames, via the BagExtractor write path."""
    xs, ys, ts, ps = make_events(rng, n=5000, sensor=(32, 48), t_max=1.0)
    path = str(tmp_path / "scene.h5")
    ep = hdf5_packager(path)
    ex = BagExtractor(ep, max_buffer_size=1000)
    ex.packager.set_data_available(3, 0)
    ex.add_events(xs, ys, ts, ps > 0)
    for i, ft in enumerate((0.25, 0.5, 0.75)):
        ex.add_image(np.zeros((32, 48), np.uint8), ft)
    ex.finalize()
    ep.close()
    return path, (xs, ys, ts, ps)


def test_h5_roundtrip(h5_file):
    path, (xs, ys, ts, ps) = h5_file
    rx, ry, rt, rp = read_h5_event_components(path)
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)
    np.testing.assert_allclose(rt, ts)
    np.testing.assert_array_equal(rp, ps)  # {0,1} on disk -> {-1,1}


def test_h5_block_and_dict(h5_file):
    path, (xs, ys, ts, ps) = h5_file
    block = read_h5_events(path)
    assert block.shape == (len(xs), 4)
    d = read_h5_events_dict(path)
    assert len(d["frames"]) == 3
    assert len(d["frame_timestamps"]) == 3
    assert (np.diff(d["frame_event_indices"]) >= 0).all()


def test_h5_metadata_attrs(h5_file):
    import h5py
    path, (xs, ys, ts, ps) = h5_file
    with h5py.File(path) as f:
        assert f.attrs["num_events"] == len(xs)
        assert f.attrs["num_pos"] == int((ps > 0).sum())
        assert f.attrs["num_neg"] == int((ps <= 0).sum())
        assert list(f.attrs["sensor_resolution"]) == [32, 48]
        # chunked, reference dtypes (event_packagers.py:90-93)
        assert f["events/xs"].dtype == np.int16
        assert f["events/ts"].dtype == np.float64
        assert f["events/ps"].dtype == np.bool_


def test_h5_to_memmap_roundtrip(h5_file, tmp_path):
    path, (xs, ys, ts, ps) = h5_file
    out = h5_to_memmap(path, str(tmp_path / "mm"))
    data = read_memmap_events(out, return_events=True)
    np.testing.assert_array_equal(data["xy"][:, 0], xs)
    np.testing.assert_allclose(data["t"], ts)
    d = read_memmap_events_dict(out, return_events=True)
    np.testing.assert_array_equal(d["xs"], xs)
    assert os.path.exists(os.path.join(out, "metadata.json"))


def test_memmap_packager(tmp_path, rng):
    xs, ys, ts, ps = make_events(rng, n=1000, sensor=(32, 48))
    out = str(tmp_path / "mmp")
    mp = memmap_packager(out)
    mp.package_events(xs, ys, ts, ps)
    mp.package_image(np.zeros((32, 48), np.uint8), 0.5)
    mp.add_metadata(len(xs), int((ps > 0).sum()), int((ps <= 0).sum()),
                    ts[-1] - ts[0], ts[0], ts[-1], 1, 0, sensor_size=(32, 48))
    data = read_memmap_events(out, return_events=True)
    assert data["num_events"] == len(xs)
    assert "index" in data


def test_compute_indices():
    ev = np.array([0.1, 0.2, 0.3, 0.4, 0.5]).reshape(-1, 1)
    fr = np.array([0.15, 0.35, 0.55])
    idx = compute_indices(ev, fr)
    assert idx.shape == (2, 2)


def test_add_attribute(h5_file):
    import h5py
    path, _ = h5_file
    add_attribute([path], "source", "esim")
    with h5py.File(path) as f:
        assert f.attrs["source"] == "esim"
    add_attribute([path], "would_be", "skipped", dry_run=True)


def test_filepaths_resolution(tmp_path):
    (tmp_path / "a.h5").touch()
    (tmp_path / "b.h5").touch()
    assert len(get_filepaths_from_path_or_file(str(tmp_path))) == 2
    lst = tmp_path / "list.txt"
    lst.write_text("x.h5\ny.h5\n")
    assert get_filepaths_from_path_or_file(str(lst)) == ["x.h5", "y.h5"]


def test_rosbag_gated():
    from event_utils_tpu.data_formats import extract_rosbag
    with pytest.raises(ImportError):
        extract_rosbag("/nope.bag", "/tmp/x.h5", "/dvs/events")


def test_index_npy_canonical_contract(tmp_path, rng):
    """Both writers emit the canonical (F, 2) int64 (start, end) table and
    the reader normalizes foreign layouts (review r2: the packager wrote
    reference-quirk (end, start) rows while h5_to_memmap wrote a different
    shape, and the reader transposed one of them)."""
    from event_utils_tpu.data_formats.read_events import (
        _normalize_frame_index, compute_indices, frame_event_indices,
        read_memmap_events)

    ts = np.sort(rng.uniform(0, 1, 500))
    frame_ts = np.array([0.25, 0.5, 0.75])
    canon = frame_event_indices(ts, frame_ts)
    assert canon.shape == (3, 2)
    assert (canon[:, 0] <= canon[:, 1]).all()
    assert canon[0, 0] == 0
    # start_i == end_{i-1} (between_frames convention)
    np.testing.assert_array_equal(canon[1:, 0], canon[:-1, 1])
    # ends are the searchsorted positions of the frame stamps
    np.testing.assert_array_equal(canon[:, 1], np.searchsorted(ts, frame_ts))

    # reference compute_indices output normalizes to (start, end)
    ref = compute_indices(ts.reshape(-1, 1), frame_ts)
    norm = _normalize_frame_index(ref, len(ts))
    assert (norm[:, 0] <= norm[:, 1]).all()
    # attr-dump (F,) layout normalizes too
    ends = np.searchsorted(ts, frame_ts)
    norm2 = _normalize_frame_index(ends, len(ts))
    np.testing.assert_array_equal(norm2, canon)


def test_memmap_writers_agree_on_index(tmp_path, rng):
    """memmap_packager and h5_to_memmap produce the SAME index.npy for the
    same recording."""
    import os

    from event_utils_tpu.data_formats.event_packagers import (hdf5_packager,
                                                              memmap_packager)
    from event_utils_tpu.data_formats.h5_to_memmap import main as h5mm
    from event_utils_tpu.data_formats.read_events import read_memmap_events

    n = 2000
    xs = rng.integers(0, 32, n).astype(np.int16)
    ys = rng.integers(0, 24, n).astype(np.int16)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.integers(0, 2, n).astype(np.int8)
    frames = [(np.full((24, 32), i, np.uint8), 0.2 + 0.3 * i) for i in range(3)]

    h5p = str(tmp_path / "scene.h5")
    ep = hdf5_packager(h5p)
    ep.set_data_available(3, 0)
    ep.package_events(xs, ys, ts, ps)
    for i, (img, ft) in enumerate(frames):
        ep.package_image(img, ft, i)
    ep.add_metadata(n, int((ps > 0).sum()), int((ps == 0).sum()),
                    ts[-1] - ts[0], ts[0], ts[-1], 3, 0, sensor_size=(24, 32))
    ep.close()

    mm_dir = str(tmp_path / "direct")
    mp = memmap_packager(mm_dir)
    mp.set_data_available(3, 0)
    mp.package_events(xs, ys, ts, ps)
    for i, (img, ft) in enumerate(frames):
        mp.package_image(img, ft, i)
    mp.add_metadata(n, int((ps > 0).sum()), int((ps == 0).sum()),
                    ts[-1] - ts[0], ts[0], ts[-1], 3, 0, sensor_size=(24, 32))

    conv_root = str(tmp_path / "converted")
    h5mm([h5p, "--output_dir", conv_root])
    conv_dir = os.path.join(conv_root, "scene")

    i1 = np.load(os.path.join(mm_dir, "index.npy"))
    i2 = np.load(os.path.join(conv_dir, "index.npy"))
    np.testing.assert_array_equal(i1, i2)
    # reader exposes the canonical table either way
    d = read_memmap_events(mm_dir)
    np.testing.assert_array_equal(np.asarray(d["index"]), i1)
    assert (i1[:, 0] <= i1[:, 1]).all()


# ---------------------------------------------------------------------------
# ECD-style text IO (txt_events.py — the format the reference's demo
# recordings are distributed in)
# ---------------------------------------------------------------------------

def _txt_stream(rng, n=500, sensor=(24, 32)):
    H, W = sensor
    xs = rng.integers(0, W, n).astype(np.int64)
    ys = rng.integers(0, H, n).astype(np.int64)
    ts = np.sort(rng.uniform(0.0, 0.4, n))
    ps = rng.choice(np.array([-1.0, 1.0]), n)
    return xs, ys, ts, ps


def test_txt_events_roundtrip(rng, tmp_path):
    from event_utils_tpu.data_formats import read_txt_events, write_txt_events
    xs, ys, ts, ps = _txt_stream(rng)
    path = str(tmp_path / "events.txt")
    write_txt_events(path, xs, ys, ts, ps)
    rx, ry, rt, rp = read_txt_events(path)
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)
    np.testing.assert_allclose(rt, ts, atol=1e-9)
    np.testing.assert_array_equal(rp, ps)  # {0,1} on disk -> {-1,1} read


def test_txt_events_gz_and_chunked(rng, tmp_path):
    import gzip
    from event_utils_tpu.data_formats import read_txt_events, write_txt_events
    xs, ys, ts, ps = _txt_stream(rng, n=700)
    plain = str(tmp_path / "events.txt")
    write_txt_events(plain, xs, ys, ts, ps)
    gz = str(tmp_path / "events.txt.gz")
    with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    rx, _, rt, _ = read_txt_events(gz, chunk_rows=100)  # 7 chunks
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_allclose(rt, ts, atol=1e-9)


def test_txt_events_malformed_raises(tmp_path):
    from event_utils_tpu.data_formats import read_txt_events
    from event_utils_tpu.errors import DataFormatError, DataNotFoundError
    bad = tmp_path / "bad.txt"
    bad.write_text("0.1 3 4 1\n0.2 five 4 0\n")
    with pytest.raises(DataFormatError):
        read_txt_events(str(bad))
    with pytest.raises(DataNotFoundError):
        read_txt_events(str(tmp_path / "missing.txt"))


def test_txt_to_h5_with_frames_feeds_loaders(rng, tmp_path):
    """Public-download shape: events.txt + images.txt + pngs -> HDF5 ->
    DynamicH5Dataset, end to end."""
    import cv2
    from event_utils_tpu.data_formats.txt_events import main as cli
    from event_utils_tpu.data_formats import read_h5_events_dict
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset

    xs, ys, ts, ps = _txt_stream(rng, n=800)
    evp = str(tmp_path / "events.txt")
    from event_utils_tpu.data_formats import write_txt_events
    write_txt_events(evp, xs, ys, ts, ps)
    lines = []
    for k, t in enumerate(np.linspace(ts[0], ts[-1], 4)):
        name = f"frame_{k:04d}.png"
        cv2.imwrite(str(tmp_path / name),
                    rng.integers(0, 255, (24, 32), np.uint8))
        lines.append(f"{t:.9f} {name}")
    (tmp_path / "images.txt").write_text("\n".join(lines) + "\n")

    h5p = str(tmp_path / "out.h5")
    cli([evp, h5p, "--images_txt", str(tmp_path / "images.txt"),
         "--sensor", "24", "32"])

    d = read_h5_events_dict(h5p)
    assert len(d["ts"]) == 800 and len(d["frames"]) == 4
    ds = DynamicH5Dataset(h5p, num_bins=3,
                          voxel_method={"method": "between_frames"},
                          combined_voxel_channels=True,
                          return_format="numpy")
    # Window i holds the events *up to* frame i (reference semantics,
    # base_dataset.py:322-336): window 0 is degenerate here because frame 0
    # sits at the first event, so assert on window 1.
    item = ds[1]
    assert item["voxel"].shape == (3, 24, 32)
    assert np.abs(item["voxel"]).sum() > 0


def test_normalize_reference_compute_indices_table(rng, tmp_path):
    """A reference compute_indices index.npy ((F-1, 2) reversed rows
    covering [frame_i, frame_{i+1})) must normalize into the canonical
    (F, 2) events-up-to-frame-i table, not just a column swap."""
    from event_utils_tpu.data_formats import (compute_indices,
                                              memmap_packager,
                                              read_memmap_events)
    from event_utils_tpu.data_formats.read_events import frame_event_indices

    n = 600
    ts = np.sort(rng.uniform(0.0, 1.0, n))
    frame_ts = np.linspace(0.1, 0.9, 5)
    d = str(tmp_path / "refidx")
    mp = memmap_packager(d)
    mp.package_events(rng.integers(0, 32, n), rng.integers(0, 24, n),
                      ts, rng.choice([-1.0, 1.0], n))
    for k, ft in enumerate(frame_ts):
        mp.package_image(rng.integers(0, 255, (24, 32), np.uint8), ft, k)
    mp.add_metadata(n, 0, 0, 1.0, 0.0, 1.0, 5, 0, sensor_size=(24, 32))
    # overwrite index.npy with the REFERENCE layout
    np.save(os.path.join(d, "index.npy"),
            compute_indices(ts.reshape(-1, 1), frame_ts))

    # our metadata still carries the start_end_v1 marker: the mixed-tooling
    # directory must be surfaced as a hard error, not silently mis-paired
    import json

    from event_utils_tpu.errors import DataFormatError
    with pytest.raises(DataFormatError):
        read_memmap_events(d)

    # a genuinely reference-written directory has no marker: the heuristic
    # must realign AND re-row the table, not just swap columns
    mpath = os.path.join(d, "metadata.json")
    meta = json.load(open(mpath))
    meta.pop("index_layout")
    json.dump(meta, open(mpath, "w"))

    got = read_memmap_events(d)["index"]
    expect = frame_event_indices(ts.reshape(-1, 1), frame_ts)
    np.testing.assert_array_equal(got, expect)


def test_read_memmap_events_nested_root_and_partial(rng, tmp_path):
    from event_utils_tpu.data_formats import memmap_packager, read_memmap_events
    from event_utils_tpu.errors import DataNotFoundError

    root = tmp_path / "nested"
    sub = root / "scene0"
    mp = memmap_packager(str(sub))
    n = 100
    mp.package_events(rng.integers(0, 32, n), rng.integers(0, 24, n),
                      np.sort(rng.uniform(0, 1, n)),
                      rng.choice([-1.0, 1.0], n))
    mp.add_metadata(n, 0, 0, 1.0, 0.0, 1.0, 0, 0)
    # reference-style: components one level below the root the user passes
    d = read_memmap_events(str(root))
    assert d["num_events"] == n

    # partial dir: typed error naming the missing files, not a KeyError
    partial = tmp_path / "partial"
    partial.mkdir()
    np.save(str(partial / "t.npy"), np.sort(rng.uniform(0, 1, 10)).reshape(-1, 1))
    with pytest.raises(DataNotFoundError):
        read_memmap_events(str(partial))


def test_memmap_packager_streams_chunked(rng, tmp_path):
    """Spill-file streaming: many small package_events calls with a tiny
    max_buffer_size finalize into the exact same npy contents."""
    from event_utils_tpu.data_formats import memmap_packager, read_memmap_events

    d = str(tmp_path / "stream")
    mp = memmap_packager(d, max_buffer_size=64)  # force many copy chunks
    all_xs, all_ts = [], []
    t_cursor = 0.0
    for _ in range(7):
        m = int(rng.integers(10, 50))
        xs = rng.integers(0, 32, m)
        ts = t_cursor + np.sort(rng.uniform(0, 0.01, m))
        t_cursor = ts[-1]
        mp.package_events(xs, rng.integers(0, 24, m), ts,
                          rng.choice([-1.0, 1.0], m))
        all_xs.append(xs)
        all_ts.append(ts)
    n = sum(len(a) for a in all_xs)
    mp.add_metadata(n, 0, 0, 1.0, 0.0, 1.0, 0, 0)
    d2 = read_memmap_events(d, return_events=True)
    assert d2["num_events"] == n
    np.testing.assert_array_equal(d2["xy"][:, 0], np.concatenate(all_xs))
    np.testing.assert_allclose(np.asarray(d2["t"]).squeeze(),
                               np.concatenate(all_ts))
    assert not [f for f in os.listdir(d) if f.startswith(".")]  # no spills


def test_memmap_to_h5_roundtrip(rng, tmp_path):
    """memmap -> H5 (new converter, reverse of h5_to_memmap): events,
    frames, flow and metadata survive the full round trip."""
    from event_utils_tpu.data_formats import (memmap_packager, memmap_to_h5,
                                              read_h5_events_dict)

    d = str(tmp_path / "src")
    mp = memmap_packager(d)
    n = 1200
    xs = rng.integers(0, 32, n)
    ys = rng.integers(0, 24, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    mp.package_events(xs, ys, ts, ps)
    for k, ft in enumerate((0.25, 0.5, 0.75)):
        mp.package_image(rng.integers(0, 255, (24, 32), np.uint8), ft, k)
        mp.package_flow(rng.normal(size=(2, 24, 32)).astype(np.float32),
                        ft, k)
    mp.add_metadata(n, int((ps > 0).sum()), int((ps < 0).sum()),
                    ts[-1] - ts[0], ts[0], ts[-1], 3, 3,
                    sensor_size=(24, 32))

    h5p = str(tmp_path / "out.h5")
    memmap_to_h5(d, h5p, chunk_size=500)  # forces multi-chunk streaming
    got = read_h5_events_dict(h5p)
    np.testing.assert_array_equal(got["xs"], xs)
    np.testing.assert_array_equal(got["ys"], ys)
    np.testing.assert_allclose(got["ts"], ts)
    np.testing.assert_array_equal(got["ps"], ps)
    assert len(got["frames"]) == 3

    import h5py
    with h5py.File(h5p) as f:
        assert f.attrs["num_events"] == n
        assert list(f.attrs["sensor_resolution"]) == [24, 32]
        assert len(f["flow"]) == 3
