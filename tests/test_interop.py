"""Cross-framework file interoperability against the ACTUAL reference IO.

A user switching from TimoStoff/event_utils must be able to (a) load files
written by the reference's converters with this framework, and (b) keep
using reference tooling on files this framework writes. These tests write
with one side's packager/converter and read with the other side's readers,
asserting the payloads round-trip exactly.
"""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF_ROOT, "lib")),
                                reason="reference tree not mounted")

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

SENSOR = (32, 48)


def _events(rng, n=6000):
    xs = rng.integers(0, SENSOR[1], n).astype(np.int16)
    ys = rng.integers(0, SENSOR[0], n).astype(np.int16)
    ts = np.sort(rng.uniform(0.0, 1.0, n))
    ps = rng.integers(0, 2, n).astype(bool)
    return xs, ys, ts, ps


def _write_ours(path, rng):
    from event_utils_tpu.data_formats import hdf5_packager

    xs, ys, ts, ps = _events(rng)
    ep = hdf5_packager(str(path))
    ep.set_data_available(2, 0)
    ep.package_events(xs, ys, ts, ps)
    for i, ft in enumerate((0.3, 0.7)):
        ep.package_image((rng.integers(0, 255, SENSOR)).astype(np.uint8),
                         ft, i)
    ep.add_metadata(len(xs), int(ps.sum()), int((~ps).sum()),
                    ts[-1] - ts[0], ts[0], ts[-1], 2, 0, sensor_size=SENSOR)
    ep.close()
    return xs, ys, ts, ps


def _write_reference(path, rng):
    from lib.data_formats.event_packagers import hdf5_packager as ref_packager

    xs, ys, ts, ps = _events(rng)
    ep = ref_packager(str(path))
    ep.set_data_available(2, 0)
    ep.package_events(xs, ys, ts, ps)
    for i, ft in enumerate((0.3, 0.7)):
        ep.package_image((rng.integers(0, 255, SENSOR)).astype(np.uint8),
                         ft, i)
    ep.add_metadata(int(ps.sum()), int((~ps).sum()), ts[-1] - ts[0],
                    ts[0], ts[-1], 2, 0, SENSOR)
    ep.events_file.close()
    return xs, ys, ts, ps


def test_our_h5_reads_with_reference_readers(tmp_path, rng):
    from lib.data_formats.read_events import (read_h5_event_components,
                                              read_h5_events_dict)

    path = tmp_path / "ours.h5"
    xs, ys, ts, ps = _write_ours(path, rng)
    rx, ry, rt, rp = read_h5_event_components(str(path))
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)
    np.testing.assert_allclose(rt, ts)
    np.testing.assert_array_equal(rp, np.where(ps, 1, -1))
    d = read_h5_events_dict(str(path))
    assert len(d["frames"]) == 2
    assert np.allclose(d["frame_timestamps"], [0.3, 0.7])
    assert len(d["frame_event_indices"]) == 2  # event_idx attr present


def test_reference_h5_reads_with_our_readers(tmp_path, rng):
    from event_utils_tpu.data_formats import (read_h5_event_components,
                                              read_h5_events_dict)

    path = tmp_path / "ref.h5"
    xs, ys, ts, ps = _write_reference(path, rng)
    rx, ry, rt, rp = read_h5_event_components(str(path))
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)
    np.testing.assert_allclose(rt, ts)
    np.testing.assert_array_equal(rp, np.where(ps, 1, -1))
    d = read_h5_events_dict(str(path))
    assert len(d["frames"]) == 2


def test_reference_h5_through_our_dataset_and_loader(tmp_path, rng):
    """A reference-written H5 drives the full training-input stack."""
    from event_utils_tpu.data_loaders import DynamicH5Dataset
    from event_utils_tpu.data_loaders.native_loader import H5WindowedLoader

    path = tmp_path / "ref2.h5"
    xs, ys, ts, ps = _write_reference(path, rng)
    ds = DynamicH5Dataset(str(path), voxel_method={"method": "k_events",
                                                   "k": 1000,
                                                   "sliding_window_w": 0})
    item = ds[0]
    assert item["voxel"].shape[-2:] == tuple(SENSOR)

    ld = H5WindowedLoader(str(path), method="k_events", k=1000, batch_size=2,
                          capacity=1024)
    batch = next(iter(ld))
    assert batch["events"].shape == (2, 1024, 4)
    on = batch["events_mask"] != 0
    assert set(np.unique(batch["events"][..., 3][on])) <= {-1.0, 1.0}
    ld.close()


def test_our_memmap_reads_with_reference_reader(tmp_path, rng):
    """h5 -> memmap conversion output loads with the reference's
    read_memmap_events."""
    from lib.data_formats.read_events import read_memmap_events as ref_read
    from event_utils_tpu.data_formats.h5_to_memmap import main as convert

    path = tmp_path / "src.h5"
    xs, ys, ts, ps = _write_ours(path, rng)
    out = tmp_path / "mm"
    convert([str(path), "--output_dir", str(out)])
    sub = os.path.join(str(out), "src")
    data = ref_read(sub)
    np.testing.assert_array_equal(np.asarray(data["xy"])[:, 0], xs)
    np.testing.assert_array_equal(np.asarray(data["xy"])[:, 1], ys)
    np.testing.assert_allclose(np.asarray(data["t"]).squeeze(), ts)
