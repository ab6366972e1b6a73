"""Dataset/loader stack tests: windowing semantics, collation, prefetch."""

import numpy as np
import pytest

from event_utils_tpu.data_formats import hdf5_packager
from event_utils_tpu.data_loaders import (
    BaseVoxelDataset, CenterCrop, Compose, ConcatDataset, DynamicH5Dataset,
    EventDataLoader, MemMapDataset, NpyDataset, RobustNorm, build_transform,
    device_prefetch, unpack_batched_events,
)
from event_utils_tpu.data_formats.h5_to_memmap import h5_to_memmap
from conftest import make_events

SENSOR = (32, 48)


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    xs, ys, ts, ps = make_events(rng, n=8000, sensor=SENSOR, t_max=1.0)
    path = str(tmp_path_factory.mktemp("data") / "scene.h5")
    ep = hdf5_packager(path)
    ep.set_data_available(4, 0)
    ep.package_events(xs, ys, ts, ps > 0)
    for i, ft in enumerate(np.linspace(0.2, 0.8, 4)):
        ep.package_image(np.full(SENSOR, i, np.uint8), ft, i)
    ep.add_metadata(len(xs), int((ps > 0).sum()), int((ps <= 0).sum()),
                    ts[-1] - ts[0], ts[0], ts[-1], 4, 0, sensor_size=SENSOR)
    ep.close()
    return path


def test_k_events_windowing(h5_path):
    ds = DynamicH5Dataset(h5_path, voxel_method={"method": "k_events",
                                                 "k": 1000,
                                                 "sliding_window_w": 0},
                          return_events=True, return_frame=False,
                          return_flow=False)
    assert len(ds) == 8
    item = ds[0]
    assert item["idx1"] - item["idx0"] == 1000
    assert item["voxel"].shape == (2 * ds.num_bins,) + SENSOR  # split pol
    # overlap
    ds2 = DynamicH5Dataset(h5_path, voxel_method={"method": "k_events",
                                                  "k": 1000,
                                                  "sliding_window_w": 500},
                           return_events=True, return_frame=False,
                           return_flow=False)
    i0 = ds2[0]
    i1 = ds2[1]
    assert i1["idx0"] == i0["idx0"] + 500


def test_t_seconds_windowing(h5_path):
    ds = DynamicH5Dataset(h5_path, voxel_method={"method": "t_seconds",
                                                 "t": 0.25,
                                                 "sliding_window_t": 0},
                          return_events=True, return_frame=False,
                          return_flow=False, combined_voxel_channels=True)
    item = ds[0]
    ev = item["events"]
    assert ev[:, 2].max() - ev[:, 2].min() <= 0.25 + 1e-6
    assert item["voxel"].shape == (ds.num_bins,) + SENSOR


def test_between_frames_windowing(h5_path):
    ds = DynamicH5Dataset(h5_path, return_events=True)
    assert len(ds) == 3  # num_frames - 1
    item = ds[1]
    assert "frame" in item and item["frame"].shape[-2:] == SENSOR
    assert "flow" in item  # zeros when absent
    assert item["flow"].shape == (2,) + SENSOR


def test_fixed_frames_windowing(h5_path):
    ds = DynamicH5Dataset(h5_path, voxel_method={"method": "fixed_frames",
                                                 "num_frames": 5},
                          return_frame=False, return_flow=False)
    assert len(ds) == 5


def test_collate_fn_and_padded(h5_path):
    ds = DynamicH5Dataset(h5_path, voxel_method={"method": "k_events",
                                                 "k": 900,
                                                 "sliding_window_w": 0},
                          return_events=True, return_frame=False,
                          return_flow=False)
    items = [ds[i] for i in range(3)]
    ragged = BaseVoxelDataset.collate_fn(items)
    assert ragged["events"].shape == (2700, 4)
    assert list(ragged["events_batch_indices"]) == [900, 1800, 2700]
    padded = BaseVoxelDataset.collate_padded(items)
    assert padded["events"].shape == (3, 1024, 4)  # 900 -> pow2 bucket
    assert padded["events_mask"].sum() == 2700

    unpacked, mask = unpack_batched_events(ragged["events"],
                                           ragged["events_batch_indices"])
    assert unpacked.shape == (3, 900, 4)
    np.testing.assert_allclose(mask.sum(), 2700)


def test_loader_and_prefetch(h5_path):
    ds = DynamicH5Dataset(h5_path, voxel_method={"method": "k_events",
                                                 "k": 1000,
                                                 "sliding_window_w": 0},
                          return_events=True, return_frame=False,
                          return_flow=False)
    loader = EventDataLoader(ds, batch_size=3, shuffle=True, num_workers=1,
                             rng=np.random.default_rng(0))
    batches = list(device_prefetch(loader, prefetch_depth=2))
    assert len(batches) == len(loader) == 3
    assert batches[0]["voxel"].shape[0] == 3


def test_memmap_dataset_equivalence(h5_path, tmp_path):
    mm = h5_to_memmap(h5_path, str(tmp_path / "mm"))
    vm = {"method": "k_events", "k": 1000, "sliding_window_w": 0}
    ds_h5 = DynamicH5Dataset(h5_path, voxel_method=vm, return_events=True,
                             return_frame=False, return_flow=False)
    ds_mm = MemMapDataset(mm, voxel_method=vm, return_events=True,
                          return_frame=False, return_flow=False)
    a = ds_h5[2]
    b = ds_mm[2]
    np.testing.assert_allclose(np.asarray(a["voxel"]), np.asarray(b["voxel"]),
                               atol=1e-4)


def test_npy_dataset(tmp_path, rng):
    xs, ys, ts, ps = make_events(rng, n=2000, sensor=SENSOR)
    arr = np.stack([xs, ys, (ps > 0).astype(float), ts * 1e6], axis=1)
    path = str(tmp_path / "ev.npy")
    np.save(path, arr)
    ds = NpyDataset(path, voxel_method={"method": "k_events", "k": 500,
                                        "sliding_window_w": 0},
                    return_events=True, return_frame=False, return_flow=False)
    assert len(ds) == 4
    item = ds[0]
    assert set(np.unique(item["events"][:, 3])) <= {-1.0, 1.0}


@pytest.mark.slow  # multi-dataset assembly; single-dataset windowing tests stay fast
def test_concat_dataset(h5_path):
    vm = {"method": "k_events", "k": 2000, "sliding_window_w": 0}
    d1 = DynamicH5Dataset(h5_path, voxel_method=vm, return_frame=False,
                          return_flow=False)
    d2 = DynamicH5Dataset(h5_path, voxel_method=vm, return_frame=False,
                          return_flow=False)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == len(d1) + len(d2)
    assert cat[len(d1)]["idx0"] == d2[0]["idx0"]


def test_transforms():
    x = np.random.default_rng(0).normal(size=(3, 20, 30)).astype(np.float32)
    crop = CenterCrop((10, 12))
    assert crop(x).shape == (3, 10, 12)
    rn = RobustNorm()
    out = rn(x)
    # reference formula: (clamped - min) / (max + eps)  (data_augmentation.py
    # :122-128 — divides by max, not max-min; replicated for parity)
    t_max = RobustNorm.percentile(x, 95)
    t_min = RobustNorm.percentile(x, 0)
    clamped = np.clip(x, t_min, t_max)
    want = (clamped - clamped.min()) / (clamped.max() + 1e-6)
    np.testing.assert_allclose(out, want, atol=1e-6)
    comp = Compose([crop, rn])
    assert comp(x).shape == (3, 10, 12)
    with pytest.raises(KeyError):
        build_transform("Nope")


def test_transform_via_dataset(h5_path):
    ds = DynamicH5Dataset(h5_path,
                          transforms={"RobustNorm": {},
                                      "CenterCrop": {"size": (16, 24)}},
                          voxel_method={"method": "k_events", "k": 2000,
                                        "sliding_window_w": 0},
                          return_frame=False, return_flow=False)
    v = np.asarray(ds[0]["voxel"])
    assert v.shape[-2:] == (16, 24)


def test_memmap_flow_stamps_not_confused_with_frame_stamps(tmp_path):
    """ADVICE r1 (low): optic_flow_timestamps.npy must not be stored as
    frame_stamps by the endswith('timestamps.npy') match."""
    import numpy as np
    from event_utils_tpu.data_loaders.memmap_dataset import MemMapDataset

    d = tmp_path / "mm"
    d.mkdir()
    n = 500
    t = np.sort(np.random.default_rng(0).uniform(0, 1, n))
    np.save(d / "t.npy", t[:, None])
    xy = np.random.default_rng(1).integers(0, 30, (n, 2)).astype(np.int16)
    np.save(d / "xy.npy", xy)
    np.save(d / "p.npy", np.random.default_rng(2).integers(0, 2, (n, 1)).astype(np.uint8))
    flow_stamps = np.asarray([0.25, 0.75])
    np.save(d / "optic_flow_timestamps.npy", flow_stamps)
    ds = MemMapDataset(str(d), voxel_method={"method": "k_events", "k": 100,
                                             "sliding_window_w": 0})
    # flow stamps land in optic_flow_stamps; frame stamps stay empty
    assert len(ds.frame_ts) == 0
    assert np.allclose(ds.filehandle["optic_flow_stamps"], flow_stamps)


def test_default_loader_without_events_key(h5_path):
    """EventDataLoader over a dataset with return_events=False must not
    default to collate_padded (which requires item['events']; review r2)."""
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset
    from event_utils_tpu.data_loaders.prefetch import EventDataLoader

    ds = DynamicH5Dataset(h5_path, voxel_method={"method": "k_events",
                                                 "k": 2000,
                                                 "sliding_window_w": 0})
    batches = list(EventDataLoader(ds, batch_size=2))
    assert len(batches) >= 1
    assert "voxel" in batches[0]


def test_random_crop_synchronized_across_tensors():
    """RandomCrop must draw offsets from the stdlib random module so the
    per-item seed in BaseVoxelDataset._apply gives voxel/frame/flow the
    SAME window (review r2)."""
    import random

    from event_utils_tpu.data_loaders.data_augmentation import RandomCrop

    crop = RandomCrop(4)
    marker = np.arange(20 * 30, dtype=np.float32).reshape(1, 20, 30)
    random.seed(123)
    a = crop(marker)
    random.seed(123)
    b = crop(marker * 2.0)
    np.testing.assert_allclose(b, a * 2.0)  # same window


def test_h5_between_frames_uses_event_idx_attrs(h5_path):
    """DynamicH5Dataset's attrs-based between-frames windows must agree
    with the base class's binary-search computation (the override was dead
    code — named after the reference's own dead hook; review r2)."""
    from event_utils_tpu.data_loaders.base_dataset import BaseVoxelDataset
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset

    ds = DynamicH5Dataset(h5_path,
                          voxel_method={"method": "between_frames",
                                        "sliding_window_w": 0})
    expected = BaseVoxelDataset.compute_between_frame_indices(ds)
    assert ds.compute_between_frame_indices() == expected
    assert ds.event_indices == expected[:len(ds.event_indices)]


def test_prev_frame_and_flow_are_previous(h5_path):
    """prev_frame/prev_flow return index-1 data (documented divergence: the
    reference returns the CURRENT frame/flow for both)."""
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset

    ds = DynamicH5Dataset(h5_path,
                          voxel_method={"method": "between_frames",
                                        "sliding_window_w": 0},
                          return_frame=True, return_prev_frame=True,
                          return_format="numpy")
    item = ds[1]
    exp_prev = ds.get_frame(0)
    exp_cur = ds.get_frame(1)
    if not np.array_equal(exp_prev, exp_cur):  # frames differ in fixture
        assert not np.array_equal(item["prev_frame"], item["frame"])
    np.testing.assert_array_equal(np.asarray(item["prev_frame"]).squeeze(),
                                  exp_prev.squeeze())


def test_loader_producer_error_propagates(rng):
    """A failing dataset item inside the background producer must raise in
    the consumer, not silently truncate the epoch."""
    from event_utils_tpu.data_loaders.prefetch import EventDataLoader

    class Exploding:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt window")
            return {"x": np.zeros(3, np.float32)}

    loader = EventDataLoader(Exploding(), batch_size=2, num_workers=1)
    with pytest.raises(RuntimeError, match="corrupt window"):
        list(loader)
    # abandoning mid-epoch neither hangs nor leaks a blocked producer
    loader2 = EventDataLoader(Exploding(), batch_size=1, num_workers=2,
                              queue_depth=1)
    for _ in loader2:
        break


def test_t_seconds_windows_truly_overlap(tmp_path, rng):
    """sliding_window_t > 0 must yield duration-t OVERLAPPING windows (the
    reference chains start=prev end, silently making disjoint t-stride
    slices — documented divergence; our native t_second_windows always
    overlapped, so the two paths used to disagree)."""
    import h5py
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset

    n = 5000
    t = np.sort(rng.uniform(0.0, 1.0, n))
    path = str(tmp_path / "ov.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=rng.integers(0, 32, n).astype(np.int16))
        g.create_dataset("ys", data=rng.integers(0, 24, n).astype(np.int16))
        g.create_dataset("ts", data=t)
        g.create_dataset("ps", data=rng.integers(0, 2, n).astype(bool))
        f.attrs["sensor_resolution"] = (24, 32)
    ds = DynamicH5Dataset(path, num_bins=3, return_format="numpy",
                          voxel_method={"method": "t_seconds", "t": 0.2,
                                        "sliding_window_t": 0.1})
    idx = np.asarray(ds.event_indices)
    # consecutive windows overlap: window i+1 starts before window i ends
    assert (idx[1:, 0] < idx[:-1, 1]).all(), idx[:4]
    # each window spans ~0.2 s of events
    for i0, i1 in idx[:-1]:
        span = t[min(i1, n - 1)] - t[i0]
        assert 0.15 < span <= 0.21, span


def test_native_fill_inverted_window_is_empty(rng):
    """An idx0 > idx1 window must produce an all-pad batch (the C++ pad
    loop used to start at a negative offset — out-of-bounds writes)."""
    from event_utils_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    n = 100
    t = np.sort(rng.uniform(0, 1, n))
    xy = rng.integers(0, 32, (n, 2)).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    ev, mask, trunc = native.fill_padded_batches(
        t, xy, p, np.array([[50, 30]], np.int64), 64)
    assert mask.sum() == 0
    assert np.isfinite(ev).all()


def test_memmap_single_event_window(tmp_path, rng):
    """A 1-event window must keep 1-D shapes (double-squeeze made ts/ps
    0-d and crashed item assembly)."""
    from event_utils_tpu.data_formats import memmap_packager
    from event_utils_tpu.data_loaders.memmap_dataset import MemMapDataset

    d = str(tmp_path / "mm1")
    mp = memmap_packager(d)
    n = 50
    mp.package_events(rng.integers(0, 16, n), rng.integers(0, 16, n),
                      np.sort(rng.uniform(0, 1, n)),
                      rng.choice([-1.0, 1.0], n))
    mp.add_metadata(n, 0, 0, 1.0, 0.0, 1.0, 0, 0, sensor_size=(16, 16))
    ds = MemMapDataset(d, num_bins=2, return_events=True,
                       return_format="numpy",
                       voxel_method={"method": "k_events", "k": 1,
                                     "sliding_window_w": 0})
    item = ds[3]
    assert item["events"].shape == (1, 4)


def test_frameless_between_frames_raises_cleanly(tmp_path, rng):
    """Frameless datasets under the default between_frames method must
    raise the zero-length ConfigurationError, not construct with len()=-1
    (NpyDataset) or KeyError on the missing images group (H5)."""
    import h5py
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset
    from event_utils_tpu.data_loaders.npy_dataset import NpyDataset
    from event_utils_tpu.errors import ConfigurationError

    n = 200
    arr = np.stack([rng.integers(0, 16, n), rng.integers(0, 16, n),
                    rng.integers(0, 2, n),
                    np.sort(rng.uniform(0, 1e6, n))], axis=1)
    npy = str(tmp_path / "ev.npy")
    np.save(npy, arr)
    with pytest.raises(ConfigurationError):
        NpyDataset(npy, num_bins=2)

    h5p = str(tmp_path / "noimg.h5")
    with h5py.File(h5p, "w") as f:
        g = f.create_group("events")
        g.create_dataset("xs", data=arr[:, 0].astype(np.int16))
        g.create_dataset("ys", data=arr[:, 1].astype(np.int16))
        g.create_dataset("ts", data=np.sort(rng.uniform(0, 1, n)))
        g.create_dataset("ps", data=arr[:, 2].astype(bool))
        f.attrs["sensor_resolution"] = (16, 16)
    with pytest.raises(ConfigurationError):
        DynamicH5Dataset(h5p, num_bins=2)
    # ...but an explicit event-count method works fine without frames
    ds = DynamicH5Dataset(h5p, num_bins=2, return_format="numpy",
                          voxel_method={"method": "k_events", "k": 50,
                                        "sliding_window_w": 0})
    assert len(ds) == 4
