"""Structured error taxonomy (SURVEY.md §5.3): every failure class is typed,
catchable as ``EventUtilsError``, and still catchable as the builtin the
site historically raised (backward compatibility)."""

import numpy as np
import pytest

from event_utils_tpu import errors


def test_hierarchy_subclasses_builtins():
    assert issubclass(errors.ConfigurationError, ValueError)
    assert issubclass(errors.SensorLimitError, errors.ConfigurationError)
    assert issubclass(errors.RegistryError, KeyError)
    assert issubclass(errors.RegistryError, errors.ConfigurationError)
    assert issubclass(errors.DataNotFoundError, FileNotFoundError)
    assert issubclass(errors.DataFormatError, ValueError)
    assert issubclass(errors.DatasetInitError, RuntimeError)
    assert issubclass(errors.NativeBuildError, RuntimeError)
    for cls in (errors.ConfigurationError, errors.RegistryError,
                errors.DataNotFoundError, errors.DataFormatError,
                errors.DatasetInitError, errors.NativeBuildError,
                errors.SensorLimitError):
        assert issubclass(cls, errors.EventUtilsError)


def test_registry_error_str_unquoted():
    err = errors.RegistryError("Unknown objective 'nope'")
    assert str(err) == "Unknown objective 'nope'"  # KeyError would repr()


def test_unknown_scatter_impl_is_configuration_error():
    from event_utils_tpu.ops.scatter import scatter_add_flat

    with pytest.raises(errors.ConfigurationError):
        scatter_add_flat(np.zeros(4, np.int32), np.ones(4, np.float32), 8,
                         impl="nonsense")
    with pytest.raises(ValueError):  # backward compatible
        scatter_add_flat(np.zeros(4, np.int32), np.ones(4, np.float32), 8,
                         impl="nonsense")


@pytest.mark.parametrize("lookup,bad", [
    ("objective", "nope"), ("warp", "nope"),
    ("transform", "nope"), ("visualizer", "nope")])
def test_registry_lookups_raise_registry_error(lookup, bad):
    if lookup == "objective":
        from event_utils_tpu.models.objectives import get_objective as fn
        call = lambda: fn(bad)
    elif lookup == "warp":
        from event_utils_tpu.models.warps import get_warp as fn
        call = lambda: fn(bad)
    elif lookup == "transform":
        from event_utils_tpu.data_loaders.data_augmentation import (
            build_transform as fn)
        call = lambda: fn(bad)
    else:
        from event_utils_tpu.visualization.visualizers import (
            get_visualizer as fn)
        call = lambda: fn(bad, (8, 8))
    with pytest.raises(errors.RegistryError) as ei:
        call()
    assert "nope" in str(ei.value) and "have" in str(ei.value)
    with pytest.raises(KeyError):  # backward compatible
        call()


def test_voxel_sensor_limit_error():
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul

    with pytest.raises(errors.SensorLimitError):
        voxel_matmul(np.zeros(8, np.int32), np.zeros(8, np.int32),
                     np.linspace(0, 1, 8, dtype=np.float32),
                     np.ones(8, np.float32), 5, (4000, 6000))


def test_missing_memmap_raises_data_not_found(tmp_path):
    from event_utils_tpu.data_formats.read_events import read_memmap_events

    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(errors.DataNotFoundError):
        read_memmap_events(str(d))
    with pytest.raises(FileNotFoundError):  # backward compatible
        read_memmap_events(str(d))


def test_invalid_bounds_and_side_are_configuration_errors():
    from event_utils_tpu.utils.event_util import clip_events_to_bounds
    from event_utils_tpu.utils.event_util import cut_events_to_lifespan

    ev = (np.zeros(4), np.zeros(4), np.linspace(0, 1, 4), np.ones(4))
    with pytest.raises(errors.ConfigurationError):
        clip_events_to_bounds(*ev, bounds=[1, 2, 3])
    with pytest.raises(errors.ConfigurationError):
        cut_events_to_lifespan(*ev, np.ones(2), 1.0, side="middle")


def test_native_fill_shape_guard_is_data_format_error():
    from event_utils_tpu import native

    t = np.linspace(0, 1, 16)
    xy = np.zeros((16, 2), np.uint16)
    p = np.ones(16, np.uint8)
    windows = np.array([[0, 8]], np.int64)
    bad_events = np.zeros((1, 4, 4), np.float32)  # wrong capacity dim
    bad_mask = np.zeros((1, 4), np.float32)
    with pytest.raises(errors.DataFormatError):
        native.fill_padded_batches(t, xy, p, windows, capacity=8,
                                   out=(bad_events, bad_mask))


def test_invalid_voxel_method_is_configuration_error(synth_h5):
    from event_utils_tpu.data_loaders.hdf5_dataset import DynamicH5Dataset

    with pytest.raises(errors.ConfigurationError):
        DynamicH5Dataset(synth_h5,
                         voxel_method={"method": "bogus_windowing"})


@pytest.fixture
def synth_h5(tmp_path):
    from event_utils_tpu.data_formats.event_packagers import hdf5_packager

    path = str(tmp_path / "synth.h5")
    pkg = hdf5_packager(path)
    rng = np.random.default_rng(0)
    n = 512
    xs = rng.integers(0, 32, n).astype(np.int16)
    ys = rng.integers(0, 24, n).astype(np.int16)
    ts = np.sort(rng.uniform(0, 0.5, n))
    ps = rng.integers(0, 2, n).astype(np.int8)
    pkg.set_data_available(0, 0)
    pkg.package_events(xs, ys, ts, ps)
    pkg.add_metadata(n, int((ps == 1).sum()), int((ps == 0).sum()),
                     float(ts[-1] - ts[0]), float(ts[0]), float(ts[-1]),
                     0, 0, sensor_size=(24, 32))
    pkg.close()
    return path
