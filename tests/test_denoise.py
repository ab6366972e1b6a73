"""Background-activity filter tests (ops/denoise.py).

The reference has no denoiser beyond hot-pixel removal
(reference event_util.py:166-187); the BAF is new capability. Scored
against the simulator's exact noise labels
(simulation.esim.SimulatedEvents.labels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_utils_tpu.errors import ConfigurationError
from event_utils_tpu.ops.denoise import (background_activity_filter,
                                         filter_background_activity)


def test_baf_exact_semantics():
    # two neighbours close in time + the same pixel much later + a loner
    xs = np.array([10.0, 11.0, 30.0, 10.0])
    ys = np.array([10.0, 10.0, 30.0, 10.0])
    ts = np.array([0.10, 0.11, 0.50, 0.90])
    keep = np.asarray(background_activity_filter(
        xs, ys, ts, 0.05, sensor_size=(48, 48), n_slices=64))
    # 0 validated by 1 (same-slice tolerance), 1 by 0 (true past support),
    # the loner and the stale revisit have no support in their window
    assert keep.tolist() == [True, True, False, False]


@pytest.mark.slow  # BAF kernel variant compile; exact-semantics test keeps fast coverage
def test_baf_center_exclusion_blocks_self_support():
    # a lone pixel bursting rapidly: never valid with the centre excluded
    # (a hot pixel cannot validate itself); with include_center, support
    # comes from STRICTLY EARLIER slices only — an event still cannot
    # validate itself (the no-op-filter regression)
    xs = ys = np.full(10, 5.0)
    ts = np.linspace(0.0, 0.009, 10)  # each event lands in its own slice
    base = dict(sensor_size=(16, 16), n_slices=16)
    keep = np.asarray(background_activity_filter(xs, ys, ts, 0.05, **base))
    assert not keep.any()
    keep_c = np.asarray(background_activity_filter(
        xs, ys, ts, 0.05, include_center=True, **base))
    assert not keep_c[0] and keep_c.sum() == 9
    # include_center must NOT keep a lone single event (self-validation)
    one = np.asarray(background_activity_filter(
        [5.0], [5.0], [0.1], 0.05, include_center=True, **base))
    assert not one.any()


def test_baf_float64_epoch_stamps():
    # epoch-scale float64 stamps must keep millisecond precision (the
    # origin is subtracted in float64 before any float32 cast)
    base_t = 1.7e9
    xs = np.array([10.0, 11.0, 30.0])
    ys = np.array([10.0, 10.0, 30.0])
    ts = base_t + np.array([0.10, 0.11, 0.50])
    keep = np.asarray(background_activity_filter(
        xs, ys, ts, 0.05, sensor_size=(48, 48), n_slices=64))
    # event 1 is validated by event 0 (10 ms past support); event 0's only
    # support lies in a future slice; the loner has none. The float32
    # downcast bug collapsed all stamps (~128 s resolution at 1.7e9) into
    # one slice and returned [True, True, False].
    assert keep.tolist() == [False, True, False]


def test_baf_fractional_border_coords():
    # coords in (W-1, W) rasterize to the last pixel and are filterable,
    # matching the scatter kernels' domain
    # the far-away loner stretches the time span so the border pair shares
    # one slice (mutual same-slice support)
    xs = np.array([46.4, 47.3, 5.0])
    ys = np.array([20.0, 20.0, 5.0])
    ts = np.array([0.100, 0.101, 5.0])
    keep = np.asarray(background_activity_filter(
        xs, ys, ts, 0.05, sensor_size=(48, 48), n_slices=8))
    assert keep.tolist() == [True, True, False]


def test_baf_mask_and_oob():
    # padded events neither survive nor validate others
    xs = np.array([10.0, 11.0, 10.0, -3.0])
    ys = np.array([10.0, 10.0, 10.0, 99.0])
    ts = np.array([0.10, 0.11, 0.12, 0.13])
    mask = np.array([1.0, 0.0, 1.0, 1.0])
    keep = np.asarray(background_activity_filter(
        xs, ys, ts, 0.05, sensor_size=(16, 16), n_slices=8, mask=mask))
    # event 1 is padding -> can't validate 0 or 2; 0/2 are the same pixel
    # (centre excluded); 3 is out of frame
    assert keep.tolist() == [False, False, False, False]
    mask2 = np.array([1.0, 1.0, 1.0, 1.0])
    keep2 = np.asarray(background_activity_filter(
        xs, ys, ts, 0.05, sensor_size=(16, 16), n_slices=8, mask=mask2))
    # event 0's only support (event 1) is two slices in the FUTURE — the
    # same-slice tolerance does not reach it; events 1/2 support each other
    assert keep2.tolist() == [False, True, True, False]


def test_baf_jittable_with_traced_delta_t():
    f = jax.jit(lambda x, y, t, dt, m: background_activity_filter(
        x, y, t, dt, sensor_size=(16, 16), n_slices=8, mask=m))
    xs = jnp.array([3.0, 4.0, 9.0])
    ys = jnp.array([3.0, 3.0, 9.0])
    ts = jnp.array([0.0, 0.001, 0.5])
    keep = np.asarray(f(xs, ys, ts, jnp.float32(0.01), jnp.ones(3)))
    assert keep.tolist() == [True, True, False]


def test_baf_validation():
    with pytest.raises(ConfigurationError):
        background_activity_filter([0.0], [0.0], [0.0], 0.1, n_slices=0)
    with pytest.raises(ConfigurationError):
        background_activity_filter([0.0], [0.0], [0.0], 0.1, support=0)


@pytest.mark.slow
def test_baf_scores_against_simulator_labels():
    """End-to-end denoising loop: simulate a SPARSE scene with labelled
    background activity, filter, and score with the exact labels. Noise in
    empty regions is removed; signal at moving structure survives."""
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_scene,
                                                 translating_scene)

    rng = np.random.default_rng(0)
    tex = np.full((48, 48), 0.3, np.float32)
    for _ in range(6):
        y, x = rng.integers(6, 42, 2)
        tex[y - 2:y + 2, x - 2:x + 2] = 1.0
    sc = translating_scene(tex, (120.0, 50.0))
    cfg = SimulatorConfig(c_pos=0.2, c_neg=0.2,
                          leak_rate_hz=1.0, shot_rate_hz=1.0)
    ev, *_ = simulate_scene(sc, 0.1, 500.0, cfg, key=jax.random.PRNGKey(1))
    assert ev.labels is not None and len(ev.labels) == len(ev)
    assert int((ev.labels == 1).sum()) == ev.stats["num_noise"]
    sig = ev.labels == 0
    keep = np.asarray(background_activity_filter(
        ev.xs, ev.ys, ev.ts, 0.008, sensor_size=(48, 48), n_slices=64))
    assert keep[sig].mean() > 0.95        # signal recall (measured 0.999)
    assert 1 - keep[~sig].mean() > 0.6    # noise removal (measured 0.78)

    # host wrapper returns the filtered stream
    xs, ys, ts, ps = filter_background_activity(
        ev.xs, ev.ys, ev.ts, ev.ps, 0.008, sensor_size=(48, 48),
        n_slices=64)
    assert len(xs) == int(keep.sum()) and len(ps) == len(xs)


def test_labels_absent_without_noise():
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_events)

    frames = np.stack([np.full((8, 8), v, np.float32)
                       for v in (0.2, 0.9, 0.2)])
    ev = simulate_events(frames, [0.0, 0.5, 1.0],
                         SimulatorConfig(c_pos=0.3, c_neg=0.3))
    assert ev.labels is None
