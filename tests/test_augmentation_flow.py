"""Augmentation + dense-flow transform tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_utils_tpu.augmentation import (
    add_correlated_events, add_random_events, crop_events, events_to_block,
    flip_events_x, flip_events_y, jitter_events_jax, merge_events,
    remove_events, remove_events_mask_jax, rotate_events, rotate_events_jax,
    sample,
)
from event_utils_tpu.transforms import warp_events_flow
from conftest import make_events

SENSOR = (32, 48)


def test_events_to_block_roundtrip(rng):
    xs, ys, ts, ps = make_events(rng, n=100, sensor=SENSOR)
    block = events_to_block(xs, ys, ts, ps)
    assert block.shape == (100, 4)
    np.testing.assert_array_equal(block[:, 2], ts)


def test_merge_events_sorted(rng):
    a = make_events(rng, n=50, sensor=SENSOR)
    b = make_events(rng, n=70, sensor=SENSOR)
    merged = merge_events([a, b], sort=True)
    assert merged.shape == (120, 4)
    assert (np.diff(merged[:, 2]) >= 0).all()


def test_add_random_events(rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR)
    nx, ny, nt, np_ = add_random_events(xs, ys, ts, ps, 300, rng=rng)
    assert len(nx) == 800
    assert (np.diff(nt) >= 0).all()
    assert nt.min() >= ts.min() and nt.max() <= ts.max()
    # unmerged
    ox, oy, ot, op = add_random_events(xs, ys, ts, ps, 300, rng=rng,
                                       return_merged=False, sort=False)
    assert len(ox) == 300


def test_remove_events(rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR)
    nx, ny, nt, np_ = remove_events(xs, ys, ts, ps, 200, rng=rng)
    assert len(nx) == 300
    assert (np.diff(nt) >= 0).all()
    # with replacement noise
    nx, ny, nt, np_ = remove_events(xs, ys, ts, ps, 200, add_noise=100,
                                    rng=rng)
    assert len(nx) == 400


def test_add_correlated_events_densify(rng):
    xs, ys, ts, ps = make_events(rng, n=400, sensor=SENSOR)
    nx, ny, nt, np_ = add_correlated_events(xs, ys, ts, ps, 800, rng=rng)
    assert len(nx) == 1200  # 2x densify merged
    assert nx.max() <= xs.max() and nx.min() >= 0
    # new events cluster near originals: mean NN distance should be small
    from scipy.spatial import cKDTree
    tree = cKDTree(np.stack([xs, ys], 1))
    d, _ = tree.query(np.stack([nx, ny], 1))
    assert np.median(d) < 4.0


def test_flips(rng):
    xs, ys, ts, ps = make_events(rng, n=100, sensor=SENSOR)
    fx = flip_events_x(xs, ys, ts, ps, SENSOR)[0]
    assert fx.max() <= SENSOR[1] - 1 and fx.min() >= 0
    np.testing.assert_array_equal(
        flip_events_x(fx, ys, ts, ps, SENSOR)[0], xs)  # involution
    fy = flip_events_y(xs, ys, ts, ps, SENSOR)[1]
    assert fy.max() <= SENSOR[0] - 1


def test_rotate_events_exact(rng):
    xs = np.array([10.0])
    ys = np.array([5.0])
    nx, ny, th, cor = rotate_events(xs, ys, SENSOR, theta_radians=np.pi / 2,
                                    center_of_rotation=(10, 10))
    # 90 deg about (10,10): (10,5) -> (15,10)
    np.testing.assert_allclose([nx[0], ny[0]], [15.0, 10.0], atol=1e-6)
    # clip_to_range drops out-of-bounds
    nx2, ny2, _, _ = rotate_events(np.array([0.0]), np.array([0.0]), SENSOR,
                                   theta_radians=np.pi,
                                   center_of_rotation=(-10, -10),
                                   clip_to_range=True)
    assert len(nx2) == 0


def test_sample_cdf(rng):
    ts = np.linspace(0, 1, 100)
    cdf = np.linspace(0, 1, 100)
    idx = sample(cdf, ts, rng=rng)
    assert 0 <= idx <= 100


def test_device_augmentation_ops(rng):
    xs, ys, ts, ps = make_events(rng, n=256, sensor=SENSOR)
    key = jax.random.PRNGKey(0)
    nx, ny, nt = jitter_events_jax(key, xs, ys, ts)
    assert nx.shape == (256,)
    rx, ry, th, cor = rotate_events_jax(key, xs, ys, SENSOR)
    assert rx.shape == (256,)
    keep = remove_events_mask_jax(key, 256, 100)
    assert int(keep.sum()) == 156


def test_crop_events(rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR)
    cx, cy = crop_events(xs, ys, SENSOR, (16, 24))
    assert cx.max() < 24 and cy.max() < 16


# ---------------------------------------------------------------------------
# Dense-flow warp
# ---------------------------------------------------------------------------

def test_flow_warp_uniform_field(rng):
    xs, ys, ts, ps = make_events(rng, n=200, sensor=SENSOR, int_coords=False)
    flow = np.zeros((2,) + SENSOR, np.float32)
    flow[0] = 3.0  # u
    flow[1] = -2.0
    t0 = ts[-1]
    xw, yw = warp_events_flow(xs, ys, ts, ps, flow, t0=t0)
    np.testing.assert_allclose(np.asarray(xw), xs + 3.0 * (ts - t0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yw), ys - 2.0 * (ts - t0),
                               rtol=1e-4, atol=1e-4)


def test_flow_warp_spatially_varying(rng):
    """Warp must sample the flow bilinearly at each event's location."""
    H, W = SENSOR
    gy, gx = np.mgrid[0:H, 0:W]
    flow = np.stack([gx.astype(np.float32) * 0.1,
                     np.zeros((H, W), np.float32)])
    xs = np.array([10.0, 20.5])
    ys = np.array([5.0, 7.0])
    ts = np.array([0.0, 0.0])
    xw, yw = warp_events_flow(xs, ys, ts, None, flow, t0=1.0)
    # u(x) = 0.1 x; dt = -1 -> x' = x - 0.1 x
    np.testing.assert_allclose(np.asarray(xw), xs - 0.1 * xs, atol=1e-4)


def test_flow_warp_default_t0_and_grads(rng):
    xs, ys, ts, ps = make_events(rng, n=64, sensor=SENSOR, int_coords=False)
    flow = jnp.ones((2,) + SENSOR) * 2.0

    def loss(f):
        xw, yw = warp_events_flow(xs, ys, ts, ps, f)
        return jnp.sum(xw ** 2 + yw ** 2)

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()


def test_add_correlated_events_jax_device_densify(rng):
    """Full on-device 2x densify: sorted, mask-preserving, jittered within
    bounds, jit-compatible."""
    import jax
    import jax.numpy as jnp
    from event_utils_tpu.augmentation.event_augmentation import (
        add_correlated_events_jax)

    n = 2000
    xs = rng.uniform(0, 239, n)
    ys = rng.uniform(0, 179, n)
    ts = np.sort(rng.uniform(0, 0.5, n))
    ps = rng.choice([-1.0, 1.0], n)
    mask = np.concatenate([np.ones(n - 100), np.zeros(100)])

    fn = jax.jit(lambda k: add_correlated_events_jax(
        k, xs, ys, ts, ps, mask=mask))
    ox, oy, ot, op, om = fn(jax.random.PRNGKey(0))
    assert ox.shape == (2 * n,)
    assert float(jnp.sum(om)) == 2 * (n - 100)
    valid_t = np.asarray(ot)[np.asarray(om) != 0]
    assert np.all(np.diff(valid_t) >= 0)          # time-sorted valid prefix
    assert not np.any(np.asarray(om)[len(valid_t):])  # pads at the tail
    assert np.asarray(ox).min() >= 0 and np.asarray(ox).max() <= 239
    assert set(np.unique(np.asarray(op)[np.asarray(om) != 0])) <= {-1.0, 1.0}


def test_jitter_epoch_timestamps_keep_resolution(rng):
    """Device jitter on absolute epoch-style float64 stamps: the ms-scale
    jitter must survive (f32 ulp at 1.6e9 s is ~128 s — a naive cast
    collapses every stamp)."""
    import jax
    from event_utils_tpu.augmentation.event_augmentation import (
        jitter_events_jax)

    n = 500
    t0 = 1.6e9
    ts = t0 + np.sort(rng.uniform(0, 0.5, n))
    _, _, nt = jitter_events_jax(jax.random.PRNGKey(0),
                                 rng.uniform(0, 100, n),
                                 rng.uniform(0, 100, n), ts, ts_std=0.001)
    nt = np.asarray(nt)
    assert nt.dtype == np.float64
    d = nt - ts
    assert 1e-4 < np.std(d) < 1e-2, np.std(d)  # jitter present, ms scale


def test_remove_events_mask_jax_remove_all(rng):
    import jax
    from event_utils_tpu.augmentation.event_augmentation import (
        remove_events_mask_jax)
    m = remove_events_mask_jax(jax.random.PRNGKey(1), 64, 64)
    assert not bool(np.asarray(m).any())
    m2 = remove_events_mask_jax(jax.random.PRNGKey(1), 64, 10)
    assert int(np.asarray(m2).sum()) == 54


def test_warp_events_flow_single_event_and_oob():
    """Regression: single-event (1,) inputs must keep their shape (an
    unconditional squeeze made them 0-d and crashed the default-t0 path),
    and out-of-field events sample ZERO flow (grid_sample
    padding_mode='zeros' parity) instead of the border pixel's flow."""
    from event_utils_tpu.transforms.optic_flow import (warp_events_flow,
                                                       warp_events_flow_torch)

    flow = np.zeros((2, 16, 16), np.float32)
    flow[0] = 5.0  # uniform u
    xw, yw = warp_events_flow(np.array([3.0]), np.array([4.0]),
                              np.array([0.5]), np.array([1.0]), flow)
    assert np.shape(xw) == (1,) and np.shape(yw) == (1,)

    # far-out-of-bounds event: zero flow -> stays put
    xw2, _ = warp_events_flow(np.array([-10.0, 3.0]), np.array([4.0, 4.0]),
                              np.array([0.0, 1.0]), np.array([1.0, 1.0]),
                              flow, t0=1.0)
    assert float(xw2[0]) == -10.0            # untouched (zero padding)
    assert abs(float(xw2[1] - 3.0)) < 1e-5   # dt=0 at t0

    # batched reference signature is explicitly unsupported
    with pytest.raises(NotImplementedError):
        warp_events_flow_torch(np.zeros(3), np.zeros(3), np.zeros(3),
                               np.zeros(3), flow, batched=True)
