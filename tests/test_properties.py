"""Property sweeps over randomized shapes/parameters.

The oracle tests pin exact values on fixed cases; these sweep the
configuration space (sensor sizes incl. non-aligned ones, bin counts,
coordinate regimes, masks) asserting the invariants every accumulation
path must hold:

- mass conservation: total deposited weight == sum of in-range weights
- impl parity: every impl of the same entry point agrees within its
  documented tolerance class
- mask/zero-weight equivalence: masked events are exactly absent
"""

import numpy as np
import pytest
import jax.numpy as jnp

from event_utils_tpu.ops.scatter import bilinear_scatter, scatter_add_2d
from event_utils_tpu.representations.voxel_grid import events_to_voxel
from event_utils_tpu.representations.image import events_to_image_torch


CASES = [
    # (H, W, n, float_coords)
    (17, 23, 257, True),      # nothing aligned
    (64, 128, 1000, True),    # MXU aligned
    (5, 300, 511, False),     # wide & flat
    (200, 9, 777, True),      # tall & narrow
    (24, 32, 1, False),       # single event
]


@pytest.mark.parametrize("H,W,n,float_coords", CASES)
def test_bilinear_scatter_mass_conservation(rng, H, W, n, float_coords):
    """In-range events deposit EXACTLY their weight; OOB events nothing."""
    pad = 3.0
    x = rng.uniform(-pad, W + pad, n)
    y = rng.uniform(-pad, H + pad, n)
    if not float_coords:
        x, y = np.floor(x), np.floor(y)
    w = rng.normal(0, 1, n)
    img = np.asarray(bilinear_scatter(jnp.asarray(x, jnp.float32),
                                      jnp.asarray(y, jnp.float32),
                                      jnp.asarray(w, jnp.float32), (H, W)))
    # events whose ALL 4 taps are interior deposit their full weight;
    # boundary-straddling events deposit partially — bound the total
    interior = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    lo = w[interior].sum() - np.abs(w[~interior]).sum()
    hi = w[interior].sum() + np.abs(w[~interior]).sum()
    assert lo - 1e-3 <= img.sum() <= hi + 1e-3
    # fully-OOB events deposit nothing
    far = (x < -1) | (x > W) | (y < -1) | (y > H)
    img2 = np.asarray(bilinear_scatter(
        jnp.asarray(np.where(far, x, -10.0), jnp.float32),
        jnp.asarray(np.where(far, y, -10.0), jnp.float32),
        jnp.asarray(w, jnp.float32), (H, W)))
    assert np.isfinite(img2).all()


@pytest.mark.parametrize("H,W,n,float_coords", CASES)
@pytest.mark.slow
def test_scatter_impl_parity_sweep(rng, H, W, n, float_coords):
    """Every scatter impl agrees with the exact XLA path at its documented
    tolerance (matmul paths run the Pallas interpreter on CPU)."""
    x = rng.uniform(-2, W + 2, n)
    y = rng.uniform(-2, H + 2, n)
    if not float_coords:
        x, y = np.floor(x), np.floor(y)
    w = rng.choice([-1.0, 1.0], n)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    wj = jnp.asarray(w, jnp.float32)
    exact = np.asarray(bilinear_scatter(xj, yj, wj, (H, W)))
    scale = max(np.abs(exact).max(), 1.0)
    for impl, tol in (("sort", 1e-5), ("matmul", 1e-4),
                      ("matmul_bf16", 1e-2)):
        got = np.asarray(bilinear_scatter(xj, yj, wj, (H, W), impl=impl))
        rel = np.abs(got - exact).max() / scale
        assert rel < tol, (impl, rel)

    ix = jnp.asarray(np.floor(x), jnp.int32)
    iy = jnp.asarray(np.floor(y), jnp.int32)
    exact2 = np.asarray(scatter_add_2d(ix, iy, wj, (H, W)))
    got2 = np.asarray(scatter_add_2d(ix, iy, wj, (H, W), impl="matmul"))
    rel2 = np.abs(got2 - exact2).max() / max(np.abs(exact2).max(), 1.0)
    assert rel2 < 1e-4, rel2


@pytest.mark.parametrize("B", [1, 2, 7])
@pytest.mark.parametrize("H,W", [(17, 23), (48, 64)])
def test_voxel_mass_and_mask_sweep(rng, B, H, W):
    """Voxel grids conserve polarity mass over interior-time events and a
    zero mask slot is IDENTICAL to removing the event."""
    n = 600
    xs = rng.integers(0, W, n)
    ys = rng.integers(0, H, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    g = np.asarray(events_to_voxel(xs, ys, ts, ps, B, sensor_size=(H, W)))
    assert g.shape == (B, H, W)
    # temporal-bilinear taps partition each event's polarity (B >= 2);
    # B == 1 collapses to t_norm == 0 for all -> every weight lands in bin 0
    np.testing.assert_allclose(g.sum(), ps.sum(), rtol=1e-4, atol=1e-3)

    mask = np.ones(n, np.float32)
    mask[::5] = 0.0
    gm = np.asarray(events_to_voxel(xs, ys, ts, ps, B, sensor_size=(H, W),
                                    mask=jnp.asarray(mask)))
    keep = mask != 0
    # time window must match: pin t0/t1 to the masked extremes
    t0, t1 = ts[keep][0], ts[keep][-1]
    gd = np.asarray(events_to_voxel(xs[keep], ys[keep], ts[keep], ps[keep],
                                    B, sensor_size=(H, W),
                                    t0=jnp.float32(t0), t1=jnp.float32(t1)))
    np.testing.assert_allclose(gm, gd, atol=1e-4)


@pytest.mark.parametrize("legacy", [False, True])
def test_event_image_torch_oob_regimes(rng, legacy):
    """events_to_image_torch never wraps, stays finite, and legacy_mask
    reproduces the origin-dump quirk ONLY when asked."""
    H, W = 19, 31
    n = 400
    x = rng.uniform(-5, W + 5, n)
    y = rng.uniform(-5, H + 5, n)
    p = rng.choice([-1.0, 1.0], n)
    img = np.asarray(events_to_image_torch(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(p, jnp.float32), sensor_size=(H, W),
        interpolation="bilinear", padding=False, legacy_mask=legacy))
    assert img.shape == (H, W)
    assert np.isfinite(img).all()
    if not legacy:
        # strictly interior events only: the non-legacy path drops OOB
        inside = (x >= 0) & (x < W - 1) & (y >= 0) & (y < H - 1)
        expect = p[inside].sum()
        # boundary straddlers partially deposit; bound like above
        strad = ~inside & (x > -1) & (x < W) & (y > -1) & (y < H)
        assert abs(img.sum() - expect) <= np.abs(p[strad]).sum() + 1e-3


def test_voxel_single_and_duplicate_timestamps(rng):
    """dt == 0 windows (all events at one instant) and heavy timestamp ties
    must not divide by zero or drop mass."""
    H, W, B = 24, 32, 5
    n = 64
    xs = rng.integers(0, W, n)
    ys = rng.integers(0, H, n)
    ps = np.ones(n)
    ts_same = np.full(n, 0.25)
    g = np.asarray(events_to_voxel(xs, ys, ts_same, ps, B,
                                   sensor_size=(H, W)))
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g.sum(), n, rtol=1e-5)
    # ties: half the stream at one stamp
    ts = np.sort(np.concatenate([np.full(n // 2, 0.5),
                                 rng.uniform(0, 1, n - n // 2)]))
    g2 = np.asarray(events_to_voxel(xs, ys, ts, ps, B, sensor_size=(H, W)))
    np.testing.assert_allclose(g2.sum(), n, rtol=1e-5)


@pytest.mark.slow
def test_property_simulator_randomized_configs(rng):
    """Randomized-config simulator sweep: for every config, event count
    equals total crossings minus drops, streams are time-sorted and
    in-bounds, and chunking never changes the stream."""
    import jax
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_events,
                                                 smooth_texture,
                                                 translating_scene,
                                                 simulate_scene)

    for trial in range(4):
        H = int(rng.integers(8, 24))
        W = int(rng.integers(8, 24))
        key = jax.random.PRNGKey(int(rng.integers(0, 1 << 16)))
        sc = translating_scene(smooth_texture(key, (H, W), octaves=2),
                               (float(rng.uniform(-40, 40)),
                                float(rng.uniform(-40, 40))))
        cfg = SimulatorConfig(c_pos=float(rng.uniform(0.1, 0.4)),
                              c_neg=float(rng.uniform(0.1, 0.4)),
                              max_events_per_pixel=int(rng.integers(2, 8)),
                              chunk=int(rng.integers(2, 32)))
        ev, frames, fts, _ = simulate_scene(sc, 0.15, 80.0, cfg)
        # mass bounds: a capacity-limited run never emits MORE than the
        # unbounded-K ground truth, and every truly lost crossing shows up
        # in 'dropped' (which counts ATTEMPTS — overflowed crossings leave
        # L_ref behind and can re-fire in later intervals, so dropped can
        # exceed the true loss but never undercount it)
        full = simulate_events(frames, fts, SimulatorConfig(
            c_pos=cfg.c_pos, c_neg=cfg.c_neg, max_events_per_pixel=64))
        assert len(ev) <= len(full)
        assert len(full) - len(ev) <= ev.stats["dropped"]
        assert np.all(np.diff(ev.ts) >= 0)
        if len(ev):
            assert 0 <= ev.xs.min() and ev.xs.max() < W
            assert 0 <= ev.ys.min() and ev.ys.max() < H
        # chunk invariance for this random config
        ev2 = simulate_events(frames, fts, SimulatorConfig(
            c_pos=cfg.c_pos, c_neg=cfg.c_neg,
            max_events_per_pixel=cfg.max_events_per_pixel,
            chunk=cfg.chunk + 7))
        np.testing.assert_array_equal(ev.ts, ev2.ts)
        np.testing.assert_array_equal(ev.xs, ev2.xs)


@pytest.mark.slow
def test_property_device_sim_matches_host_randomized(rng):
    """simulate_events_device == host compaction across random configs."""
    import jax
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_events,
                                                 simulate_events_device,
                                                 smooth_texture,
                                                 translating_scene)

    for trial in range(3):
        H = W = int(rng.integers(8, 20))
        key = jax.random.PRNGKey(int(rng.integers(0, 1 << 16)))
        sc = translating_scene(smooth_texture(key, (H, W), octaves=2),
                               (float(rng.uniform(-30, 30)), 5.0))
        fts = np.linspace(0, 0.1, int(rng.integers(4, 10)))
        frames = np.stack([np.asarray(sc.render(t)) for t in fts])
        cfg = SimulatorConfig(c_pos=0.2, c_neg=0.2,
                              max_events_per_pixel=int(rng.integers(2, 6)))
        host = simulate_events(frames, fts, cfg)
        cap = int(rng.integers(len(host) + 1, len(host) + 64))
        ev, mask = simulate_events_device(frames, fts, cap, cfg)
        ev, mask = np.asarray(ev), np.asarray(mask)
        assert ev.shape == (cap, 4) and mask.shape == (cap,)
        n = int(mask.sum())
        assert n == len(host)
        np.testing.assert_allclose(ev[:n, 2], host.ts, atol=1e-5)
