"""Pallas MXU-scatter kernel tests (run in interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_utils_tpu.ops.pallas_scatter import voxel_matmul
from oracles import np_voxel
from conftest import make_events

SENSOR = (24, 32)


def _oracle(xs, ys, ts, ps, B, sensor):
    return np_voxel(xs, ys, ts, ps, B, sensor)


@pytest.mark.parametrize("B", [2, 5, 16])
@pytest.mark.parametrize("precision", ["hilo", "int8"])
def test_voxel_matmul_parity(rng, B, precision):
    xs, ys, ts, ps = make_events(rng, n=3000, sensor=SENSOR)
    got = np.asarray(voxel_matmul(xs, ys, ts.astype(np.float32),
                                  ps.astype(np.float32), B, SENSOR,
                                  chunk=512, precision=precision,
                                  interpret=True))
    np.testing.assert_allclose(got, _oracle(xs, ys, ts, ps, B, SENSOR),
                               atol=5e-4)


def test_voxel_matmul_span_many_bins(rng):
    """Chunks spanning >2 bins must take the dynamic bin-walk path."""
    xs, ys, ts, ps = make_events(rng, n=1500, sensor=SENSOR)
    B = 24  # bin width ~62 events << chunk 512
    got = np.asarray(voxel_matmul(xs, ys, ts.astype(np.float32),
                                  ps.astype(np.float32), B, SENSOR,
                                  chunk=512, interpret=True))
    np.testing.assert_allclose(got, _oracle(xs, ys, ts, ps, B, SENSOR),
                               atol=2e-4)


def test_voxel_matmul_mask_and_oob(rng):
    xs, ys, ts, ps = make_events(rng, n=1024, sensor=SENSOR)
    xs = xs.astype(np.int64)
    xs[::7] = SENSOR[1] + 5      # out of image -> dropped
    mask = (np.arange(1024) % 3 != 0).astype(np.float32)
    got = np.asarray(voxel_matmul(xs, ys, ts.astype(np.float32),
                                  ps.astype(np.float32), 4, SENSOR,
                                  chunk=256, mask=jnp.asarray(mask),
                                  t0=ts[0], t1=ts[-1], interpret=True))
    keep = (mask != 0) & (xs < SENSOR[1])
    # oracle over kept events only, same window
    ref = np.zeros((4,) + SENSOR)
    t_n = (ts - ts[0]) / (ts[-1] - ts[0]) * 3
    b0 = np.floor(t_n).astype(int)
    fb = t_n - b0
    k = keep
    np.add.at(ref, (np.clip(b0[k], 0, 3), ys[k], xs[k]), (ps * (1 - fb))[k])
    k2 = keep & (b0 + 1 < 4)
    np.add.at(ref, (b0[k2] + 1, ys[k2], xs[k2]), (ps * fb)[k2])
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_events_to_voxel_matmul_impl_routing(rng):
    from event_utils_tpu.representations import events_to_voxel
    xs, ys, ts, ps = make_events(rng, n=2000, sensor=SENSOR)
    a = np.asarray(events_to_voxel(xs, ys, ts, ps, 5, sensor_size=SENSOR))
    # The matmul impl compiles for TPU; on CPU tests we call the kernel
    # directly in interpret mode (above); here just check the routing exists.
    import inspect
    src = inspect.getsource(events_to_voxel)
    assert "voxel_matmul" in src
    assert a.shape == (5,) + SENSOR


def test_voxel_matmul_custom_vjp(rng):
    """Pallas voxel gradients (custom VJP gathers) must match the
    differentiable XLA scatter implementation."""
    import jax
    import jax.numpy as jnp
    from event_utils_tpu.representations import events_to_voxel

    xs, ys, ts, ps = make_events(rng, n=1000, sensor=SENSOR)
    B = 4
    tgt = jnp.asarray(rng.normal(size=(B,) + SENSOR), jnp.float32)
    ts32 = jnp.asarray(ts, jnp.float32)

    def loss_pallas(p, t):
        v = voxel_matmul(xs, ys, t, p, B, SENSOR, chunk=256, interpret=True,
                         t0=ts32[0], t1=ts32[-1])
        return jnp.sum(v * tgt)

    def loss_xla(p, t):
        v = events_to_voxel(xs, ys, t, p, B, sensor_size=SENSOR,
                            t0=ts32[0], t1=ts32[-1])
        return jnp.sum(v * tgt)

    p0 = jnp.asarray(ps, jnp.float32)
    gp1, gt1 = jax.grad(loss_pallas, argnums=(0, 1))(p0, ts32)
    gp2, gt2 = jax.grad(loss_xla, argnums=(0, 1))(p0, ts32)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2),
                               rtol=1e-4, atol=1e-3)


def test_bilinear_matmul_parity_multichannel(rng):
    """Pallas bilinear kernel (K channels, shared coords) vs exact scatter."""
    from event_utils_tpu.ops.pallas_scatter import bilinear_matmul
    from event_utils_tpu.ops.scatter import bilinear_scatter

    n = 3000
    x = jnp.asarray(rng.uniform(-3, 243, n), jnp.float32)
    y = jnp.asarray(rng.uniform(-3, 183, n), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (3, n)), jnp.float32)
    exact = jnp.stack([bilinear_scatter(x, y, w[k], (181, 241))
                       for k in range(3)])
    got = bilinear_matmul(x, y, w, (181, 241), chunk=1024, interpret=True)
    rel = float(jnp.max(jnp.abs(got - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 1e-4, rel
    # single-channel shape contract
    one = bilinear_matmul(x, y, w[0], (181, 241), chunk=1024, interpret=True)
    assert one.shape == (181, 241)
    rel1 = float(jnp.max(jnp.abs(one - exact[0])) / jnp.max(jnp.abs(exact[0])))
    assert rel1 < 1e-4, rel1


def test_bilinear_matmul_custom_vjp(rng):
    """Gather-based VJP == autodiff through the exact scatter formulation."""
    from event_utils_tpu.ops.pallas_scatter import bilinear_matmul
    from event_utils_tpu.ops.scatter import bilinear_scatter

    n = 2000
    x = jnp.asarray(rng.uniform(0, 240, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 180, n), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (2, n)), jnp.float32)

    def loss_pallas(p):
        img = bilinear_matmul(x - p[0], y - p[1], w * p[2], (181, 241),
                              chunk=1024, interpret=True)
        return jnp.sum(img * img)

    def loss_exact(p):
        img = jnp.stack([bilinear_scatter(x - p[0], y - p[1], w[k] * p[2],
                                          (181, 241)) for k in range(2)])
        return jnp.sum(img * img)

    p0 = jnp.asarray([0.3, -0.2, 1.1])
    gp = np.asarray(jax.grad(loss_pallas)(p0))
    ge = np.asarray(jax.grad(loss_exact)(p0))
    np.testing.assert_allclose(gp, ge, rtol=2e-3)


def test_bilinear_matmul_mask(rng):
    from event_utils_tpu.ops.pallas_scatter import bilinear_matmul
    from event_utils_tpu.ops.scatter import bilinear_scatter

    n = 1500
    x = jnp.asarray(rng.uniform(0, 239, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 179, n), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, n), jnp.float32)
    exact = bilinear_scatter(x, y, w, (181, 241), mask=mask)
    got = bilinear_matmul(x, y, w, (181, 241), mask=mask, chunk=512,
                          interpret=True)
    rel = float(jnp.max(jnp.abs(got - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 1e-4, rel


@pytest.mark.slow
def test_large_sensor_vmem_fallback(rng):
    """Oversized sensors must never hit a Mosaic compile OOM: concrete
    inputs auto-upgrade to the spatially-tiled MXU builder (silently);
    traced inputs / overrides degrade to the exact scatter with a warning;
    mid-size sensors auto-shrink the chunk."""
    import warnings

    import jax

    from event_utils_tpu.ops.pallas_scatter import voxel_matmul_max_chunk
    from event_utils_tpu.representations.voxel_grid import events_to_voxel

    assert voxel_matmul_max_chunk(5, (180, 240)) == 4096
    assert voxel_matmul_max_chunk(5, (260, 346)) is not None  # DAVIS346
    assert voxel_matmul_max_chunk(5, (480, 640)) is None
    assert voxel_matmul_max_chunk(5, (720, 1280)) is None

    n = 2000
    xs = rng.integers(0, 640, n)
    ys = rng.integers(0, 480, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, 5,
                                       sensor_size=(480, 640)))
    scale = np.abs(exact).max()

    # concrete host inputs: silent auto-upgrade to the tiled MXU builder
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = np.asarray(events_to_voxel(xs, ys, ts, ps, 5,
                                         sensor_size=(480, 640),
                                         impl="matmul"))
        assert not any("VMEM" in str(x.message) for x in w)
    assert np.abs(got - exact).max() / scale < 1e-4

    # impl='tiled' is also accepted explicitly at the standard entry point
    got_t = np.asarray(events_to_voxel(xs, ys, ts, ps, 5,
                                       sensor_size=(480, 640), impl="tiled"))
    assert np.abs(got_t - exact).max() / scale < 1e-4

    # under tracing the host bucketing is impossible: warn + exact scatter
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got_j = np.asarray(jax.jit(
            lambda a, b, c, d: events_to_voxel(
                a, b, c, d, 5, sensor_size=(480, 640), impl="matmul"))(
                    xs, ys, ts, ps))
        assert any("VMEM" in str(x.message) for x in w)
    np.testing.assert_allclose(got_j, exact, rtol=1e-6)

    # tiled with an unsupported override is a typed configuration error
    from event_utils_tpu.errors import ConfigurationError
    try:
        events_to_voxel(xs, ys, ts, ps, 5, sensor_size=(480, 640),
                        impl="tiled", mask=np.ones(n, np.float32))
        raise AssertionError("tiled+mask must raise")
    except ConfigurationError:
        pass

    # huge bin counts where even the default tile overflows VMEM must NOT
    # raise from the auto-route: warn + exact scatter. The threshold
    # depends on the runtime-resolved VMEM budget, so find the first
    # overflowing B instead of hard-coding one.
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul_max_chunk
    from event_utils_tpu.representations.voxel_grid import DEFAULT_TILE
    B_huge = next(b for b in range(8, 4096, 8)
                  if voxel_matmul_max_chunk(b, DEFAULT_TILE) is None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got_b = np.asarray(events_to_voxel(xs, ys, ts, ps, B_huge,
                                           sensor_size=(480, 640),
                                           impl="matmul"))
        assert any("VMEM" in str(x.message) for x in w)
    exact_b = np.asarray(events_to_voxel(xs, ys, ts, ps, B_huge,
                                         sensor_size=(480, 640)))
    np.testing.assert_allclose(got_b, exact_b, rtol=1e-6)


def test_voxel_matmul_below_window_t0_override(rng):
    """Events before an overridden t0 must not leak weight into bin 1: the
    residual trick's partition-of-unity assumption breaks for dropped
    below-window taps (review r2); the kernel must match the exact path."""
    from event_utils_tpu.representations.voxel_grid import events_to_voxel
    n = 512
    xs = rng.integers(0, 64, n)
    ys = rng.integers(0, 48, n)
    ts = np.sort(rng.uniform(0.0, 1.0, n))
    ps = rng.choice([-1.0, 1.0], n)
    t0 = 0.5  # mid-window: ~half the events are below-window
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, 5, sensor_size=(48, 64),
                                       t0=t0, t1=1.0))
    got = np.asarray(events_to_voxel(xs, ys, ts, ps, 5, sensor_size=(48, 64),
                                     t0=t0, t1=1.0, impl="matmul"))
    scale = max(np.abs(exact).max(), 1e-9)
    assert np.abs(got - exact).max() / scale < 1e-4, (
        np.abs(got - exact).max() / scale)


def test_pallas_kernels_zero_events(rng):
    """Zero-length inputs must return zeros, not uninitialized VMEM (the
    program_id(0)-gated zeroing never runs with an empty grid; review r2)."""
    from event_utils_tpu.ops.pallas_scatter import (bilinear_matmul,
                                                    image_matmul,
                                                    voxel_matmul)
    e_i = jnp.zeros(0, jnp.int32)
    e_f = jnp.zeros(0, jnp.float32)
    assert float(jnp.abs(image_matmul(e_i, e_i, e_f, (48, 64))).max()) == 0.0
    assert float(jnp.abs(bilinear_matmul(e_f, e_f, e_f, (48, 64))).max()) == 0.0
    assert float(jnp.abs(voxel_matmul(e_i, e_i, e_f, e_f, 5,
                                      (48, 64))).max()) == 0.0


def test_image_matmul_vmem_guard(rng):
    """Oversized image shapes fall back to the exact scatter with a warning
    instead of a Mosaic compile-time VMEM failure (review r2); covers
    temporal_bilinear=False voxels at VGA via scatter_add_2d."""
    import warnings

    from event_utils_tpu.representations.voxel_grid import events_to_voxel
    n = 1000
    xs = rng.integers(0, 640, n)
    ys = rng.integers(0, 480, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, 5,
                                       sensor_size=(480, 640),
                                       temporal_bilinear=False))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = np.asarray(events_to_voxel(xs, ys, ts, ps, 5,
                                         sensor_size=(480, 640),
                                         temporal_bilinear=False,
                                         impl="matmul"))
        assert any("VMEM" in str(x.message) for x in w)
    np.testing.assert_allclose(got, exact, rtol=1e-6)


def test_voxel_matmul_t1_override_no_bin_leak(rng):
    """Events past an explicit t1 (t_norm > B-1) must contribute NOTHING to
    real bins: the residual trick used to dump their full mass into bin
    B-1 (reproduced: 504 vs 8), and chunk blo/blast classification broke."""
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul
    from event_utils_tpu.representations.voxel_grid import events_to_voxel

    B, H, W = 5, 32, 48
    n = 2048
    xs = rng.integers(0, W, n).astype(np.float32)
    ys = rng.integers(0, H, n).astype(np.float32)
    ts = np.sort(rng.uniform(0.0, 1.0, n)).astype(np.float32)
    ps = rng.choice(np.array([-1.0, 1.0], np.float32), n)
    t1 = 0.6  # ~40% of events beyond the window
    ours = np.asarray(voxel_matmul(xs, ys, ts, ps, B, (H, W),
                                   t0=0.0, t1=t1, chunk=512))
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, B, (H, W),
                                       t0=0.0, t1=t1, impl=None))
    np.testing.assert_allclose(ours, exact, atol=5e-3)
    # per-bin mass agrees (the old bug concentrated in the LAST bin)
    np.testing.assert_allclose(ours.sum((1, 2)), exact.sum((1, 2)),
                               atol=0.1)


def test_voxel_matmul_t0_override_fractional_fold_residual(rng):
    """Below-window fold makes ps fractional; the quantized fold must keep
    the kernel's residual exact (no spurious mass in bin 1)."""
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul
    from event_utils_tpu.representations.voxel_grid import events_to_voxel

    B, H, W = 5, 32, 48
    n = 2048
    xs = rng.integers(0, W, n).astype(np.float32)
    ys = rng.integers(0, H, n).astype(np.float32)
    ts = np.sort(rng.uniform(0.0, 1.0, n)).astype(np.float32)
    ps = rng.choice(np.array([-1.0, 1.0], np.float32), n)
    t0 = 0.35
    ours = np.asarray(voxel_matmul(xs, ys, ts, ps, B, (H, W),
                                   t0=t0, t1=1.0, chunk=512))
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, B, (H, W),
                                       t0=t0, t1=1.0, impl=None))
    np.testing.assert_allclose(ours, exact, atol=5e-3)
