"""Representation-layer tests: event image, timestamp image, voxel grids."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_utils_tpu.representations import (
    events_to_image, events_to_image_drv, events_to_image_torch,
    events_to_neg_pos_voxel, events_to_timestamp_image, events_to_voxel,
    events_to_voxel_timesync, image_to_event_weights, voxel_grids_fixed_n,
)
from oracles import (np_bilinear_scatter, np_integer_scatter,
                     np_timestamp_image, np_voxel)
from conftest import make_events


SENSOR = (24, 32)


def test_event_image_integer_oracle(rng):
    xs, ys, ts, ps = make_events(rng, n=3000, sensor=SENSOR)
    got = np.asarray(events_to_image(xs, ys, ps, sensor_size=SENSOR))
    # numpy reference: bincount into (H+1, W+1), cropped.
    want = np_integer_scatter(xs, ys, ps, (SENSOR[0] + 1, SENSOR[1] + 1))[:SENSOR[0], :SENSOR[1]]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_event_image_meanval(rng):
    xs, ys, ts, ps = make_events(rng, n=3000, sensor=SENSOR)
    got = np.asarray(events_to_image(xs, ys, ps, sensor_size=SENSOR,
                                     meanval=True, default=0))
    acc = np_integer_scatter(xs, ys, ps, (SENSOR[0] + 1, SENSOR[1] + 1))
    cnt = np_integer_scatter(xs, ys, np.ones_like(ps), (SENSOR[0] + 1, SENSOR[1] + 1))
    want = np.divide(acc, cnt, out=np.zeros_like(acc), where=cnt != 0)
    np.testing.assert_allclose(got, want[:SENSOR[0], :SENSOR[1]], atol=1e-4)


def test_event_image_bilinear_padded_shape(rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR, int_coords=False)
    img = events_to_image_torch(xs, ys, ps, sensor_size=SENSOR,
                                interpolation="bilinear", padding=True)
    assert img.shape == (SENSOR[0] + 1, SENSOR[1] + 1)
    want = np_bilinear_scatter(xs.astype(np.float32), ys.astype(np.float32),
                               ps.astype(np.float32),
                               (SENSOR[0] + 1, SENSOR[1] + 1))
    np.testing.assert_allclose(np.asarray(img), want, atol=1e-3)


def test_event_image_torch_legacy_origin_dump(rng):
    """Legacy integer route dumps unmasked weights of clipped events on (0,0)
    (reference image.py:94-95 with padding=True: clipx = W-1)."""
    xs = np.array([5.0, SENSOR[1] - 1.0])  # second event hits clipx
    ys = np.array([3.0, 2.0])
    ps = np.array([1.0, 1.0])
    img = np.asarray(events_to_image_torch(xs, ys, ps, sensor_size=SENSOR,
                                           interpolation=None, padding=True,
                                           legacy_mask=True))
    assert img[3, 5] == 1.0
    assert img[0, 0] == 1.0  # clipped event's weight landed at the origin
    # default mode keeps it where it belongs
    img2 = np.asarray(events_to_image_torch(xs, ys, ps, sensor_size=SENSOR,
                                            interpolation=None, padding=True))
    assert img2[2, SENSOR[1] - 1] == 1.0 and img2[0, 0] == 0.0


def test_voxel_matches_reference_formula(rng):
    xs, ys, ts, ps = make_events(rng, n=4000, sensor=SENSOR)
    B = 5
    got = np.asarray(events_to_voxel(xs, ys, ts, ps, B, sensor_size=SENSOR))
    want = np_voxel(xs, ys, ts, ps, B, SENSOR)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_voxel_polarity_sum_conservation(rng):
    """Temporal bilinear weights sum to 1 per event -> total mass equals sum of
    polarities (all coords in range)."""
    xs, ys, ts, ps = make_events(rng, n=2500, sensor=SENSOR)
    vox = events_to_voxel(xs, ys, ts, ps, 7, sensor_size=SENSOR)
    np.testing.assert_allclose(float(jnp.sum(vox)), float(np.sum(ps)), rtol=1e-4)


def test_voxel_masked_padding_equivalence(rng):
    """A padded, masked stream must produce the identical voxel grid."""
    xs, ys, ts, ps = make_events(rng, n=1000, sensor=SENSOR)
    B = 5
    base = np.asarray(events_to_voxel(xs, ys, ts, ps, B, sensor_size=SENSOR))
    pad = 400
    xs_p = np.concatenate([xs, np.zeros(pad, xs.dtype)])
    ys_p = np.concatenate([ys, np.zeros(pad, ys.dtype)])
    ts_p = np.concatenate([ts, np.full(pad, ts[-1])])
    ps_p = np.concatenate([ps, np.ones(pad)])
    mask = np.concatenate([np.ones(len(xs)), np.zeros(pad)])
    got = np.asarray(events_to_voxel(xs_p, ys_p, ts_p, ps_p, B,
                                     sensor_size=SENSOR, mask=jnp.array(mask)))
    np.testing.assert_allclose(got, base, atol=1e-4)


def test_neg_pos_voxel(rng):
    xs, ys, ts, ps = make_events(rng, n=2000, sensor=SENSOR)
    vp, vn = events_to_neg_pos_voxel(xs, ys, ts, ps, 4, sensor_size=SENSOR)
    want_p = np_voxel(xs, ys, ts, (ps > 0).astype(float), 4, SENSOR)
    want_n = np_voxel(xs, ys, ts, (ps <= 0).astype(float), 4, SENSOR)
    np.testing.assert_allclose(np.asarray(vp), want_p, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vn), want_n, atol=2e-3)


def test_voxel_timesync(rng):
    xs, ys, ts, ps = make_events(rng, n=3000, sensor=SENSOR, t_max=1.0)
    t0, t1 = 0.25, 0.75
    got = np.asarray(events_to_voxel_timesync(xs, ys, ts, ps, 3, t0, t1,
                                              sensor_size=SENSOR))
    s, e = np.searchsorted(ts, t0), np.searchsorted(ts, t1)
    want = np_voxel(xs[s:e], ys[s:e], ts[s:e], ps[s:e], 3, SENSOR)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_voxel_grids_fixed_n(rng):
    xs, ys, ts, ps = make_events(rng, n=1000, sensor=SENSOR)
    grids = voxel_grids_fixed_n(xs, ys, ts, ps, B=3, n=300, sensor_size=SENSOR)
    assert grids.shape[0] == 3  # (1000-300)//300+1
    want0 = np_voxel(xs[:300], ys[:300], ts[:300], ps[:300], 3, SENSOR)
    np.testing.assert_allclose(np.asarray(grids[0]), want0, atol=2e-3)


def test_timestamp_image_oracle(rng):
    xs, ys, ts, ps = make_events(rng, n=3000, sensor=SENSOR, int_coords=False)
    ip, im = events_to_timestamp_image(xs, ys, ts, ps, sensor_size=SENSOR)
    want_p, want_n = np_timestamp_image(
        xs.astype(np.float32), ys.astype(np.float32), ts, ps,
        (SENSOR[0] + 1, SENSOR[1] + 1))
    np.testing.assert_allclose(np.asarray(ip), want_p, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im), want_n, atol=1e-3)


def test_timestamp_image_reverse(rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor=SENSOR, int_coords=False)
    ip_f, _ = events_to_timestamp_image(xs, ys, ts, ps, sensor_size=SENSOR)
    ip_r, _ = events_to_timestamp_image(xs, ys, ts, ps, sensor_size=SENSOR,
                                        timestamp_reverse=True)
    assert not np.allclose(np.asarray(ip_f), np.asarray(ip_r))


def test_image_to_event_weights_roundtrip(rng):
    img = jnp.array(rng.normal(size=(10, 12)), jnp.float32)
    xs = np.array([2.0, 5.5, 11.5])  # last is beyond W-1 -> weight 0
    ys = np.array([3.0, 4.25, 2.0])
    w = np.asarray(image_to_event_weights(xs, ys, img))
    assert w[0] == pytest.approx(float(img[3, 2]), abs=1e-5)
    assert w[2] == 0.0


def test_events_to_image_drv_shapes(rng):
    xs, ys, ts, ps = make_events(rng, n=800, sensor=SENSOR, int_coords=False)
    jx = np.zeros((2, len(xs)), np.float32)
    jy = np.zeros((2, len(xs)), np.float32)
    jx[0] = -ts
    jy[1] = -ts
    iwe, d_iwe = events_to_image_drv(xs, ys, ps, jx, jy, sensor_size=SENSOR,
                                     compute_gradient=True)
    assert iwe.shape == (SENSOR[0] + 1, SENSOR[1] + 1)
    assert d_iwe.shape == (2, SENSOR[0] + 1, SENSOR[1] + 1)


def test_jit_and_vmap_compatibility(rng):
    """Representations must trace cleanly under jit and vmap."""
    xs, ys, ts, ps = make_events(rng, n=512, sensor=SENSOR)
    f = jax.jit(lambda a, b, c, d: events_to_voxel(a, b, c, d, 5,
                                                   sensor_size=SENSOR))
    v1 = f(jnp.array(xs), jnp.array(ys), jnp.array(ts), jnp.array(ps))
    v2 = events_to_voxel(xs, ys, ts, ps, 5, sensor_size=SENSOR)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    batch = jax.vmap(lambda a, b, c, d: events_to_voxel(
        a, b, c, d, 3, sensor_size=SENSOR))
    xb = jnp.stack([jnp.array(xs)] * 4)
    yb = jnp.stack([jnp.array(ys)] * 4)
    tb = jnp.stack([jnp.array(ts)] * 4)
    pb = jnp.stack([jnp.array(ps)] * 4)
    out = batch(xb, yb, tb, pb)
    assert out.shape == (4, 3) + SENSOR


def test_timestamp_image_matmul_impl(rng):
    """MXU fast path for timestamp images (impl threads through to the
    factorized matmul scatter)."""
    xs, ys, ts, ps = make_events(rng, n=3000, sensor=SENSOR, int_coords=False)
    ref_p, ref_n = events_to_timestamp_image(xs, ys, ts, ps,
                                             sensor_size=SENSOR)
    got_p, got_n = events_to_timestamp_image(xs, ys, ts, ps,
                                             sensor_size=SENSOR,
                                             impl="matmul_hilo")
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(ref_n),
                               atol=2e-4)


def test_events_to_voxel_tiled_matches_exact(rng):
    """Spatial-tiling builder for large sensors == full-frame voxel."""
    from event_utils_tpu.representations.voxel_grid import (
        events_to_voxel, events_to_voxel_tiled)

    n = 20000
    H, W = 480, 640
    xs = rng.uniform(0, W - 1, n)
    ys = rng.uniform(0, H - 1, n)
    ts = np.sort(rng.uniform(0, 0.5, n))
    ps = rng.choice([-1.0, 1.0], n)
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, 5, sensor_size=(H, W)))
    tiled = np.asarray(events_to_voxel_tiled(xs, ys, ts, ps, 5, (H, W),
                                             tile=(128, 128), impl=None))
    np.testing.assert_allclose(tiled, exact, atol=1e-5)
    # the matmul impl (interpret on CPU) stays within kernel tolerance
    tiled_mm = np.asarray(events_to_voxel_tiled(xs, ys, ts, ps, 5, (H, W),
                                                tile=(128, 128)))
    rel = np.abs(tiled_mm - exact).max() / np.abs(exact).max()
    assert rel < 1e-4, rel
    # a tile too large for VMEM is rejected up front
    with pytest.raises(ValueError, match="tile"):
        events_to_voxel_tiled(xs, ys, ts, ps, 5, (H, W), tile=(480, 640))


def test_events_to_voxel_tiled_negative_coords_and_capacity_guard(rng):
    """Negative coords are dropped (like events_to_voxel), and an explicit
    capacity that would subsample mass raises instead of under-counting."""
    from event_utils_tpu.representations.voxel_grid import (
        events_to_voxel, events_to_voxel_tiled)

    n = 5000
    H, W = 480, 640
    xs = rng.uniform(-20, W - 1, n)
    ys = rng.uniform(-20, H - 1, n)
    ts = np.sort(rng.uniform(0, 0.5, n))
    ps = rng.choice([-1.0, 1.0], n)
    exact = np.asarray(events_to_voxel(xs, ys, ts, ps, 3, sensor_size=(H, W)))
    tiled = np.asarray(events_to_voxel_tiled(xs, ys, ts, ps, 3, (H, W),
                                             tile=(128, 128), impl=None))
    np.testing.assert_allclose(tiled, exact, atol=1e-5)
    with pytest.raises(ValueError, match="capacity"):
        events_to_voxel_tiled(xs, ys, ts, ps, 3, (H, W), tile=(128, 128),
                              impl=None, capacity=8)


@pytest.mark.slow
def test_voxel_spatial_bilinear_no_bin_crossing(rng):
    """Fractional-y taps must stay inside their temporal bin: the flat
    (B*H, W) trick let a y0+1 tap at fy in (H-1, H) cross into the next
    bin's row 0 (review r2; fixed with per-bin guard rows)."""
    from event_utils_tpu.representations.voxel_grid import events_to_voxel

    H, W, B = 8, 16, 3
    # one event per bin at fy = H - 0.5 (tap y0+1 = H must be dropped),
    # plus one at fy = -0.5 (tap y0 = -1 must be dropped)
    xs = np.array([4.0, 4.0, 4.0, 6.0])
    ys = np.array([H - 0.5, H - 0.5, H - 0.5, -0.5])
    ts = np.array([0.0, 0.5, 1.0, 0.0])
    ps = np.ones(4)
    g = np.asarray(events_to_voxel(xs, ys, ts, ps, B, sensor_size=(H, W),
                                   spatial_interpolation="bilinear"))
    # bin 0 row 0: only the fy=-0.5 event's y0+1 tap (weight 0.5 * its
    # temporal weight 1.0 at bin 0) — nothing from the fy=H-0.5 events
    assert np.isclose(g[0, 0, 6], 0.5), g[0, 0, :]
    assert np.isclose(g[0, 0, 4], 0.0)
    # each bin's last row holds the fy=H-0.5 event's y0 tap only
    for b, expected in ((0, 0.5), (1, 0.5), (2, 0.5)):
        col = g[b, H - 1, 4]
        assert col > 0.0
    # events fully below/above the image contribute nothing anywhere
    g2 = np.asarray(events_to_voxel(np.array([4.0]), np.array([H + 0.5]),
                                    np.array([0.5]), np.ones(1), B,
                                    sensor_size=(H, W),
                                    spatial_interpolation="bilinear"))
    assert g2.sum() == 0.0


def test_events_to_image_bilinear_padding_meanval(rng):
    """meanval + bilinear + padding crashed with a (H+1, W+1) vs (H, W)
    broadcast error (review r2; the reference's own path has the same
    latent defect — repaired here with an integer count on the image
    grid)."""
    from event_utils_tpu.representations.image import events_to_image

    n = 500
    xs = rng.uniform(0, 31, n)
    ys = rng.uniform(0, 23, n)
    ps = rng.choice([-1.0, 1.0], n)
    img = np.asarray(events_to_image(xs, ys, ps, sensor_size=(24, 32),
                                     interpolation="bilinear", padding=True,
                                     meanval=True))
    assert img.shape == (24, 32)
    assert np.isfinite(img).all()


def test_meanval_bilinear_unpadded_border_not_deflated(rng):
    """meanval+bilinear+padding=False: the denominator must count only the
    events the numerator's clip kept — a border event used to inflate the
    count at the last row/column while adding no mass."""
    from event_utils_tpu.representations.image import events_to_image

    H, W = 16, 16
    # one interior event and one clipped border event in the same column
    xs = np.array([5.2, 15.5])
    ys = np.array([5.2, 5.2])
    ps = np.array([1.0, 1.0])
    img = np.asarray(events_to_image(xs, ys, ps, sensor_size=(H, W),
                                     interpolation="bilinear",
                                     padding=False, meanval=True,
                                     default=0.0))
    # border event clipped from numerator AND denominator -> default 0
    assert img[5, 15] == 0.0 and img[6, 15] == 0.0
    assert img[5, 5] > 0.0
