"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_utils_tpu.parallel import (make_mesh, sharded_cmax_train_step,
                                      sharded_events_to_voxel, sharded_iwe,
                                      sharded_grid_cmax)
from event_utils_tpu.representations import events_to_voxel
from event_utils_tpu.models import get_iwe, linvel_warp, variance_objective
from conftest import make_events

SENSOR = (24, 32)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(8)


def test_sharded_voxel_matches_single_device(rng, mesh):
    xs, ys, ts, ps = make_events(rng, n=4096, sensor=SENSOR)
    want = np.asarray(events_to_voxel(xs, ys, ts, ps, 5, sensor_size=SENSOR))
    got = np.asarray(sharded_events_to_voxel(mesh, xs, ys, ts, ps, 5,
                                             sensor_size=SENSOR))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_voxel_ragged_padding(rng, mesh):
    # n not a multiple of the mesh size: padding must not change the result
    xs, ys, ts, ps = make_events(rng, n=4001, sensor=SENSOR)
    want = np.asarray(events_to_voxel(xs, ys, ts, ps, 3, sensor_size=SENSOR))
    got = np.asarray(sharded_events_to_voxel(mesh, xs, ys, ts, ps, 3,
                                             sensor_size=SENSOR))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_iwe_matches_single_device(rng, mesh):
    xs, ys, ts, ps = make_events(rng, n=2048, sensor=SENSOR, int_coords=False)
    params = np.array([5.0, -3.0], np.float32)
    want, _ = get_iwe(params, xs, ys, ts, ps, linvel_warp(), SENSOR)
    got = sharded_iwe(mesh, params, xs, ys, ts, ps, linvel_warp(), SENSOR)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


@pytest.mark.slow
def test_sharded_train_step_descends(rng, mesh):
    from test_cmax import synthetic_flow_events
    xs, ys, ts, ps = synthetic_flow_events(rng, vx=15.0, vy=-8.0,
                                           sensor=SENSOR)
    params = jnp.zeros(2)
    opt = None
    losses = []
    for _ in range(25):
        params, opt, loss = sharded_cmax_train_step(
            mesh, params, opt, xs, ys, ts, ps, variance_objective(),
            linvel_warp(), SENSOR, lr=2.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"


def test_sharded_train_step_matches_single_device(rng, mesh):
    """The 8-way step must produce the SAME update as a 1-device mesh —
    regression for the check_vma=False bug that turned the psum transpose
    into identity (per-device shard-only gradients, silently diverged
    replicated params)."""
    xs, ys, ts, ps = make_events(rng, n=4096, sensor=SENSOR,
                                 int_coords=False)
    mesh1 = make_mesh(1)
    args = (jnp.array([3.0, -2.0]), None, xs, ys, ts, ps,
            variance_objective(), linvel_warp(), SENSOR)
    p8, m8, l8 = sharded_cmax_train_step(mesh, *args)
    p1, m1, l1 = sharded_cmax_train_step(mesh1, *args)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), atol=1e-4)
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-4)


@pytest.mark.slow
def test_sharded_grid_cmax(rng, mesh):
    from test_cmax import synthetic_flow_events
    xs, ys, ts, ps = synthetic_flow_events(rng, vx=12.0, vy=6.0,
                                           n_events=6000, sensor=SENSOR)
    params, rois, f_evals, valid = sharded_grid_cmax(
        mesh, xs, ys, ts, ps, roi_size=(12, 16), img_size=SENSOR, maxiter=25)
    # same return contract as grid_cmax_batched: (R, 4) [yc, xc, rh, rw]
    assert np.asarray(rois).shape == (len(np.asarray(params)), 4)
    assert set(np.asarray(rois)[:, 2]) == {12.0}
    p = np.asarray(params)[np.asarray(valid)]
    med = np.median(p, axis=0)
    np.testing.assert_allclose(med, [12.0, 6.0], atol=5.0)


def test_sharded_timestamp_image_matches_single_device(rng, mesh):
    """Zhu timestamp images over the sharded stream equal the single-device
    function (ratio-of-global-sums: psum the four raw channels, divide
    once)."""
    from event_utils_tpu.parallel import sharded_events_to_timestamp_image
    from event_utils_tpu.representations.image import (
        events_to_timestamp_image)

    n = 4000
    xs = rng.uniform(0, SENSOR[1] - 1, n).astype(np.float32)
    ys = rng.uniform(0, SENSOR[0] - 1, n).astype(np.float32)
    ts = np.sort(rng.uniform(0, 0.4, n)).astype(np.float32)
    ps = rng.choice(np.array([-1.0, 1.0], np.float32), n)

    for reverse in (False, True):
        sp, sn = sharded_events_to_timestamp_image(
            mesh, xs, ys, ts, ps, sensor_size=SENSOR,
            timestamp_reverse=reverse)
        rp, rn = events_to_timestamp_image(xs, ys, ts, ps,
                                           sensor_size=SENSOR,
                                           timestamp_reverse=reverse)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(rp), atol=2e-5)
        np.testing.assert_allclose(np.asarray(sn), np.asarray(rn), atol=2e-5)
