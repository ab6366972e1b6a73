"""Whole-workload parity on a *simulated recording*.

The reference's only numerical quality control is running its cmax demo on
real recordings (SURVEY.md §4; events_cmax.py:391-432) — recordings this
environment doesn't have. The ESIM-style simulator closes that gap: these
tests generate a sensor-like sequence with exact motion ground truth, run
the ACTUAL reference optimizer stack (`/root/reference` scipy-BFGS driver,
repaired per tests/test_reference_parity.py) and our solvers on the same
events, and assert that
  (a) the reference pipeline recovers the planted motion (the recording is
      realistic enough to drive its quality control), and
  (b) our solvers recover it at least as accurately.

This certifies end-to-end behavior (grid init + BFGS + objective + IWE) on
realistic data, not just per-function numerics.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "lib")),
    reason="reference tree not mounted")

refp = importlib.import_module("test_reference_parity")

SENSOR = (64, 64)
GT = (25.0, -15.0)


@pytest.fixture(scope="module")
def ref_cmax(request):
    """The reference's events_cmax module, exec'd against the repaired
    objectives/warps (tests/test_reference_parity.py machinery).

    ``lib/contrast_max/__init__.py`` imports the corrupted files, so a stub
    package module is pre-seeded with the repaired ones under their real
    names before the relative imports in events_cmax.py resolve.
    """
    ref_warps = refp._load_patched_module("lib.contrast_max.warps_ref",
                                          "lib/contrast_max/warps.py")
    ref_obj = request.getfixturevalue("ref_objectives")
    pkg = types.ModuleType("lib.contrast_max")
    pkg.__path__ = [os.path.join(REF_ROOT, "lib", "contrast_max")]
    pkg.__package__ = "lib.contrast_max"
    # events_cmax imports plot_events from the reference's matplotlib
    # renderer, whose import chain needs skimage (absent here); the tests
    # never render, so a stub module satisfies the import.
    viz_stub = types.ModuleType("lib.visualization.draw_event_stream")
    viz_stub.plot_events = lambda *a, **k: None
    seeded = {"lib.contrast_max": pkg,
              "lib.contrast_max.objectives": ref_obj,
              "lib.contrast_max.warps": ref_warps,
              "lib.visualization.draw_event_stream": viz_stub}
    saved = {name: sys.modules.get(name) for name in seeded}
    sys.modules.update(seeded)
    try:
        # Load with the shared corruption repair plus one py2->py3 compat
        # fix: events_cmax.py:294 passes a `map` iterator to np.vstack,
        # which modern numpy rejects (same era as the `iteritems` in
        # rosbag_to_h5.py, SURVEY.md §7.3); materialize it.
        path = os.path.join(REF_ROOT, "lib/contrast_max/events_cmax.py")
        with open(path) as f:
            src = refp._repair_reference_source(f.read())
        src = src.replace("np.vstack(map(np.ravel, grids))",
                          "np.vstack(list(map(np.ravel, grids)))")
        mod = types.ModuleType("lib.contrast_max.events_cmax_ref")
        mod.__package__ = "lib.contrast_max"
        mod.__file__ = path
        sys.modules["lib.contrast_max.events_cmax_ref"] = mod
        exec(compile(src, path, "exec"), mod.__dict__)
        # SURVEY.md §7.2: the recursive grid search calls the undefined
        # name `recursive_search`; the documented intent is
        # grid_search_optimisation.
        if not hasattr(mod, "recursive_search"):
            mod.recursive_search = mod.grid_search_optimisation
        yield mod
    finally:
        for name, m in saved.items():
            if m is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = m


# Reuse the repaired-objectives fixture from the parity harness.
ref_objectives = refp.ref_objectives
ref_warps = refp.ref_warps


@pytest.fixture(scope="module")
def recording():
    """One simulated drifting-texture recording (module-scoped: simulated
    once, consumed by every test)."""
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_scene,
                                                 smooth_texture,
                                                 translating_scene)
    key = jax.random.PRNGKey(11)
    tex = smooth_texture(key, SENSOR, octaves=4)
    scene = translating_scene(tex, GT)
    events, frames, frame_ts, flows = simulate_scene(
        scene, 0.5, 150.0, SimulatorConfig(c_pos=0.15, c_neg=0.15))
    assert len(events) > 3000
    return events


def _err(params):
    return float(np.abs(np.asarray(params, np.float64)
                        - np.asarray(GT)).max())


@pytest.mark.slow
def test_reference_optimizer_runs_on_simulated(recording, ref_cmax,
                                               ref_objectives, ref_warps):
    """The actual reference optimize_contrast (scipy fmin_bfgs, SOFAS grid
    init) consumes the simulated recording end to end and makes real
    progress — evidence the simulator emits streams the reference's own
    quality-control workflow accepts.

    Measured behavior pinned here (not an aspiration): on this recording
    the reference's recursive grid search converges onto a ridge at
    ~(25.5, -2.1) — the correct vx, a poor vy — and fmin_bfgs then takes
    ZERO iterations from that x0 under every configuration (numeric and
    analytic gradients, blur 1.0/2.0). Our solvers recover both components
    (see the next test); the same accuracy gap appears on the synthetic
    bench scene (reference 6.8 px/s median flow error vs ours 4.7,
    benchmarks/bench_cmax.py)."""
    obj = ref_objectives.variance_objective()
    warp = ref_warps.linvel_warp()
    xs = recording.xs.astype(np.float64)
    ys = recording.ys.astype(np.float64)
    ps = recording.ps.astype(np.float64)
    params = ref_cmax.optimize_contrast(
        xs.copy(), ys.copy(), recording.ts.copy(), ps.copy(), warp, obj,
        numeric_grads=True, blur_sigma=1.0, img_size=SENSOR,
        grid_search_init=True)
    args = (xs, ys, recording.ts, ps, warp, SENSOR, 1.0)
    loss_ref = ref_objectives.variance_objective().evaluate_function(
        np.asarray(params, np.float64), *args)
    loss_zero = ref_objectives.variance_objective().evaluate_function(
        np.zeros(2), *args)
    assert loss_ref < loss_zero  # made progress over no compensation
    assert abs(params[0] - GT[0]) < 3.0, params  # vx component recovered


@pytest.mark.slow
def test_ours_matches_or_beats_reference_on_simulated(recording, ref_cmax,
                                                      ref_objectives,
                                                      ref_warps):
    """Same recording, both stacks: our host-driver and whole-solve-jit
    optimizers must land at least as close to the planted velocity as the
    reference driver does (small slack for BFGS path differences)."""
    from event_utils_tpu.contrast_max.events_cmax import (
        optimize_contrast, optimize_contrast_jit)
    from event_utils_tpu.models.objectives import variance_objective
    from event_utils_tpu.models.warps import linvel_warp

    # Like-for-like: both drivers get the SOFAS grid init (without it,
    # BFGS-from-zero stalls in a flat basin for the reference and for the
    # reference-semantics host driver alike).
    ref_params = ref_cmax.optimize_contrast(
        recording.xs.astype(np.float64), recording.ys.astype(np.float64),
        recording.ts, recording.ps.astype(np.float64),
        ref_warps.linvel_warp(), ref_objectives.variance_objective(),
        numeric_grads=True, blur_sigma=1.0, img_size=SENSOR,
        grid_search_init=True)

    ts32 = recording.ts.astype(np.float32)
    ours_host = optimize_contrast(recording.xs, recording.ys, ts32,
                                  recording.ps, linvel_warp(),
                                  variance_objective(), numeric_grads=True,
                                  blur_sigma=1.0, img_size=SENSOR,
                                  grid_search_init=True)
    ours_jit = optimize_contrast_jit(recording.xs, recording.ys, ts32,
                                     recording.ps, linvel_warp(),
                                     variance_objective(), img_size=SENSOR,
                                     grid_search_init=True)
    e_ref, e_host, e_jit = _err(ref_params), _err(ours_host), _err(ours_jit)
    assert e_host <= e_ref + 1.0, (ours_host, ref_params)
    assert e_jit <= e_ref + 1.0, (np.asarray(ours_jit), ref_params)


@pytest.mark.slow
def test_reference_grid_cmax_vs_ours_on_simulated(recording, ref_cmax,
                                                  ref_objectives,
                                                  ref_warps):
    """ROI-tiled flow on the simulated recording: the reference grid_cmax
    loop vs our batched device solve, both scored against the planted
    uniform flow."""
    from event_utils_tpu.contrast_max.events_cmax import grid_cmax_batched

    n = min(len(recording), 6000)
    # int64 coords: the reference's grid_cmax feeds infer_resolution
    # straight into range(), which rejects floats — its own recordings
    # store integer coordinates (h5 int16).
    xs = recording.xs[:n].astype(np.int64)
    ys = recording.ys[:n].astype(np.int64)
    ts = recording.ts[:n]
    ps = recording.ps[:n].astype(np.float64)

    ref_params, ref_rois, _ = ref_cmax.grid_cmax(
        xs, ys, ts, ps, roi_size=(32, 32),
        warp=ref_warps.linvel_warp(),
        obj=ref_objectives.variance_objective(adaptive_lifespan=False,
                                              minimum_events=105))
    assert len(ref_params) >= 2

    params, rois, f_evals, valid = grid_cmax_batched(
        xs.astype(np.float32), ys.astype(np.float32),
        ts.astype(np.float32), ps.astype(np.float32),
        roi_size=(32, 32), img_size=SENSOR, capacity=4096)
    params = np.asarray(params)[np.asarray(valid)]
    assert len(params) >= 2

    med_ref = np.median([_err(p) for p in ref_params])
    med_ours = np.median([_err(p) for p in params])
    # Per-ROI solves see a quarter of the texture each, so both stacks sit
    # in a much broader optimum than the full-frame solve (ours measures
    # ~8.8 px/s median here); the substantive claim is relative — the
    # batched device solver is no worse than the reference loop — plus a
    # sanity ceiling.
    assert med_ours <= med_ref + 1.0, (med_ours, med_ref)
    assert med_ours < 15.0
