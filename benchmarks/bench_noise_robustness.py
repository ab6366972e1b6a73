"""Contrast-max accuracy under sensor non-idealities (simulated GT sweep).

The reference has no way to quantify how its solvers degrade with sensor
noise (no simulator, no ground truth). This sweep uses the ESIM-style
simulator to plant a known velocity, then dials in each non-ideality —
per-pixel threshold mismatch, refractory period, log-intensity noise —
and reports the recovered-velocity error of the whole-solve-jit optimizer.

Accuracy study, not a perf benchmark: runs fine on CPU.

Run:
    python benchmarks/bench_noise_robustness.py

Prints one JSON line per (knob, value).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("BENCH_NOISE_TPU", "0") != "1":
    # CPU by default — the axon plugin ignores JAX_PLATFORMS env.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GT = (25.0, -15.0)
SENSOR = (64, 64)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_case(knob, value, seed):
    from event_utils_tpu.contrast_max.events_cmax import optimize_contrast_jit
    from event_utils_tpu.models.objectives import variance_objective
    from event_utils_tpu.models.warps import linvel_warp
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_scene,
                                                 smooth_texture,
                                                 translating_scene)

    tex_key, sim_key = jax.random.split(jax.random.PRNGKey(seed))
    scene = translating_scene(smooth_texture(tex_key, SENSOR, octaves=4), GT)
    cfg = SimulatorConfig(c_pos=0.15, c_neg=0.15, **{knob: value})
    needs_key = cfg.sigma_c > 0 or cfg.noise_std > 0
    ev, *_ = simulate_scene(scene, 0.5, 150.0, cfg,
                            key=sim_key if needs_key else None)
    if len(ev) < 500:
        return {"knob": knob, "value": value, "n_events": len(ev),
                "err_px_s": None, "note": "too few events"}
    p = np.asarray(optimize_contrast_jit(
        ev.xs, ev.ys, ev.ts.astype(np.float32), ev.ps, linvel_warp(),
        variance_objective(), img_size=SENSOR, grid_search_init=True))
    return {"knob": knob, "value": value, "n_events": len(ev),
            "err_px_s": round(float(np.abs(p - np.asarray(GT)).max()), 2)}


def main():
    sweeps = [
        ("sigma_c", [0.0, 0.1, 0.2, 0.4]),       # threshold mismatch
        ("refractory", [0.0, 0.005, 0.02, 0.05]),  # dead time (s)
        ("noise_std", [0.0, 0.02, 0.05, 0.1]),   # log-intensity noise
    ]
    seeds = (3, 7)
    for knob, values in sweeps:
        for v in values:
            errs, ns = [], []
            for s in seeds:
                r = run_case(knob, v, s)
                if r["err_px_s"] is not None:
                    errs.append(r["err_px_s"])
                    ns.append(r["n_events"])
            out = {"knob": knob, "value": v,
                   "median_err_px_s": (round(float(np.median(errs)), 2)
                                       if errs else None),
                   "mean_events": int(np.mean(ns)) if ns else 0,
                   "seeds": len(errs)}
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
