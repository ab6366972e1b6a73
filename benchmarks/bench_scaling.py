"""Mesh-scaling validation of the sharded accumulation/solver paths.

Runs every multi-chip entry point over 1/2/4/8-device meshes and asserts
the results are **mesh-size-invariant** (the single-device answer is the
oracle), then reports per-mesh wall-clock. On the virtual CPU mesh the
timings validate the *structure* (collective placement, compile success,
work distribution), not ICI performance — run on a real slice for
Mev/s-per-chip scaling curves; the program is identical.

Run:
    python benchmarks/bench_scaling.py          # forces an 8-device CPU mesh

Prints one JSON line per (path, n_devices).
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Default: the virtual 8-device CPU mesh (the axon TPU tunnel exposes ONE
# chip, which cannot validate scaling). Set BENCH_SCALING_REAL=1 on a real
# multi-chip slice. NB: must run before any backend use — the axon plugin
# ignores the JAX_PLATFORMS env var (see .claude/skills/verify/SKILL.md).
if os.environ.get("BENCH_SCALING_REAL", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

N = 200_000
H, W, B = 180, 240, 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_scene(rng):
    xs = rng.integers(0, W, N).astype(np.float32)
    ys = rng.integers(0, H, N).astype(np.float32)
    ts = np.sort(rng.uniform(0, 0.2, N)).astype(np.float32)
    ps = rng.choice(np.array([-1.0, 1.0], np.float32), N)
    return xs, ys, ts, ps


def timed(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def main():
    from event_utils_tpu.models.objectives import variance_objective
    from event_utils_tpu.models.warps import linvel_warp
    from event_utils_tpu.parallel.sharding import (make_mesh,
                                                   sharded_events_to_voxel,
                                                   sharded_grid_cmax,
                                                   sharded_iwe)

    rng = np.random.default_rng(0)
    xs, ys, ts, ps = make_scene(rng)
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    log(f"backend={jax.default_backend()}, devices={n_avail}, "
        f"mesh sizes={sizes}")

    results = []
    oracles = {}
    for n in sizes:
        mesh = make_mesh(n)

        vox, t_vox = timed(
            lambda: sharded_events_to_voxel(mesh, xs, ys, ts, ps, B,
                                            sensor_size=(H, W)))
        vox = np.asarray(vox)
        iwe, t_iwe = timed(
            lambda: sharded_iwe(mesh, np.array([12.0, -7.0], np.float32),
                                xs, ys, ts, ps, linvel_warp(), (H, W)))
        iwe = np.asarray(iwe)
        (params, rois, f_evals, valid), t_cmax = timed(
            lambda: sharded_grid_cmax(mesh, xs, ys, ts, ps,
                                      roi_size=(20, 20), img_size=(H, W),
                                      obj=variance_objective(), maxiter=20,
                                      capacity=1024), reps=1)
        params = np.asarray(params)

        if n == sizes[0]:
            oracles = {"vox": vox, "iwe": iwe, "params": params}
        else:
            dv = np.abs(vox - oracles["vox"]).max()
            di = np.abs(iwe - oracles["iwe"]).max()
            dp = np.abs(params - oracles["params"]).max()
            assert dv < 1e-3, f"voxel diverges across mesh sizes: {dv}"
            assert di < 1e-3, f"IWE diverges across mesh sizes: {di}"
            assert dp < 2.0, (
                f"grid_cmax params diverge across mesh sizes: {dp} "
                "(tolerance covers fp reduction-order drift through the "
                "non-convex solve)")
            log(f"n={n}: max dev vs {sizes[0]}-device oracle — "
                f"voxel {dv:.2e}, iwe {di:.2e}, params {dp:.2e}")

        for path, sec in (("sharded_events_to_voxel", t_vox),
                          ("sharded_iwe", t_iwe),
                          ("sharded_grid_cmax", t_cmax)):
            results.append({"path": path, "n_devices": n,
                            "wallclock_s": round(sec, 4),
                            "mev_per_s": round(N / sec / 1e6, 1)})

    for r in results:
        print(json.dumps(r))
    if len(sizes) > 1:
        log(f"ALL MESH SIZES AGREE ({sizes})")
    else:
        log("single mesh size available — no cross-mesh invariance checked")


if __name__ == "__main__":
    main()
