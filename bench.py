"""Headline benchmark: all five BASELINE.json configs, one JSON line.

1. **Voxel-grid construction** (config 1): 5-bin temporally-bilinear voxel
   grid on a 180x240 sensor — the Pallas MXU one-hot-matmul kernel
   (``voxel_matmul``, hi/lo precision, ~1e-5 relative parity) vs the ACTUAL
   reference implementation (``/root/reference/lib`` ``events_to_voxel_torch``,
   per-bin ``index_put_(accumulate=True)``, voxel_grid.py:114-153) on CPU.
   Large-sensor rows (DAVIS346 / VGA / 720p) certify the multi-tile kernel
   (``voxel_matmul_tiles``) on device-generated pre-bucketed tiles.
2. **grid_cmax ROI flow** (config 4): all-ROIs-at-once
   ``grid_cmax_batched`` on device vs the reference's per-ROI
   grid-search + BFGS CPU loop (events_cmax.py:28-76), wall-clock for the
   full 108-ROI sensor (reference extrapolated from a timed sample).
3. **Event + timestamp images** (config 2), **augmentation 2x densify**
   (config 3), **streaming voxel loader** (config 5): delegated to
   benchmarks/bench_configs.py, each reference-vs-ours.

Timing uses the on-device loop harness (benchmarks/harness.py): inputs are
generated on device per iteration and only a checksum scalar transfers, so
neither tunnel transfer latency nor the runtime's execution cache can
distort the numbers.

Prints ONE JSON line; the required keys certify the voxel north star and the
``grid_cmax_*`` keys certify the second:
  {"metric": ..., "value": Mev/s, "unit": "Mev/s", "vs_baseline": ratio,
   "grid_cmax_wallclock_s": s, "grid_cmax_vs_baseline": ratio}
plus honest statistics (``value_median``, ``voxel_kernel`` naming which
precision variant won) and the config-2/3/5 + large-sensor rows.
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"))

H, W, B = 180, 240, 5
N = 1 << 21  # ~2.1M events per grid
ITERS = 10
VOXEL_RUNS = 5

REF_ROOT = "/root/reference"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _reference_voxel_fn():
    """The actual reference implementation when mounted, else a faithful
    hand-rolled copy of its algorithm (same per-bin index_put_ loop)."""
    import torch

    if os.path.isdir(os.path.join(REF_ROOT, "lib")):
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        from lib.representations.voxel_grid import events_to_voxel_torch
        log("baseline: /root/reference lib.representations.events_to_voxel_torch")
        return lambda x, y, t, p: events_to_voxel_torch(x, y, t, p, B,
                                                        sensor_size=(H, W))

    log("baseline: reference tree not mounted; using local algorithm copy")

    def voxel(txs, tys, tts, tps):
        dt = tts[-1] - tts[0]
        t_norm = (tts - tts[0]) / dt * (B - 1)
        bins = []
        for bi in range(B):
            w = tps * torch.clamp(1.0 - torch.abs(t_norm - bi), min=0.0)
            img = torch.zeros(H, W)
            img.index_put_((tys, txs), w, accumulate=True)
            bins.append(img)
        return torch.stack(bins)

    return voxel


def bench_torch_reference(reps: int = 3):
    """Reference voxel path on CPU torch."""
    import torch

    voxel = _reference_voxel_fn()
    rng = np.random.default_rng(0)
    txs = torch.from_numpy(rng.integers(0, W, N)).long()
    tys = torch.from_numpy(rng.integers(0, H, N)).long()
    tts = torch.from_numpy(np.sort(rng.uniform(0, 0.1, N))).float()
    tps = torch.from_numpy(rng.choice(np.array([-1.0, 1.0], np.float32), N))

    voxel(txs, tys, tts, tps)  # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        out = voxel(txs, tys, tts, tps)
    el = (time.perf_counter() - t0) / reps
    return N / el / 1e6, (txs.numpy(), tys.numpy(), tts.numpy(),
                          tps.numpy(), out.numpy())


def _load_pinned_cmax_baseline(xs, ys, ts, ps):
    """The in-repo pinned reference distribution (all 105 solvable ROIs,
    benchmarks/pin_cmax_baseline.py). Returns the dict or None when absent
    or when the scene no longer matches its fingerprint."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "ref_grid_cmax_baseline.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        pinned = json.load(f)
    from pin_cmax_baseline import scene_fingerprint

    fp = scene_fingerprint(xs, ys, ts, ps)
    if fp != pinned["scene"]["fingerprint"]:
        log(f"pinned cmax baseline fingerprint mismatch ({fp} vs "
            f"{pinned['scene']['fingerprint']}) — re-run "
            "benchmarks/pin_cmax_baseline.py; falling back to live timing")
        return None
    return pinned


def bench_grid_cmax():
    """North star 2: full-sensor ROI flow, device vs reference CPU loop.

    Denominator: the PINNED all-ROI reference distribution when available
    (regression-detecting — the speedup only moves when OUR wall-clock
    moves); a live 6-ROI sample is still timed to report host drift vs the
    pinned numbers. Falls back to the old live extrapolation if the pin is
    missing or stale."""
    from bench_cmax import H as CH, W as CW, ROI, make_scene, reference_grid_cmax
    from event_utils_tpu.contrast_max import grid_cmax_batched

    xs, ys, ts, ps = make_scene()
    log(f"grid_cmax scene: {len(xs)} events, rotating flow field")

    pinned = _load_pinned_cmax_baseline(xs, ys, ts, ps)
    n_sample = 6
    t0 = time.perf_counter()
    ref_params, ref_rois = reference_grid_cmax(xs, ys, ts, ps,
                                               max_rois=n_sample)
    live_sample_s = time.perf_counter() - t0
    ref_per_roi = live_sample_s / n_sample
    drift = None
    if pinned is not None:
        ref_total = pinned["total_s"]
        # drift: this host/session vs the pinned host on the SAME first
        # n_sample ROIs (scan order matches reference_grid_cmax's loop)
        pinned_sample_s = sum(r["seconds"] for r in pinned["rois"][:n_sample])
        drift = live_sample_s / pinned_sample_s
        log(f"reference CPU: pinned {ref_total:.1f} s for "
            f"{pinned['n_rois']} ROIs ({pinned['pinned_utc']}); live "
            f"{n_sample}-ROI sample {live_sample_s:.2f} s = {drift:.2f}x "
            "the pinned sample (host drift, not used in vs_baseline)")
    else:
        total_rois = (CH // ROI[0]) * (CW // ROI[1])
        ref_total = ref_per_roi * total_rois
        log(f"reference CPU: {ref_per_roi:.2f} s/ROI -> {ref_total:.1f} s "
            f"for {total_rois} ROIs (extrapolated from {n_sample})")

    # Compile on a perturbed same-shape copy; the timed call then reuses the
    # executable but cannot hit the runtime's input-keyed execution cache.
    # The shift is a whole ROI width so per-ROI event counts are merely
    # PERMUTED across ROIs: the overflow-refine tier's batch shape depends
    # on the count distribution, and a +1 shift changed it enough to make
    # the timed call recompile (measured 10.7 s vs the true 0.28 s).
    cap = 2048
    np.asarray(grid_cmax_batched((xs + ROI[1]) % CW, ys, ts, ps,
                                 roi_size=ROI, img_size=(CH, CW), maxiter=30,
                                 capacity=cap)[0])
    t0 = time.perf_counter()
    params, rois, f_evals, valid = grid_cmax_batched(
        xs, ys, ts, ps, roi_size=ROI, img_size=(CH, CW), maxiter=30,
        capacity=cap)
    params = np.asarray(params)  # forces execution + transfer
    ours_total = time.perf_counter() - t0
    log(f"grid_cmax_batched (device): {ours_total:.2f} s for all "
        f"{params.shape[0]} ROIs")

    # flow agreement vs ground truth on the reference-timed ROIs
    errs_ref, errs_ours = [], []
    omega, ccx, ccy = 1.2, CW / 2, CH / 2
    rois_np = np.asarray(rois)
    for (yc, xc), rp in zip(ref_rois, ref_params):
        ctr_x, ctr_y = xc + ROI[1] / 2, yc + ROI[0] / 2
        gt = np.array([-omega * (ctr_y - ccy), omega * (ctr_x - ccx)])
        errs_ref.append(np.linalg.norm(rp - gt))
        match = np.where((rois_np[:, 0] == yc) & (rois_np[:, 1] == xc))[0]
        if len(match):
            errs_ours.append(np.linalg.norm(params[match[0]] - gt))

    # Tunnel-link probe: the solve ships ~4.4 MB of bucketed arrays
    # through the axon tunnel each call, and tunnel bandwidth/latency is
    # session weather (identical code timed 0.29-1.04 s across 2026-08-20
    # runs vs 0.29 in r4). A standalone serialized copy of the same batch
    # is reported as grid_cmax_tunnel_copy_s — an UPPER BOUND on the
    # in-call transfer term (which overlaps with dispatch), giving the
    # wall-clock certification a same-session link yardstick; on real
    # co-located TPU hardware this term is microseconds.
    import jax as _jax

    from event_utils_tpu.contrast_max.events_cmax import bucket_events_by_roi
    bx, by, bt, bp, bmask = bucket_events_by_roi(
        xs, ys, ts, ps, (CH, CW), ROI, cap)[:5]
    dev = _jax.devices()[0]
    t0 = time.perf_counter()
    puts = [_jax.device_put(np.asarray(a), dev)
            for a in (bx, by, bt, bp, bmask)]
    for p_ in puts:
        p_.block_until_ready()
    transfer_s = time.perf_counter() - t0
    log(f"grid_cmax tunnel probe: a standalone serialized copy of the "
        f"same 4.4 MB batch takes {transfer_s:.2f} s (upper bound on the "
        f"in-call transfer term, which overlaps with dispatch; wall was "
        f"{ours_total:.2f} s)")

    # ALL-ROI accuracy (105 valid ROIs, not just the 6 timed ones): ours
    # from this very solve, reference from the pinned baseline's stored
    # per-ROI params. Deterministic given the solver config — the stable
    # accuracy certification (r5 sweep: every non-median config lands in
    # a 3.94-3.99 px/s band, so this number moving >0.1 means a real
    # solver change, not weather).
    valid_np = np.asarray(valid)
    ctr_x = rois_np[:, 1] + ROI[1] / 2
    ctr_y = rois_np[:, 0] + ROI[0] / 2
    gt_all = np.stack([-omega * (ctr_y - ccy), omega * (ctr_x - ccx)], 1)
    err_all = np.linalg.norm(params - gt_all, axis=1)[valid_np]
    ours_all_med = round(float(np.median(err_all)), 2)
    ref_all_med = pinned.get("flow_err_median_px") if pinned else None
    log(f"flow error vs GT, all {int(valid_np.sum())} ROIs (px/s): "
        f"reference {ref_all_med} (pinned), ours {ours_all_med}")

    def med(errs):
        # empty -> None, never NaN: json.dumps would emit bare NaN and break
        # the driver's strict one-line JSON contract
        return round(float(np.median(errs)), 1) if len(errs) else None

    log(f"flow error vs GT (px/s): reference {med(errs_ref)}, "
        f"ours {med(errs_ours)}")
    return {
        "grid_cmax_wallclock_s": round(ours_total, 2),
        "grid_cmax_vs_baseline": round(ref_total / ours_total, 1),
        "grid_cmax_baseline_s": round(ref_total, 2),
        "grid_cmax_baseline_pinned": pinned is not None,
        "grid_cmax_host_drift": round(drift, 2) if drift else None,
        "grid_cmax_tunnel_copy_s": round(transfer_s, 2),
        "grid_cmax_flow_err_ref_px": med(errs_ref),
        "grid_cmax_flow_err_ours_px": med(errs_ours),
        "grid_cmax_flow_err_all_ref_px": ref_all_med,
        "grid_cmax_flow_err_all_ours_px": ours_all_med,
    }


def bench_tiled_sensors(runs: int = 2):
    """Large-sensor voxel rows: the multi-tile kernel at DAVIS346/VGA/720p
    (median Mev/s over ``runs``), device-generated pre-bucketed tiles."""
    import jax.numpy as jnp

    from bench_tiled import grid_for, time_tiled_loop
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul_tiles

    tile, chunk, iters = (96, 128), 4096, 8
    # A tunnel hiccup during the base-loop measurement floors the
    # subtraction at 1e-9 s and prints ~2e9 Mev/s (observed); anything
    # above this ceiling (1.5x the best tile-local rate ever measured,
    # ~1200 Mev/s) is a harness artifact — drop and retry.
    ceiling = 1800.0
    out = {}
    for sname, sensor in (("davis346", (260, 346)), ("vga", (480, 640)),
                          ("720p", (720, 1280))):
        T = grid_for(sensor, tile)
        cap = max(1, N // T)
        n_eff = T * cap

        def fn(bx, by, bt, bp):
            return voxel_matmul_tiles(bx, by, bt, bp, B, tile,
                                      jnp.float32(0.0), jnp.float32(0.1),
                                      chunk=chunk)

        rates, attempts = [], 0
        while len(rates) < runs and attempts < runs + 3:
            r = n_eff / time_tiled_loop(
                fn, T, cap, tile, iters=iters,
                seed=int(time.time() * 1000) % (1 << 20) + 31 * attempts) / 1e6
            attempts += 1
            if r <= ceiling:
                rates.append(r)
            else:
                log(f"tiled voxel {sname}: dropped implausible run "
                    f"{r:.0f} Mev/s (harness floor artifact)")
        out[sname] = round(float(np.median(rates)), 1) if rates else None
        log(f"tiled voxel {sname} {sensor}: median "
            f"{out[sname] if out[sname] is not None else 'n/a'} Mev/s "
            f"(plausible runs {[round(r) for r in rates]})")
    return out


def bench_secondary_configs():
    """BASELINE configs 2/3/5 via bench_configs; flattened JSON fields."""
    import tempfile

    import bench_configs as bc

    rng = np.random.default_rng(int(time.time()) % (1 << 20))
    xs, ys, ts, ps = bc.slider_scene(rng)
    fields = {}
    try:
        r2 = bc.config2_images(xs, ys, ts, ps)
        fields.update({
            "event_image_mevs": r2["ours_mevs"][0],
            "event_image_mevs_median": r2["ours_mevs_median"][0],
            "event_image_roofline_mevs": r2["roofline_mevs"][0],
            "event_image_roofline_frac": r2["roofline_frac"][0],
            "event_image_vs_baseline": r2["speedup"][0],
            "timestamp_image_mevs": r2["ours_mevs"][1],
            "timestamp_image_mevs_median": r2["ours_mevs_median"][1],
            "timestamp_image_roofline_mevs": r2["roofline_mevs"][1],
            "timestamp_image_roofline_frac": r2["roofline_frac"][1],
            "timestamp_image_vs_baseline": r2["speedup"][1]})
    except Exception as exc:
        log(f"config2 (images) FAILED: {type(exc).__name__}: {exc}")
    try:
        r3 = bc.config3_augmentation(xs, ys, ts, ps)
        # Certify the SORTED device densify (a real measurement). The
        # unsorted variant is cheaper than the harness's base loop and
        # config3 already reports it as None (n/a) when implausible.
        fields.update({
            "augment_densify_mevs": r3["ours_mevs"],
            "augment_densify_device_mevs": r3["ours_device_sorted_mevs"],
            "augment_densify_device_mevs_median":
                r3["ours_device_sorted_mevs_median"],
            "augment_densify_device_unsorted_mevs": r3["ours_device_mevs"],
            "augment_densify_vs_baseline": r3["speedup"]})
    except Exception as exc:
        log(f"config3 (augmentation) FAILED: {type(exc).__name__}: {exc}")
    try:
        r5 = bc.config5_streaming(tempfile.mkdtemp())
        fields.update({
            "streaming_loader_mevs": r5["ours_mevs"]["memmap"],
            "streaming_loader_mevs_median": r5["ours_mevs_median"]["memmap"],
            "streaming_loader_vs_baseline": r5["speedup"]})
    except Exception as exc:
        log(f"config5 (streaming) FAILED: {type(exc).__name__}: {exc}")
    return fields


def _probe_devices(timeout_s: float = 180.0):
    """Bounded jax.devices(): the remote-TPU tunnel can outage-hang device
    init indefinitely (measured 2026-08-17); fail fast with a clear exit
    code instead of hanging the driver's bench step forever."""
    import threading

    out = []

    def probe():
        import jax

        out.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        log(f"FATAL: jax.devices() did not return within {timeout_s:.0f}s "
            "— TPU tunnel down? No benchmark result produced.")
        os._exit(3)
    return out[0]


def main():
    devices = _probe_devices()

    import jax

    from harness import throughput_mevs
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul
    from event_utils_tpu.representations.voxel_grid import events_to_voxel

    log(f"jax device: {devices[0]}")

    torch_mevs, (xs, ys, ts, ps, torch_out) = bench_torch_reference()
    log(f"torch-cpu reference voxel: {torch_mevs:.1f} Mev/s")

    # Two precise kernels in the same tolerance class: 'hilo' (hi/lo bf16
    # weight split, ~1e-5 rel) and 'int8' (two-level quantization,
    # |err| <= 1/(2*127*254) ~ 1.6e-5). Their speed ordering flips with
    # tunnel contention, so certify the best passing-parity run of either.
    scale = max(np.max(np.abs(torch_out)), 1.0)
    for prec in ("hilo", "int8"):
        ours = np.asarray(voxel_matmul(xs, ys, ts.astype(np.float32), ps, B,
                                       (H, W), precision=prec))
        err = np.max(np.abs(ours - torch_out))
        log(f"output parity vs torch ({prec}): max|diff|={err:.6f} "
            f"(rel {err / scale:.2e})")
        assert err / scale < 1e-3, f"parity check failed ({prec})"

    # best across runs/kernels (the shared device tunnel adds run-to-run
    # noise; max is the right statistic for intrinsic throughput under
    # external slowdowns — every run executes the identical program).
    # Guard against INFLATED outliers: the harness subtracts a separately
    # timed data-generation loop, and a tunnel hiccup during that base
    # measurement can make one run read absurdly fast (observed 2600 Mev/s
    # once); cap accepted runs at 2x the median before taking the max.
    # Physical ceilings per precision (see the roofline block below): a run
    # reading above its kernel's FLOP bound is a harness artifact by
    # definition (observed: 940 Mev/s "best" against a 700 Mev/s roofline
    # when a tunnel hiccup inflated one run within the 2x-median cap).
    _ceiling = {"hilo": 700.0, "int8": 700.0, "bf16": 1050.0}

    # 1.15x: the idle chip sustains a median ~8% ABOVE the 700 Mev/s FLOP
    # model (753 measured r5 — boost clocks or a conservative model), so a
    # 1.05x ceiling was filtering real runs; 985-Mev/s-class artifacts
    # still land far outside 1.15x.
    _ceiling_factor = 1.15

    def robust_best(runs, prec):
        med = float(np.median(runs))
        cap = min(2.0 * med, _ceiling_factor * _ceiling[prec])
        dropped_ceiling = [r for r in runs
                           if r > _ceiling_factor * _ceiling[prec]
                           and r <= 2.0 * med]
        if dropped_ceiling:
            # a run above the FLOP roofline is a harness artifact, but log
            # it: a kernel that legitimately beat the ceiling would
            # otherwise be silently under-reported
            log(f"robust_best({prec}): dropped {len(dropped_ceiling)} "
                f"run(s) above the {_ceiling[prec]:.0f} Mev/s roofline "
                f"ceiling: {[round(r) for r in dropped_ceiling]}")
        plausible = [r for r in runs if r <= cap]
        # all runs implausible: return a value we're willing to stand
        # behind (the cap), never the raw median we just declared implausible
        return max(plausible) if plausible else min(med, cap)

    results = {}
    for prec in ("hilo", "int8"):
        # time-derived seed base: the axon runtime caches executions on
        # (program, input buffers) across processes; reused seeds can
        # return cached results in ~0 time and corrupt the measurement
        base = int(time.time() * 1000) % (1 << 20)
        results[prec] = [throughput_mevs(
            lambda x, y, t, p: voxel_matmul(x, y, t, p, B, (H, W),
                                            precision=prec),
            N, (H, W), iters=ITERS, seed=base + s * 31)
            for s in range(VOXEL_RUNS)]
        log(f"pallas voxel_matmul ({prec}): best {robust_best(results[prec], prec):.0f} "
            f"Mev/s (runs: {[round(r) for r in results[prec]]})")
    best_prec = max(results, key=lambda k: robust_best(results[k], k))
    mevs = robust_best(results[best_prec], best_prec)
    med_mevs = float(np.median(results[best_prec]))
    # Roofline fraction: the invariant to read cross-round numbers against
    # (tunnel/session noise moves Mev/s; the kernel's FLOP bound doesn't).
    # hilo = 3 matmuls/chunk -> ~700 Mev/s on v5e; bf16 = 2 -> ~1050; int8's
    # paper bound is ~2100 (2 int8 matmuls at 2x rate) but its achievable
    # ceiling is operand-pack-bound at ~hilo's level (NOTES_NEXT.md roofline
    # study), so it is normalized against 700 too.
    roofline_mevs = {"hilo": 700.0, "int8": 700.0, "bf16": 1050.0}
    roofline_frac = mevs / roofline_mevs[best_prec]
    roofline_frac_median = med_mevs / roofline_mevs[best_prec]
    log(f"headline: {best_prec} at {mevs:.0f} Mev/s (median {med_mevs:.0f}; "
        f"{roofline_frac:.0%} of the {roofline_mevs[best_prec]:.0f} Mev/s "
        f"roofline, median {roofline_frac_median:.0%})")

    # ---- large sensors: the multi-tile kernel -----------------------------
    try:
        tiled_fields = {"voxel_tiled_mevs": bench_tiled_sensors()}
    except Exception as exc:
        log(f"tiled-sensor bench FAILED: {type(exc).__name__}: {exc}")
        tiled_fields = {}

    # ---- north star 2: grid_cmax ------------------------------------------
    try:
        cmax_fields = bench_grid_cmax()
    except Exception as exc:  # never lose the voxel headline
        log(f"grid_cmax bench FAILED: {type(exc).__name__}: {exc}")
        cmax_fields = {"grid_cmax_wallclock_s": None,
                       "grid_cmax_vs_baseline": None}

    # ---- configs 2/3/5 ----------------------------------------------------
    try:
        secondary_fields = bench_secondary_configs()
    except Exception as exc:
        log(f"secondary configs FAILED: {type(exc).__name__}: {exc}")
        secondary_fields = {}

    # secondary diagnostics (opt-in: they add ~2-3 min of tunnel time)
    try:
        if os.environ.get("BENCH_DIAG", "0") != "1":
            raise RuntimeError("set BENCH_DIAG=1 for bf16/xla diagnostics")
        bf16 = throughput_mevs(
            lambda x, y, t, p: voxel_matmul(x, y, t, p, B, (H, W),
                                            precision="bf16"),
            N, (H, W), iters=ITERS)
        xla = throughput_mevs(
            lambda x, y, t, p: events_to_voxel(x, y, t, p, B,
                                               sensor_size=(H, W)),
            N, (H, W), iters=4)
        log(f"[diag] bf16 kernel: {bf16:.0f} Mev/s; xla scatter: {xla:.0f} Mev/s")
    except Exception as exc:  # diagnostics must not break the headline
        log(f"[diag] skipped: {exc}")

    print(json.dumps({
        "metric": "voxel_grid_construction_throughput",
        "value": round(mevs, 1),
        "unit": "Mev/s",
        "vs_baseline": round(mevs / torch_mevs, 2),
        "value_median": round(med_mevs, 1),
        "vs_baseline_median": round(med_mevs / torch_mevs, 2),
        "voxel_kernel": best_prec,
        "roofline_mevs": roofline_mevs[best_prec],
        "roofline_frac": round(roofline_frac, 3),
        "roofline_frac_median": round(roofline_frac_median, 3),
        **tiled_fields,
        **cmax_fields,
        **secondary_fields,
    }))


if __name__ == "__main__":
    main()
