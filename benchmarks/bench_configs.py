"""All five BASELINE.json measurement configs, reference-vs-ours, one JSON.

BASELINE.md's first milestone asks for actual numeric baseline rows for the
five workload configs. No real datasets are mounted in this environment, so
each config runs on a synthetic stand-in with the same shape of workload
(slider_depth-like translating scene / dynamic_rotation-like rotating
scene); the *reference side is the actual reference code* (imported from
/root/reference) wherever it is importable.

Run: python benchmarks/bench_configs.py   (rows to stderr, JSON to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = "/root/reference"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

H, W, B = 180, 240, 5
N = 1 << 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slider_scene(rng, n=N, t_max=0.5):
    """Translating textured scene (slider_depth-like: uniform camera
    motion over static geometry)."""
    n_pts = 600
    px = rng.uniform(5, W - 45, n_pts)
    py = rng.uniform(5, H - 25, n_pts)
    pol = rng.choice([-1.0, 1.0], n_pts)
    vx, vy = 70.0, 30.0
    idx = rng.integers(0, n_pts, n)
    ts = np.sort(rng.uniform(0, t_max, n))
    xs = px[idx] + vx * ts + rng.normal(0, 0.3, n)
    ys = py[idx] + vy * ts + rng.normal(0, 0.3, n)
    keep = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    return (xs[keep], ys[keep], ts[keep], pol[idx][keep])


def timed(fn, reps=3, warmup=True):
    if warmup:
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    return (time.perf_counter() - t0) / reps, out


def config1_voxel(xs, ys, ts, ps):
    """slider-like 5-bin voxel: reference torch CPU vs Pallas MXU."""
    import torch
    from lib.representations.voxel_grid import events_to_voxel_torch
    from harness import throughput_mevs
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul

    tx = torch.from_numpy(np.floor(xs)).long()
    ty = torch.from_numpy(np.floor(ys)).long()
    tt = torch.from_numpy(ts).float()
    tp = torch.from_numpy(ps).float()
    sec, _ = timed(lambda: events_to_voxel_torch(tx, ty, tt, tp, B,
                                                 sensor_size=(H, W)))
    ref = len(xs) / sec / 1e6
    # time-derived seed: the axon runtime caches executions on (program,
    # input buffers) ACROSS processes — a reused seed can return a cached
    # result in ~0 time
    ours = throughput_mevs(lambda x, y, t, p: voxel_matmul(
        x, y, t, p, B, (H, W), precision="hilo"), N, (H, W), iters=8,
        seed=int(time.time() * 1000) % (1 << 20))
    log(f"[1] voxel: reference {ref:.1f} Mev/s -> ours {ours:.0f} Mev/s "
        f"({ours / ref:.0f}x)")
    return {"config": "slider voxel 5-bin", "reference_mevs": round(ref, 1),
            "ours_mevs": round(ours, 1), "speedup": round(ours / ref, 1)}


def config2_images(xs, ys, ts, ps):
    """event image + timestamp image with polarity channels."""
    import torch
    from lib.representations.image import (events_to_image_torch,
                                           events_to_timestamp_image)
    from harness import throughput_mevs
    from event_utils_tpu.representations.image import (
        events_to_timestamp_image as ours_ts_image)
    from event_utils_tpu.ops.pallas_scatter import bilinear_matmul

    tx = torch.from_numpy(xs).float()
    ty = torch.from_numpy(ys).float()
    tp = torch.from_numpy(ps).float()
    sec_img, _ = timed(lambda: events_to_image_torch(
        tx, ty, tp, sensor_size=(H, W), clip_out_of_range=True,
        interpolation="bilinear", padding=True))
    ref_img = len(xs) / sec_img / 1e6

    def runs_capped(fn, n, iters, cap, label, want=3):
        """Up to ``want`` plausible runs: the K=1 image kernel is fast
        enough that the harness's base-loop subtraction is noise-limited
        (a run above 1.15x the FLOP roofline is an artifact — observed
        1459-1798 Mev/s against a 700 bound); drop and retry."""
        out, attempts = [], 0
        while len(out) < want and attempts < want + 3:
            r = throughput_mevs(fn, n, (H, W), iters=iters,
                                seed=int(time.time() * 1000) % (1 << 20)
                                + 31 * attempts)
            attempts += 1
            if r <= 1.15 * cap:
                out.append(r)
            else:
                log(f"[2] {label}: dropped implausible run {r:.0f} Mev/s "
                    "(harness subtraction artifact)")
        return out or [float("nan")]

    img_roof, ts_roof = 700.0, 175.0
    # 2M events x 16 iters: keep kernel time >> tunnel timing noise for
    # the fast K=1 kernel
    img_runs = runs_capped(
        lambda x, y, t, p: bilinear_matmul(x.astype(np.float32) + 0.3,
                                           y.astype(np.float32) + 0.2,
                                           p, (H + 1, W + 1)),
        N * 2, 16, img_roof, "event image")

    sec_ts, _ = timed(lambda: events_to_timestamp_image(
        xs, ys, ts, ps, sensor_size=(H, W)))
    ref_ts = len(xs) / sec_ts / 1e6

    def ts_img(x, y, t, p):
        pos, neg = ours_ts_image(x.astype(np.float32), y.astype(np.float32),
                                 t, p, sensor_size=(H, W), impl="matmul")
        return pos + neg

    ts_runs = runs_capped(ts_img, N, 8, ts_roof, "timestamp image")
    # Roofline invariants (v5e bf16 peak ~197 TFLOP/s): both rows are the
    # SAME hilo one-hot matmul as the voxel kernel — 3 matmuls/chunk of
    # (HP=184, C) x (C, WP=256) per channel: the (181, 241) padded event
    # image rounds to the identical (184, 256) operand tile as (180, 240).
    # K=1 event image -> ~700 Mev/s bound; K=4 timestamp image -> 700/4 =
    # 175 Mev/s. Read cross-round numbers against these fractions — session
    # noise moves Mev/s, the FLOP bound doesn't.
    ours_img, img_med = max(img_runs), float(np.median(img_runs))
    ours_ts, ts_med = max(ts_runs), float(np.median(ts_runs))
    log(f"[2] event image: reference {ref_img:.1f} -> ours {ours_img:.0f} "
        f"Mev/s best / {img_med:.0f} median ({ours_img / ref_img:.0f}x; "
        f"{ours_img / img_roof:.0%}/{img_med / img_roof:.0%} of the "
        f"{img_roof:.0f} Mev/s roofline); timestamp image: "
        f"{ref_ts:.1f} -> {ours_ts:.0f} best / {ts_med:.0f} median Mev/s "
        f"({ours_ts / ref_ts:.0f}x; {ours_ts / ts_roof:.0%}/"
        f"{ts_med / ts_roof:.0%} of the {ts_roof:.0f} Mev/s roofline)")
    return {"config": "event+timestamp images",
            "reference_mevs": [round(ref_img, 1), round(ref_ts, 1)],
            "ours_mevs": [round(ours_img, 1), round(ours_ts, 1)],
            "ours_mevs_median": [round(img_med, 1), round(ts_med, 1)],
            "roofline_mevs": [img_roof, ts_roof],
            "roofline_frac": [round(ours_img / img_roof, 3),
                              round(ours_ts / ts_roof, 3)],
            "roofline_frac_median": [round(img_med / img_roof, 3),
                                     round(ts_med / ts_roof, 3)],
            "speedup": [round(ours_img / ref_img, 1),
                        round(ours_ts / ref_ts, 1)]}


def config3_augmentation(xs, ys, ts, ps):
    """2x densify sweep (add_correlated_events)."""
    import types

    # reference module pulls plot_events -> skimage (absent); drop it
    path = os.path.join(REF_ROOT, "lib/augmentation/event_augmentation.py")
    with open(path) as f:
        src = f.read().replace(
            "from lib.visualization.draw_event_stream import plot_events", "")
    ref = types.ModuleType("ref_augmentation")
    ref.__package__ = "lib.augmentation"
    exec(compile(src, path, "exec"), ref.__dict__)

    from event_utils_tpu.augmentation.event_augmentation import (
        add_correlated_events)

    n = len(xs)
    sec_ref, _ = timed(lambda: ref.add_correlated_events(xs, ys, ts, ps, n),
                       reps=2)
    sec_ours, _ = timed(lambda: add_correlated_events(xs, ys, ts, ps, n),
                        reps=2)
    ref_mevs = n / sec_ref / 1e6
    ours_mevs = n / sec_ours / 1e6

    # device path: the jitter core of densify as a jitted kernel (the
    # capacity-preserving variant training pipelines use)
    import jax
    import jax.numpy as jnp

    from event_utils_tpu.augmentation.event_augmentation import (
        jitter_events_jax)

    from harness import throughput_mevs

    from event_utils_tpu.augmentation.event_augmentation import (
        add_correlated_events_jax)

    def densify_device(dx, dy, dt, dp):
        ox, oy, ot, op, om = add_correlated_events_jax(
            jax.random.PRNGKey(0), dx, dy, dt, dp, sort=False)
        return ot * om + ox + oy
    dev_mevs = throughput_mevs(densify_device, N, (H, W), iters=8,
                               seed=int(time.time() * 1000) % (1 << 20))
    # The unsorted variant is cheaper than the harness's base loop: the
    # subtraction floors at ~0 and the rate is a harness artifact, not a
    # measurement. Report n/a above a generous plausibility bound instead
    # of printing an absurd number.
    dev_unsorted = round(dev_mevs, 1) if dev_mevs < 1e5 else None

    def densify_device_sorted(dx, dy, dt, dp):
        ox, oy, ot, op, om = add_correlated_events_jax(
            jax.random.PRNGKey(0), dx, dy, dt, dp, sort=True)
        return ot * om
    # plausibility cap (no clean FLOP roofline for a sort; the packed
    # 2-operand sort measures ~230-310 Mev/s on v5e-1 — a 1500+ run is the
    # same base-loop subtraction artifact the image rows guard against)
    sorted_runs, attempts = [], 0
    while len(sorted_runs) < 3 and attempts < 6:
        r = throughput_mevs(
            densify_device_sorted, N, (H, W), iters=8,
            seed=int(time.time() * 1000) % (1 << 20) + 31 * attempts)
        attempts += 1
        if r <= 1500.0:
            sorted_runs.append(r)
        else:
            log(f"[3] sorted densify: dropped implausible run {r:.0f} Mev/s")
    sorted_runs = sorted_runs or [float("nan")]
    dev_sorted = max(sorted_runs)
    dev_sorted_med = float(np.median(sorted_runs))

    unsorted_str = (f"{dev_unsorted:.0f} Mev/s" if dev_unsorted is not None
                    else "n/a (below harness floor)")
    log(f"[3] 2x densify: reference {ref_mevs:.1f} -> ours host "
        f"{ours_mevs:.1f} Mev/s ({ours_mevs / ref_mevs:.1f}x); device "
        f"{unsorted_str} unsorted / {dev_sorted:.0f} best, "
        f"{dev_sorted_med:.0f} median Mev/s sorted")
    return {"config": "augmentation 2x densify",
            "reference_mevs": round(ref_mevs, 1),
            "ours_mevs": round(ours_mevs, 1),
            "ours_device_mevs": dev_unsorted,
            "ours_device_sorted_mevs": round(dev_sorted, 1),
            "ours_device_sorted_mevs_median": round(dev_sorted_med, 1),
            "speedup": round(ours_mevs / ref_mevs, 1)}


def config4_grid_cmax():
    """dynamic_rotation-like grid_cmax (delegates to bench_cmax scene)."""
    from bench_cmax import ROI, make_scene, reference_grid_cmax
    from event_utils_tpu.contrast_max import grid_cmax_batched

    xs, ys, ts, ps = make_scene()
    n_sample = 4
    t0 = time.perf_counter()
    reference_grid_cmax(xs, ys, ts, ps, max_rois=n_sample)
    per_roi = (time.perf_counter() - t0) / n_sample
    total = (180 // ROI[0]) * (240 // ROI[1])
    ref_s = per_roi * total
    cap = 2048
    # whole-ROI-width shift: per-ROI counts exactly permuted, so the
    # overflow-refine tier's batch shape is identical and the timed call
    # cannot recompile (see bench_cmax.py)
    np.asarray(grid_cmax_batched((xs + ROI[1]) % 240, ys, ts, ps,
                                 roi_size=ROI, img_size=(180, 240),
                                 maxiter=30, capacity=cap)[0])
    t0 = time.perf_counter()
    np.asarray(grid_cmax_batched(xs, ys, ts, ps, roi_size=ROI,
                                 img_size=(180, 240), maxiter=30,
                                 capacity=cap)[0])
    ours_s = time.perf_counter() - t0
    log(f"[4] grid_cmax: reference {ref_s:.1f} s -> ours {ours_s:.2f} s "
        f"({ref_s / ours_s:.0f}x)")
    return {"config": "grid_cmax 108 ROIs", "reference_s": round(ref_s, 1),
            "ours_s": round(ours_s, 2), "speedup": round(ref_s / ours_s, 1)}


def config5_streaming(tmpdir):
    """Streaming voxel-batch loader (MVSEC-like shape): reference-style
    per-window h5py slicing vs the native loaders."""
    import h5py

    from event_utils_tpu.data_loaders.native_loader import (
        H5WindowedLoader, NativeWindowedLoader)

    rng = np.random.default_rng(7)
    n = 4 << 20
    t = np.sort(rng.uniform(0, 10, n))
    xs = rng.integers(0, W, n).astype(np.int16)
    ys = rng.integers(0, H, n).astype(np.int16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    h5p = os.path.join(tmpdir, "stream.h5")
    with h5py.File(h5p, "w") as f:
        g = f.create_group("events")
        for name, arr in (("xs", xs), ("ys", ys), ("ts", t),
                          ("ps", p.astype(bool))):
            g.create_dataset(name, data=arr, chunks=(1 << 18,))
    mmd = os.path.join(tmpdir, "mm")
    os.makedirs(mmd, exist_ok=True)
    np.save(os.path.join(mmd, "t.npy"), t[:, None])
    np.save(os.path.join(mmd, "xy.npy"), np.stack([xs, ys], axis=1))
    np.save(os.path.join(mmd, "p.npy"), p[:, None])

    k, bs = 16384, 8

    def reference_style():
        # the reference's loader reads each window as 4 h5 slices through
        # Python and converts polarities per window (hdf5_dataset.py:18-23)
        with h5py.File(h5p, "r") as f:
            ev = f["events"]
            count = 0
            for s in range(0, n - k + 1, k):
                wx = ev["xs"][s:s + k].astype(np.float32)
                wy = ev["ys"][s:s + k].astype(np.float32)
                wt = ev["ts"][s:s + k]
                wp = ev["ps"][s:s + k].astype(np.float32) * 2 - 1
                count += len(wx)
        return count

    sec_ref, count = timed(reference_style, reps=1)
    ref_mevs = count / sec_ref / 1e6

    out = {}
    out_med = {}
    for name, ld in (("h5", H5WindowedLoader(h5p, method="k_events", k=k,
                                             batch_size=bs, capacity=k)),
                     ("memmap", NativeWindowedLoader(mmd, method="k_events",
                                                     k=k, batch_size=bs,
                                                     capacity=k))):
        for _ in ld:
            pass
        rates = []
        for _r in range(3):
            t0 = time.perf_counter()
            cnt = 0
            for b in ld:
                cnt += int(b["events_mask"].sum())
            rates.append(cnt / (time.perf_counter() - t0) / 1e6)
        out[name] = max(rates)
        out_med[name] = float(np.median(rates))
    log(f"[5] streaming loader: reference-style {ref_mevs:.0f} -> "
        f"h5 {out['h5']:.0f} best/{out_med['h5']:.0f} med / memmap "
        f"{out['memmap']:.0f} best/{out_med['memmap']:.0f} med Mev/s")
    return {"config": "streaming loader",
            "reference_mevs": round(ref_mevs, 1),
            "ours_mevs": {k2: round(v, 1) for k2, v in out.items()},
            "ours_mevs_median": {k2: round(v, 1)
                                 for k2, v in out_med.items()},
            "speedup": round(out["memmap"] / ref_mevs, 1)}


def main():
    import tempfile

    rng = np.random.default_rng(0)
    xs, ys, ts, ps = slider_scene(rng)
    log(f"slider-like scene: {len(xs)} events")
    rows = [config1_voxel(xs, ys, ts, ps),
            config2_images(xs, ys, ts, ps),
            config3_augmentation(xs, ys, ts, ps),
            config4_grid_cmax(),
            config5_streaming(tempfile.mkdtemp())]
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
