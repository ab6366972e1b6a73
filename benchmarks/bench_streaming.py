"""Streaming-pipeline benchmark (BASELINE config 5 shape): memmap dir ->
native loader -> device prefetch -> batched voxel grids on TPU.

Measures end-to-end ingest throughput (events/second arriving on device as
finished voxel grids), the number a training loop actually experiences.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, B = 180, 240, 5
N_EVENTS = 8_000_000
K = 30_000
BATCH = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from event_utils_tpu.data_formats import memmap_packager
    from event_utils_tpu.data_loaders import (NativeWindowedLoader,
                                              device_prefetch)
    from event_utils_tpu.ops.pallas_scatter import voxel_matmul

    # synth memmap recording
    root = "/tmp/bench_stream_mm"
    if not os.path.exists(os.path.join(root, "t.npy")):
        rng = np.random.default_rng(0)
        mp = memmap_packager(root)
        mp.package_events(rng.integers(0, W, N_EVENTS),
                          rng.integers(0, H, N_EVENTS),
                          np.sort(rng.uniform(0, 10.0, N_EVENTS)),
                          rng.choice([-1.0, 1.0], N_EVENTS))
        mp.add_metadata(N_EVENTS, 0, 0, 10.0, 0, 10.0, 0, 0,
                        sensor_size=(H, W))
        log(f"wrote synth memmap ({N_EVENTS} events)")

    loader = NativeWindowedLoader(root, method="k_events", k=K,
                                  batch_size=BATCH, nthreads=8)
    voxelize = jax.jit(jax.vmap(
        lambda ev, m: voxel_matmul(ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3],
                                   B, (H, W), mask=m)))

    def run_epoch():
        n_events = 0
        checksum = 0.0
        for batch in device_prefetch(loader, prefetch_depth=2):
            vox = voxelize(jnp.asarray(batch["events"]),
                           jnp.asarray(batch["events_mask"]))
            checksum += float(jnp.sum(vox[0, 0, 0]))  # forces execution
            n_events += int(batch["events_mask"].sum())
        return n_events, checksum

    run_epoch()  # warmup/compile
    t0 = time.perf_counter()
    n_events, chk = run_epoch()
    el = time.perf_counter() - t0
    mevs = n_events / el / 1e6
    log(f"streamed {n_events} events in {el:.2f}s (chk {chk:.1f})")

    # component rates: host assembly alone, and the transfer ceiling.
    t0 = time.perf_counter()
    n_host = 0
    for batch in loader:
        n_host += int(batch["events_mask"].sum())
    host_mevs = n_host / (time.perf_counter() - t0) / 1e6
    payload = None
    for batch in loader:
        payload = batch["events"].nbytes + batch["events_mask"].nbytes
        break
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(batch["events"]))
    xfer_mbs = payload / (time.perf_counter() - t0) / 1e6
    log(f"host assembly alone: {host_mevs:.0f} Mev/s; "
        f"host->device link: {xfer_mbs:.0f} MB/s "
        f"(under the axon tunnel this link bounds the pipeline; on a local "
        f"TPU host it runs at PCIe rates)")

    print(json.dumps({
        "metric": "streaming_voxel_pipeline_throughput",
        "value": round(mevs, 1),
        "unit": "Mev/s",
        "vs_baseline": None,
        "host_assembly_mevs": round(host_mevs, 1),
        "host_device_link_mbs": round(xfer_mbs, 1),
    }))


if __name__ == "__main__":
    main()
