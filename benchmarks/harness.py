"""Trustworthy on-device benchmarking.

Timing through the axon TPU tunnel is treacherous: per-call host timing
includes ~40 ms transfer latency, and the runtime caches whole executions
keyed on (executable, input buffers), so repeated calls on the same arrays
return instantly without computing. This harness sidesteps both:

- the benchmarked function runs inside one compiled ``lax.scan`` loop,
- every iteration's inputs are generated **on device** from a fold_in of a
  seed that is a runtime argument (so nothing can be constant-folded or
  execution-cached),
- the only host transfer is one checksum scalar,
- data-generation cost is measured separately and subtracted.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def make_event_batch(key, n, sensor_size, t_max: float = 0.1):
    """Random sorted event batch generated on device."""
    H, W = sensor_size
    kx, ky, kt, kp = jax.random.split(key, 4)
    xs = jax.random.randint(kx, (n,), 0, W, dtype=jnp.int32)
    ys = jax.random.randint(ky, (n,), 0, H, dtype=jnp.int32)
    # sorted timestamps by construction: normalized cumsum of positive steps
    steps = jax.random.uniform(kt, (n,), minval=0.01, maxval=1.0)
    cs = jnp.cumsum(steps)
    ts = cs / cs[-1] * t_max
    ps = jax.random.rademacher(kp, (n,), dtype=jnp.int32).astype(jnp.float32)
    return xs, ys, ts, ps


def time_device_loop(fn: Callable, n: int, sensor_size, iters: int = 10,
                     warmup: bool = True, seed: int = 0) -> float:
    """Seconds per call of ``fn(xs, ys, ts, ps)``, data-generation subtracted.

    ``fn`` must return an array; its squared sum feeds the checksum.
    """

    def build(loop_body):
        @jax.jit
        def loop(seed_scalar):
            key0 = jax.random.PRNGKey(seed_scalar)

            def body(c, i):
                batch = make_event_batch(jax.random.fold_in(key0, i), n,
                                         sensor_size)
                return c + loop_body(batch), None

            c, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return c

        return loop

    full = build(lambda b: jnp.sum(jnp.square(fn(*b))))
    base = build(lambda b: jnp.sum(b[2]) + jnp.sum(b[3] * b[0] * b[1]))

    def run(loop, s):
        # NB: the axon runtime defers execution until a host transfer forces
        # a flush — block_until_ready alone can return before the work runs.
        # float() forces the flush on both the warmup and the timed call; the
        # base loop measurement absorbs the transfer round-trip latency.
        if warmup:
            float(loop(jnp.int32(s)))
        t0 = time.perf_counter()
        float(loop(jnp.int32(s + 1)))
        return (time.perf_counter() - t0) / iters

    t_full = run(full, seed)
    t_base = run(base, seed + 100)
    return max(t_full - t_base, 1e-9)


def throughput_mevs(fn, n, sensor_size, iters: int = 10, seed: int = 0):
    """Events/second (in Mev/s) of ``fn(xs, ys, ts, ps)``."""
    sec = time_device_loop(fn, n, sensor_size, iters=iters, seed=seed)
    return n / sec / 1e6
