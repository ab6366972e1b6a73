"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the JAX-idiomatic fake-mesh recipe). Must run
before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Silence XLA:CPU AOT-loader feature-string chatter when reloading persistent
# cache entries (formatting-only mismatch on the same machine).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Some pytest plugins (jaxtyping) import jax before conftest runs, so the env
# vars above can come too late; jax.config still works until a backend
# initializes, so force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the fast CI lane is compile-dominated
# (e.g. the EVFlowNet forward smoke is ~11 s cold vs ~1.4 s warm, verified
# bit-identical outputs), and CI re-runs identical programs every time.
# The cache lives OUTSIDE the repo and is keyed on program + jax/XLA
# version, so upgrades recompile automatically. Opt out with
# EVENT_UTILS_TPU_TEST_CACHE=0 (e.g. when bisecting compiler issues).
# NB keep this a single-process cache consumer: concurrent jax processes
# sharing one cache dir have deadlocked on the file lock before.
if os.environ.get("EVENT_UTILS_TPU_TEST_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "EVENT_UTILS_TPU_TEST_CACHE_DIR",
        os.path.expanduser("~/.cache/event_utils_tpu_test_xla"))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 0.1 s threshold: the lane's cost is ~300 small compiles, not a few
    # big ones — caching the mid-size tier too cut the measured lane
    # from 312 s to 265 s warm on this box
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_events(rng, n=2000, sensor=(180, 240), int_coords=True, t_max=0.5):
    """Random test event stream (sorted timestamps)."""
    H, W = sensor
    if int_coords:
        xs = rng.integers(0, W, n).astype(np.int64)
        ys = rng.integers(0, H, n).astype(np.int64)
    else:
        xs = rng.uniform(0, W - 1, n)
        ys = rng.uniform(0, H - 1, n)
    ts = np.sort(rng.uniform(0, t_max, n))
    ps = rng.choice(np.array([-1.0, 1.0]), n)
    return xs, ys, ts, ps


@pytest.fixture
def events(rng):
    return make_events(rng)


@pytest.fixture
def float_events(rng):
    return make_events(rng, int_coords=False)
