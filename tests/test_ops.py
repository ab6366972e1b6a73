"""Kernel tests: golden values, numpy-oracle properties, gradients, blur."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_utils_tpu.ops import (
    bilinear_gather, bilinear_scatter, bilinear_scatter_derivative,
    gaussian_filter, scatter_add_2d, scatter_add_flat,
)
from oracles import np_bilinear_scatter, np_integer_scatter, np_jacobian_scatter


# ---------------------------------------------------------------------------
# Golden values (hand-computed)
# ---------------------------------------------------------------------------

def test_bilinear_scatter_golden():
    # One event at (0.5, 0.5), w=1 on 3x3: 0.25 in each of the 4 corners.
    img = bilinear_scatter(jnp.array([0.5]), jnp.array([0.5]),
                           jnp.array([1.0]), (3, 3))
    expected = np.array([[0.25, 0.25, 0], [0.25, 0.25, 0], [0, 0, 0]])
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-7)


def test_bilinear_scatter_integer_coord_golden():
    # Integer coordinate: all weight on that pixel.
    img = bilinear_scatter(jnp.array([2.0]), jnp.array([1.0]),
                           jnp.array([3.0]), (3, 3))
    expected = np.zeros((3, 3))
    expected[1, 2] = 3.0
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-7)


def test_bilinear_scatter_asymmetric_golden():
    # Event at (1.25, 0.75): dx=0.25, dy=0.75.
    img = bilinear_scatter(jnp.array([1.25]), jnp.array([0.75]),
                           jnp.array([1.0]), (3, 3))
    expected = np.zeros((3, 3))
    expected[0, 1] = 0.75 * 0.25
    expected[0, 2] = 0.25 * 0.25
    expected[1, 1] = 0.75 * 0.75
    expected[1, 2] = 0.25 * 0.75
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-7)


def test_scatter_add_flat_drops_out_of_range():
    out = scatter_add_flat(jnp.array([0, 5, -1, 2, 2]),
                           jnp.array([1.0, 1.0, 1.0, 2.0, 3.0]), 4)
    np.testing.assert_allclose(np.asarray(out), [1, 0, 5, 0])


def test_integer_scatter_truncates_like_torch_long():
    # torch .long() truncates toward zero (image.py:89).
    img = scatter_add_2d(jnp.array([1.9, 0.2]), jnp.array([0.9, 1.99]),
                         jnp.array([1.0, 2.0]), (3, 3))
    expected = np.zeros((3, 3))
    expected[0, 1] = 1.0
    expected[1, 0] = 2.0
    np.testing.assert_allclose(np.asarray(img), expected)


# ---------------------------------------------------------------------------
# Numpy-oracle property tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("impl", ["xla", "sort"])
def test_bilinear_scatter_matches_oracle(rng, impl):
    n, shape = 5000, (37, 53)
    x = rng.uniform(-2, shape[1] + 2, n)
    y = rng.uniform(-2, shape[0] + 2, n)
    w = rng.normal(size=n)
    got = bilinear_scatter(jnp.array(x, jnp.float32), jnp.array(y, jnp.float32),
                           jnp.array(w, jnp.float32), shape, impl=impl)
    want = np_bilinear_scatter(x.astype(np.float32), y.astype(np.float32),
                               w.astype(np.float32), shape)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


@pytest.mark.parametrize("impl", ["xla", "sort"])
def test_integer_scatter_matches_oracle(rng, impl):
    n, shape = 5000, (37, 53)
    x = rng.uniform(-2, shape[1] + 2, n)
    y = rng.uniform(-2, shape[0] + 2, n)
    w = rng.normal(size=n)
    got = scatter_add_2d(jnp.array(x), jnp.array(y), jnp.array(w, jnp.float32),
                         shape, impl=impl)
    want = np_integer_scatter(x, y, w, shape)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_jacobian_scatter_matches_oracle(rng):
    n, shape = 2000, (21, 31)
    x = rng.uniform(0, shape[1] - 1, n)
    y = rng.uniform(0, shape[0] - 1, n)
    w = rng.normal(size=n)
    jx = rng.normal(size=(2, n))
    jy = rng.normal(size=(2, n))
    got = bilinear_scatter_derivative(
        jnp.array(x, jnp.float32), jnp.array(y, jnp.float32),
        jnp.array(jx, jnp.float32), jnp.array(jy, jnp.float32),
        jnp.array(w, jnp.float32), shape)
    want = np_jacobian_scatter(x.astype(np.float32), y.astype(np.float32),
                               jx.astype(np.float32), jy.astype(np.float32),
                               w.astype(np.float32), shape)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_mask_drops_events(rng):
    n, shape = 100, (11, 13)
    x = rng.uniform(0, shape[1] - 1, n).astype(np.float32)
    y = rng.uniform(0, shape[0] - 1, n).astype(np.float32)
    w = rng.normal(size=n).astype(np.float32)
    mask = (rng.uniform(size=n) > 0.5)
    got = bilinear_scatter(jnp.array(x), jnp.array(y), jnp.array(w), shape,
                           mask=jnp.array(mask))
    want = np_bilinear_scatter(x[mask], y[mask], w[mask], shape)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------

def test_bilinear_gather_golden():
    img = jnp.arange(9.0).reshape(3, 3)
    # (x=0.5, y=0.5): mean of 0,1,3,4 = 2.0
    v = bilinear_gather(jnp.array([0.5]), jnp.array([0.5]), img)
    np.testing.assert_allclose(np.asarray(v), [2.0], atol=1e-6)


def test_gather_is_adjoint_of_scatter(rng):
    """<scatter(x,y,w), g> == <w, gather(x,y,g)> — the VJP identity."""
    n, shape = 500, (17, 19)
    x = jnp.array(rng.uniform(0, shape[1] - 1, n), jnp.float32)
    y = jnp.array(rng.uniform(0, shape[0] - 1, n), jnp.float32)
    w = jnp.array(rng.normal(size=n), jnp.float32)
    g = jnp.array(rng.normal(size=shape), jnp.float32)
    lhs = jnp.sum(bilinear_scatter(x, y, w, shape) * g)
    rhs = jnp.sum(w * bilinear_gather(x, y, g))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


# ---------------------------------------------------------------------------
# Differentiability
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_scatter_gradient_finite_difference(rng):
    """d/dvx of a variance-of-IWE style loss matches finite differences.

    Run in float64 with a tiny step: the bilinear splat is C0 with derivative
    kinks at cell boundaries, so a float32-sized step straddles kinks.
    """
    jax.config.update("jax_enable_x64", True)
    try:
        n, shape = 300, (15, 15)
        x = jnp.array(rng.uniform(1, shape[1] - 2, n), jnp.float64)
        y = jnp.array(rng.uniform(1, shape[0] - 2, n), jnp.float64)
        w = jnp.array(rng.choice([-1.0, 1.0], n), jnp.float64)
        t = jnp.array(np.sort(rng.uniform(0, 1, n)), jnp.float64)

        def loss(v):
            img = bilinear_scatter(x - t * v[0], y - t * v[1], w, shape)
            return jnp.var(img)

        v0 = jnp.array([0.3, -0.2], jnp.float64)
        g = jax.grad(loss)(v0)
        eps = 1e-6
        for d in range(2):
            e = jnp.zeros(2, jnp.float64).at[d].set(eps)
            fd = (loss(v0 + e) - loss(v0 - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[d]), float(fd), rtol=1e-4, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_scatter_grad_w_is_gather(rng):
    n, shape = 200, (9, 9)
    x = jnp.array(rng.uniform(0, 7.5, n), jnp.float32)
    y = jnp.array(rng.uniform(0, 7.5, n), jnp.float32)
    w = jnp.array(rng.normal(size=n), jnp.float32)
    g_img = jnp.array(rng.normal(size=shape), jnp.float32)
    grad_w = jax.grad(lambda ww: jnp.sum(bilinear_scatter(x, y, ww, shape) * g_img))(w)
    np.testing.assert_allclose(np.asarray(grad_w),
                               np.asarray(bilinear_gather(x, y, g_img)),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Determinism
# ---------------------------------------------------------------------------

def test_scatter_determinism(rng):
    n, shape = 20000, (50, 60)
    # Heavy collisions: all events in a 4x4 region.
    x = jnp.array(rng.uniform(0, 4, n), jnp.float32)
    y = jnp.array(rng.uniform(0, 4, n), jnp.float32)
    w = jnp.array(rng.normal(size=n), jnp.float32)
    a = np.asarray(bilinear_scatter(x, y, w, shape))
    b = np.asarray(bilinear_scatter(x, y, w, shape))
    assert (a == b).all(), "scatter-add must be bitwise deterministic"


# ---------------------------------------------------------------------------
# Gaussian blur vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sigma", [0.5, 1.0, 2.0, 3.0])
def test_gaussian_filter_matches_scipy_2d(rng, sigma):
    from scipy.ndimage import gaussian_filter as sp_gaussian
    x = rng.normal(size=(45, 67)).astype(np.float32)
    got = np.asarray(gaussian_filter(jnp.array(x), sigma))
    want = sp_gaussian(x, sigma)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gaussian_filter_matches_scipy_3d_small_axis(rng):
    """The reference blurs (2, H, W) dIWE stacks across ALL axes
    (objectives.py:253) — including the 2-element param axis."""
    from scipy.ndimage import gaussian_filter as sp_gaussian
    x = rng.normal(size=(2, 21, 23)).astype(np.float32)
    got = np.asarray(gaussian_filter(jnp.array(x), 1.0))
    want = sp_gaussian(x, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gaussian_filter_axes_subset(rng):
    from scipy.ndimage import gaussian_filter as sp_gaussian
    x = rng.normal(size=(2, 21, 23)).astype(np.float32)
    got = np.asarray(gaussian_filter(jnp.array(x), 1.5, axes=(-2, -1)))
    want = np.stack([sp_gaussian(x[i], 1.5) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_remove_hot_pixels(rng):
    from event_utils_tpu.utils import remove_hot_pixels
    n = 2000
    xs = rng.integers(0, 32, n).astype(float)
    ys = rng.integers(0, 24, n).astype(float)
    xs[:500] = 5.0  # hot pixel at (5, 7)
    ys[:500] = 7.0
    ts = np.sort(rng.uniform(0, 1, n))
    ps = np.ones(n)
    nx, ny, nt, np_ = remove_hot_pixels(xs, ys, ts, ps, sensor_size=(24, 32),
                                        num_hot=1)
    assert not ((nx == 5) & (ny == 7)).any()
    assert len(nx) <= n - 500  # random events may also hit the hot pixel


def test_get_events_from_mask(rng):
    from event_utils_tpu.utils import get_events_from_mask
    mask = np.zeros((10, 10))
    mask[3, 4] = 1.0
    xs = np.array([4.0, 5.0, 4.0])
    ys = np.array([3.0, 3.0, 6.0])
    idx = get_events_from_mask(mask, xs, ys)
    assert np.atleast_1d(idx).tolist() == [0]


def test_scatter_add_flat_rejects_unknown_impl():
    """Unknown impl strings raise instead of silently using the XLA path."""
    idx = jnp.zeros(4, jnp.int32)
    w = jnp.ones(4, jnp.float32)
    with pytest.raises(ValueError, match="impl"):
        scatter_add_flat(idx, w, 8, impl="matmul")
    with pytest.raises(ValueError, match="impl"):
        scatter_add_flat(idx, w, 8, impl="nope")


def test_matmul_impl_precision_unified(rng):
    """'matmul' means the hi/lo (~1e-5) path at EVERY entry point; bf16 is the
    explicit 'matmul_bf16' opt-in (ADVICE r1)."""
    n = 2000
    x = jnp.asarray(rng.uniform(0, 99, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 79, n), jnp.float32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    exact = np.asarray(bilinear_scatter(x, y, w, (80, 100)))
    scale = np.abs(exact).max()
    for fn in (bilinear_scatter,
               lambda *a, **k: scatter_add_2d(a[0], a[1], a[2], a[3], **k)):
        got_mm = np.asarray(fn(x, y, w, (80, 100), impl="matmul"))
        got_hl = np.asarray(fn(x, y, w, (80, 100), impl="matmul_hilo"))
        assert np.allclose(got_mm, got_hl), "matmul must alias matmul_hilo"
    rel = np.abs(np.asarray(bilinear_scatter(x, y, w, (80, 100), impl="matmul"))
                 - exact).max() / scale
    assert rel < 1e-4, rel


def test_bilinear_scatter_derivative_matmul_impl(rng):
    """impl='matmul' on the Jacobian scatter routes through the MXU flat
    scatter instead of raising (review r2); parity vs the exact path."""
    from event_utils_tpu.ops.scatter import bilinear_scatter_derivative
    n = 1500
    x = jnp.asarray(rng.uniform(-1, 100, n), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 80, n), jnp.float32)
    jx = jnp.asarray(rng.normal(0, 1, (2, n)), jnp.float32)
    jy = jnp.asarray(rng.normal(0, 1, (2, n)), jnp.float32)
    w = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
    exact = np.asarray(bilinear_scatter_derivative(x, y, jx, jy, w, (80, 100)))
    got = np.asarray(bilinear_scatter_derivative(x, y, jx, jy, w, (80, 100),
                                                 impl="matmul"))
    assert got.shape == exact.shape == (2, 80, 100)
    rel = np.abs(got - exact).max() / max(np.abs(exact).max(), 1e-9)
    assert rel < 1e-4, rel


def test_matmul_scan_formulation_parity(rng):
    """ops/matmul_scatter's pure-XLA scan formulation is an independent
    implementation of the same factorization — pin it to the exact scatter
    so it cannot silently drift (review r2: it had no coverage)."""
    from event_utils_tpu.ops.matmul_scatter import bilinear_scatter_matmul
    n = 3000
    x = jnp.asarray(rng.uniform(-2, 101, n), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, 81, n), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    exact = np.asarray(bilinear_scatter(x, y, w, (80, 100)))
    scale = max(np.abs(exact).max(), 1e-9)
    # documented tolerance classes (matmul_scatter.py module docstring)
    got = np.asarray(bilinear_scatter_matmul(x, y, w, (80, 100)))
    assert np.abs(got - exact).max() / scale < 5e-3  # bf16 default ~1e-3
    got_hl = np.asarray(bilinear_scatter_matmul(x, y, w, (80, 100),
                                                precision="hilo"))
    assert np.abs(got_hl - exact).max() / scale < 5e-4  # hilo ~1e-4


def test_pallas_default_impl_vmem_fallback_no_recursion():
    """With the global default impl set to 'pallas', an oversized bucket
    grid must fall back to the exact scatter — impl=None in the fallback
    used to re-enter the pallas route (infinite mutual recursion)."""
    from event_utils_tpu.ops import scatter
    prev = scatter._DEFAULT_IMPL
    try:
        scatter.set_default_impl("pallas")
        idx = jnp.array([0, 5, 2_999_999], jnp.int32)
        w = jnp.ones(3, jnp.float32)
        out = scatter.scatter_add_flat(idx, w, 3_000_000)
        assert float(out[0]) == 1.0 and float(out[2_999_999]) == 1.0
    finally:
        scatter.set_default_impl(prev)


def test_gaussian_filter_integer_dtype_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter as sp_filter
    from event_utils_tpu.ops.blur import gaussian_filter
    img = rng.integers(0, 50, (24, 32)).astype(np.int32)
    ours = np.asarray(gaussian_filter(jnp.asarray(img), 1.5))
    ref = sp_filter(img, 1.5)
    assert ours.dtype == np.int32
    assert ours.sum() > 0  # the old kernel-cast bug returned all-zeros
    # Documented divergence: scipy truncates in the int domain PER AXIS;
    # we accumulate in float and round once (strictly better numerics),
    # so values can differ by the per-axis truncation (~2 counts).
    assert np.abs(ours - ref).max() <= 2


# ---------------------------------------------------------------------------
# nearly-sorted argsort (ops/sort.py)


def test_nearly_sorted_argsort_matches_global(rng):
    """Two-pass block argsort == stable global argsort for k-sorted inputs
    at exactly the guaranteed bound (block = 2*displacement), including
    duplicate keys and +inf tail pads."""
    from event_utils_tpu.ops.sort import nearly_sorted_argsort

    for n, block in [(1 << 12, 64), (3000, 128), (513, 32)]:
        base = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
        # displacement <= block//2 by construction: bounded perturbation
        # against the median spacing
        noise = rng.uniform(-1, 1, n).astype(np.float32)
        spacing = np.median(np.diff(base))
        keys = base + noise * spacing * (block // 4) * 0.5
        keys[-n // 50:] = np.inf  # masked pad slots at the tail
        got = np.asarray(nearly_sorted_argsort(jnp.asarray(keys), block))
        want = np.argsort(keys, kind="stable")
        srt = keys[got]
        assert np.all(srt[1:] >= srt[:-1])  # comparison: inf >= inf holds
        np.testing.assert_array_equal(srt, keys[want])
        # distinct finite keys (they sort ahead of the inf tail): the
        # permutation itself must match the stable global argsort
        n_fin = int(np.isfinite(keys).sum())
        np.testing.assert_array_equal(got[:n_fin], want[:n_fin])


def test_nearly_sorted_argsort_fallback_on_bad_bound(rng):
    """A block far below the true displacement trips the on-device check
    and falls back to the exact global argsort — output correct anyway."""
    from event_utils_tpu.ops.sort import nearly_sorted_argsort

    n = 4096
    keys = rng.uniform(0, 1, n).astype(np.float32)  # fully random: D ~ n
    got = np.asarray(nearly_sorted_argsort(jnp.asarray(keys), 32))
    np.testing.assert_array_equal(got, np.argsort(keys, kind="stable"))


def test_payload_sorts_match_argsort_gather(rng):
    """time_sort and nearly_sorted_sort permute payloads exactly like
    stable-argsort + gather (including the lax.cond fallback branch), in
    and out of jit."""
    import jax

    from event_utils_tpu.ops.sort import nearly_sorted_sort, time_sort

    n = 3000
    base = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    keys = base + rng.uniform(-1, 1, n).astype(np.float32) * 16 * \
        np.median(np.diff(base))
    pay_i = rng.integers(0, 240, n).astype(np.int32)
    pay_f = rng.normal(size=n).astype(np.float32)
    want = np.argsort(keys, kind="stable")

    for fn in (time_sort, jax.jit(time_sort)):
        k, a, b = fn(jnp.asarray(keys), jnp.asarray(pay_i),
                     jnp.asarray(pay_f))
        np.testing.assert_array_equal(np.asarray(k), keys[want])
        np.testing.assert_array_equal(np.asarray(a), pay_i[want])
        np.testing.assert_array_equal(np.asarray(b), pay_f[want])

    for block in (64, 128):  # 64 honors the bound above; both must be exact
        k, a, b = nearly_sorted_sort(jnp.asarray(keys), jnp.asarray(pay_i),
                                     jnp.asarray(pay_f), block=block)
        np.testing.assert_array_equal(np.asarray(k), keys[want])
        np.testing.assert_array_equal(np.asarray(a), pay_i[want])
        np.testing.assert_array_equal(np.asarray(b), pay_f[want])

    # violated bound -> on-device fallback, still exact
    rnd = rng.uniform(0, 1, 2048).astype(np.float32)
    w2 = np.argsort(rnd, kind="stable")
    k, a = nearly_sorted_sort(jnp.asarray(rnd),
                              jnp.asarray(np.arange(2048, dtype=np.int32)),
                              block=32)
    np.testing.assert_array_equal(np.asarray(a), w2)


def test_displacement_bound_and_block_pick(rng):
    """displacement_bound over-counts but bounds the true rank displacement
    of an interleaved jittered stream; sort_block_for yields a block the
    two-pass sort succeeds with (no fallback), verified by planting a
    sentinel that the fallback path would reorder identically anyway —
    so instead check the pass directly via a wrapped jit with cond trace."""
    from event_utils_tpu.ops.sort import (displacement_bound,
                                          nearly_sorted_argsort,
                                          sort_block_for)

    n = 20000
    ts = np.sort(rng.uniform(0, 0.25, n)).astype(np.float32)
    delta = 0.001 * 6
    jit_ts = ts + rng.normal(0, 0.001, n).astype(np.float32)
    inter = np.stack([ts, jit_ts], 1).reshape(-1)
    # true max displacement of the interleaved stream
    want = np.argsort(inter, kind="stable")
    pos = np.empty(2 * n, np.int64)
    pos[want] = np.arange(2 * n)
    true_d = np.abs(pos - np.arange(2 * n)).max()
    d = int(displacement_bound(jnp.asarray(ts), delta, copies=2))
    assert d >= true_d
    block = sort_block_for(jnp.asarray(ts), delta, copies=2)
    assert block is not None and block >= 2 * true_d
    got = np.asarray(nearly_sorted_argsort(jnp.asarray(inter), block))
    srt = inter[got]
    assert np.all(np.diff(srt) >= 0)
    np.testing.assert_array_equal(inter[got], inter[want])


def test_displacement_bound_ignores_inf_pad_tail(rng):
    """+inf pad sentinels (the masked-stream key convention) must not
    inflate the displacement bound: tail pads are already in place. The
    bound over [valid_ts, inf...] equals the bound over valid_ts alone."""
    from event_utils_tpu.ops.sort import displacement_bound, sort_block_for

    n = 4096
    ts = np.sort(rng.uniform(0, 0.5, n)).astype(np.float32)
    delta = 0.002
    d_clean = int(displacement_bound(jnp.asarray(ts), delta, copies=2))
    padded = np.concatenate([ts, np.full(n, np.inf, np.float32)])
    d_padded = int(displacement_bound(jnp.asarray(padded), delta, copies=2))
    assert d_padded == d_clean
    assert sort_block_for(jnp.asarray(padded), delta, copies=2) == \
        sort_block_for(jnp.asarray(ts), delta, copies=2)


def test_densify_auto_block_with_padded_mask(rng):
    """add_correlated_events_jax(sort_block='auto') on a padded stream
    (pad slots carry ts=0 at the tail — unsorted RAW timestamps): the
    bound must be computed on the masked keys, the output stays correctly
    time-sorted with pads at the tail."""
    from event_utils_tpu.augmentation.event_augmentation import \
        add_correlated_events_jax

    n_valid, cap = 3000, 4096
    ts = np.zeros(cap, np.float32)
    ts[:n_valid] = np.sort(rng.uniform(0, 0.3, n_valid)).astype(np.float32)
    xs = rng.uniform(0, 239, cap).astype(np.float32)
    ys = rng.uniform(0, 179, cap).astype(np.float32)
    ps = np.where(rng.uniform(size=cap) < 0.5, -1, 1).astype(np.float32)
    mask = (np.arange(cap) < n_valid).astype(np.float32)
    cx, cy, ct, cp, cm = add_correlated_events_jax(
        jax.random.PRNGKey(3), xs, ys, ts, ps, mask=mask,
        ts_std=0.0005, sort_block="auto")
    cm = np.asarray(cm)
    ct = np.asarray(ct)
    valid = cm != 0
    assert valid.sum() == 2 * n_valid
    # valid events sorted, pads at the tail
    assert np.all(np.diff(ct[valid]) >= 0)
    assert not valid[2 * n_valid:].any()


def test_densify_auto_block_interior_hole_falls_back(rng):
    """An interior mask hole makes the masked key stream unsorted — 'auto'
    must fall back to the global sort and still return a correct
    ordering."""
    from event_utils_tpu.augmentation.event_augmentation import \
        add_correlated_events_jax

    n = 2048
    ts = np.sort(rng.uniform(0, 0.3, n)).astype(np.float32)
    xs = rng.uniform(0, 239, n).astype(np.float32)
    ys = rng.uniform(0, 179, n).astype(np.float32)
    ps = np.ones(n, np.float32)
    mask = np.ones(n, np.float32)
    mask[100:200] = 0.0  # interior hole
    cx, cy, ct, cp, cm = add_correlated_events_jax(
        jax.random.PRNGKey(4), xs, ys, ts, ps, mask=mask,
        ts_std=0.0005, sort_block="auto")
    cm, ct = np.asarray(cm), np.asarray(ct)
    valid = cm != 0
    assert valid.sum() == 2 * (n - 100)
    assert np.all(np.diff(ct[valid]) >= 0)
    # pads (the hole's slots) sorted to the tail
    assert not valid[int(valid.sum()):].any()


def test_densify_packed_sort_parity_with_general_path(rng):
    """Integer-dtype coords trigger the packed 2-operand sort
    (one int32 word carries x/y/polarity/mask); its output must match the
    general 6-operand path exactly on every valid slot. Same PRNG key =>
    identical jitter streams, so any divergence is a packing bug."""
    from event_utils_tpu.augmentation.event_augmentation import \
        add_correlated_events_jax

    n_valid, cap = 1500, 2048
    xs = rng.integers(0, 240, cap).astype(np.int32)
    ys = rng.integers(0, 180, cap).astype(np.int32)
    ts = np.zeros(cap, np.float32)
    ts[:n_valid] = np.sort(rng.uniform(0, 0.3, n_valid)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], cap).astype(np.float32)
    mask = (np.arange(cap) < n_valid).astype(np.float32)

    key = jax.random.PRNGKey(11)
    packed = add_correlated_events_jax(key, xs, ys, ts, ps, mask=mask,
                                       ts_std=0.0005)
    general = add_correlated_events_jax(key, xs.astype(np.float32),
                                        ys.astype(np.float32), ts, ps,
                                        mask=mask, ts_std=0.0005)
    pm = np.asarray(packed[4])
    gm = np.asarray(general[4])
    np.testing.assert_array_equal(pm, gm)
    valid = pm != 0
    for a, b, name in zip(packed[:4], general[:4],
                          ("xs", "ys", "ts", "ps")):
        np.testing.assert_array_equal(np.asarray(a)[valid],
                                      np.asarray(b)[valid],
                                      err_msg=f"packed/general {name}")
    # pad slots: packed path reads t back from the +inf key as the time
    # origin (0 in relative time; mask is 0, consumers ignore the value)
    np.testing.assert_allclose(np.asarray(packed[2])[~valid], ts[0],
                               atol=1e-6)


def test_densify_packed_sort_under_jit(rng):
    """The packed path's eligibility is a trace-time property (int input
    dtype): it must compose with jit, return sorted valid-prefix output,
    and preserve per-slot counts/polarity."""
    from event_utils_tpu.augmentation.event_augmentation import \
        add_correlated_events_jax

    n = 4096
    xs = rng.integers(0, 240, n).astype(np.int32)
    ys = rng.integers(0, 180, n).astype(np.int32)
    ts = np.sort(rng.uniform(0, 0.1, n)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)

    fn = jax.jit(lambda k, x, y, t, p: add_correlated_events_jax(
        k, x, y, t, p))
    cx, cy, ct, cp, cm = fn(jax.random.PRNGKey(7), xs, ys, ts, ps)
    cm = np.asarray(cm)
    assert cm.sum() == 2 * n
    ctv = np.asarray(ct)[cm != 0]
    assert np.all(np.diff(ctv) >= 0)
    assert np.asarray(cx).min() >= 0 and np.asarray(cx).max() <= 239
    assert np.asarray(cy).min() >= 0 and np.asarray(cy).max() <= 179
    assert set(np.unique(np.asarray(cp))) <= {-1.0, 1.0}
