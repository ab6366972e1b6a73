"""Contrast-maximisation drivers: gradient optimizers, grid search, grid_cmax.

Rebuild of reference ``lib/contrast_max/events_cmax.py`` as two coexisting
paths:

* **Host-driven parity path** — ``optimize_contrast`` / ``optimize`` /
  ``optimize_r2`` keep the reference's scipy-BFGS driver semantics
  (events_cmax.py:313-389) including the per-iteration adaptive-lifespan
  callback — but every objective/gradient evaluation is one cached, jitted
  JAX computation (a masked, fixed-capacity event batch, so the lifespan cut
  never recompiles).

* **Jitted TPU path** — ``optimize_contrast_jit`` compiles the entire BFGS
  solve (``jax.scipy.optimize.minimize``) and the coarse-to-fine grid search
  into one XLA program; ``grid_cmax_batched`` vmaps that whole solver over
  every ROI of the sensor at once (the reference loops ROIs in Python,
  events_cmax.py:53-67).
"""

from __future__ import annotations

import copy
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize as sciopt
from jax.scipy.optimize import minimize as jax_minimize

from ..models.objectives import (get_iwe, objective_function,
                                 variance_objective)
from ..models.warps import linvel_warp, warp_function, xyztheta_warp
from ..ops.blur import gaussian_filter
from ..errors import ConfigurationError
from ..utils.event_util import infer_resolution, lifespan_mask

Array = jax.Array


# ---------------------------------------------------------------------------
# Jitted loss factory
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _compiled_loss(obj_key, warp_cls, img_size, blur_sigma, use_polarity,
                   obj_cls, obj_kwargs):
    """Build and cache jitted (loss, value_and_grad) for a configuration.

    ``blur_sigma`` is static (the Gaussian kernel size depends on it);
    ``obj_kwargs`` carries the objective's tuning knobs (thresh, p, ...) so
    non-default objectives compile their own loss.
    """
    warpfunc = warp_cls()
    objective = obj_cls(**dict(obj_kwargs))
    loss = make_objective_loss(objective, warpfunc, img_size, blur_sigma)
    return jax.jit(loss), jax.jit(jax.value_and_grad(loss))


def make_objective_loss(objective: objective_function,
                        warpfunc: warp_function,
                        img_size: Tuple[int, int],
                        blur_sigma: Optional[float],
                        iwe_impl: Optional[str] = None) -> Callable:
    """Pure jittable ``loss(params, xs, ys, ts, ps, mask)`` for an
    objective/warp pair (autodiff path). Not cached — use directly inside
    larger jitted programs. ``iwe_impl='matmul'`` forms the IWE on the MXU
    (~8x faster, ~1e-5 relative).

    Objectives that are not plain IWE reductions define ``make_event_loss``
    (zhu's timestamp-image loss) and get their true loss here — so every
    optimizer path (host scipy, jitted BFGS/GD, grid search, batched ROI
    solves) optimizes the correct objective. Objectives whose exact loss
    has zero gradient a.e. define ``soft_loss_fn`` (isoa's hard indicator
    -> sigmoid surrogate, objectives.py) and the surrogate is optimized
    here — exactly as in ``make_patch_loss`` — since grid search + GD/BFGS
    all need slopes; report parity-exact *values* via
    ``objective.evaluate_function``."""
    if hasattr(objective, "make_event_loss"):
        return objective.make_event_loss(warpfunc, img_size, blur_sigma,
                                         impl=iwe_impl)
    reduce_fn = getattr(objective, "soft_loss_fn", objective.loss_fn)

    def loss(params, xs, ys, ts, ps, mask=None):
        iwe, _ = get_iwe(params, xs, ys, ts, ps, warpfunc, img_size,
                         use_polarity=objective.use_polarity, mask=mask,
                         impl=iwe_impl)
        if blur_sigma and blur_sigma > 0:
            iwe = gaussian_filter(iwe, blur_sigma)
        return reduce_fn(iwe)

    return loss


def _objective_kwargs(objective):
    """The objective's tuning knobs as a hashable tuple (cache-key part:
    two objectives of the same class but different knobs must never share
    a compiled loss — the floats are baked in at trace time)."""
    obj_kwargs = []
    if isinstance(objective, variance_objective):
        obj_kwargs.append(("minimum_events", objective.minimum_events))
    if hasattr(objective, "thresh"):
        obj_kwargs.append(("thresh", objective.thresh))
    if hasattr(objective, "p"):
        obj_kwargs.append(("p", objective.p))
    return tuple(obj_kwargs)


def _get_jitted(objective, warpfunc, img_size, blur_sigma):
    """lru-cached compiled loss for the host-driven optimizer."""
    sigma = objective.default_blur if blur_sigma is None else blur_sigma
    obj_kwargs = _objective_kwargs(objective)
    key = (objective.name, obj_kwargs)
    return _compiled_loss(key, type(warpfunc), tuple(img_size), float(sigma),
                          objective.use_polarity, type(objective), obj_kwargs)


@functools.lru_cache(maxsize=256)
def _compiled_vmap_loss(obj_key, warp_cls, img_size, blur_sigma,
                        obj_cls, obj_kwargs):
    """lru-cached jitted params-batched evaluator ``(coords, xs, ys, ts, ps)
    -> (S,) losses`` — grid searches call this per recursion level / per
    ROI, and a fresh ``jax.jit(jax.vmap(lambda ...))`` closure would defeat
    jit's cache and recompile every call (seconds each over a device
    tunnel)."""
    del obj_key
    warpfunc = warp_cls()
    objective = obj_cls(**dict(obj_kwargs))
    loss = make_objective_loss(objective, warpfunc, img_size, blur_sigma)
    return jax.jit(jax.vmap(loss, in_axes=(0, None, None, None, None)))


def _get_jitted_vmap(objective, warpfunc, img_size, blur_sigma):
    obj_kwargs = _objective_kwargs(objective)
    return _compiled_vmap_loss((objective.name, obj_kwargs), type(warpfunc),
                               tuple(img_size), float(blur_sigma),
                               type(objective), obj_kwargs)


# ---------------------------------------------------------------------------
# Host-driven optimizer (reference semantics, jitted evaluations)
# ---------------------------------------------------------------------------

def optimize_contrast(xs, ys, ts, ps, warp_function, objective,
                      optimizer=sciopt.fmin_bfgs, x0=None,
                      numeric_grads: bool = False, blur_sigma=None,
                      img_size=(180, 240), grid_search_init: bool = False,
                      minimum_events: Optional[int] = None):
    """Optimize warp parameters with a (scipy) BFGS driver
    (reference events_cmax.py:313-346).

    Adaptive lifespan runs as in the reference: the BFGS callback
    (``objective.iter_update``) recomputes the event lifespan from the current
    parameter magnitude; here the cut is a validity-mask update over a
    fixed-capacity batch (with the reference's ``ps*100`` rescale,
    objectives.py:225), so nothing recompiles.

    ``minimum_events``: floor of events the lifespan mask keeps. The
    reference accepts this parameter but never reads it (its signature
    default 200 is dead code — the objective's own ``minimum_events``
    governs); here an explicit value takes effect, and the default
    ``None`` defers to ``objective.minimum_events`` like the reference.
    """
    xs = np.ascontiguousarray(xs, np.float32)
    ys = np.ascontiguousarray(ys, np.float32)
    ts = np.ascontiguousarray(ts, np.float32)
    ps = np.ascontiguousarray(ps, np.float32)

    if grid_search_init and x0 is None:
        init_obj = copy.deepcopy(objective)
        init_obj.adaptive_lifespan = False
        minv = grid_search_optimisation(xs, ys, ts, ps, warp_function,
                                        init_obj, img_size, log_scale=False)
        x0 = minv["min_params"]
    if x0 is None:
        x0 = np.zeros(warp_function.dims)
    x0 = np.asarray(x0, np.float64)

    loss_jit, vgrad_jit = _get_jitted(objective, warp_function, img_size,
                                      blur_sigma)

    dxs = jnp.asarray(xs)
    dys = jnp.asarray(ys)
    dts = jnp.asarray(ts)
    dps = jnp.asarray(ps)
    state = {"mask": jnp.ones_like(dts)}

    min_events = (objective.minimum_events if minimum_events is None
                  else int(minimum_events))

    def refresh_mask(params):
        if objective.adaptive_lifespan:
            objective.iter_update(params)
            m = lifespan_mask(dts, jnp.asarray(params, jnp.float32),
                              objective.pixel_crossings, min_events)
            state["mask"] = m

    def weights():
        if objective.adaptive_lifespan:
            return dps * 100.0  # objectives.py:225
        return dps

    def f(p):
        return float(loss_jit(jnp.asarray(p, jnp.float32), dxs, dys, dts,
                              weights(), state["mask"]))

    def fprime(p):
        _, g = vgrad_jit(jnp.asarray(p, jnp.float32), dxs, dys, dts,
                         weights(), state["mask"])
        return np.asarray(g, np.float64)

    refresh_mask(x0)
    if numeric_grads:
        argmax = optimizer(f, x0, epsilon=1, disp=False,
                           callback=refresh_mask)
    else:
        argmax = optimizer(f, x0, fprime=fprime, disp=False,
                           callback=refresh_mask)
    return np.asarray(argmax)


def optimize(xs, ys, ts, ps, warp, obj, numeric_grads: bool = True,
             img_size=(180, 240)):
    """Single-stage optimize with blur 1.0 (reference events_cmax.py:348-368)."""
    numeric_grads = numeric_grads if obj.has_derivative else True
    return optimize_contrast(xs, ys, ts, ps, warp, obj,
                             numeric_grads=numeric_grads, blur_sigma=1.0,
                             img_size=img_size)


def optimize_r2(xs, ys, ts, ps, warp, obj, numeric_grads: bool = True,
                img_size=(180, 240)):
    """Two-stage schedule finishing with the SoE loss
    (reference events_cmax.py:370-389)."""
    from ..models.objectives import soe_objective
    soe_obj = soe_objective()
    numeric_grads = numeric_grads if obj.has_derivative else True
    argmax = optimize_contrast(xs, ys, ts, ps, warp, obj,
                               numeric_grads=numeric_grads, blur_sigma=None,
                               img_size=img_size)
    argmax = optimize_contrast(xs, ys, ts, ps, warp, soe_obj, x0=argmax,
                               numeric_grads=numeric_grads, blur_sigma=1.0,
                               img_size=img_size)
    return argmax


# ---------------------------------------------------------------------------
# Fully-jitted optimizer
# ---------------------------------------------------------------------------

def optimize_contrast_jit(xs, ys, ts, ps, warpfunc, objective,
                          x0=None, blur_sigma: Optional[float] = 1.0,
                          img_size=(180, 240), mask=None,
                          grid_search_init: bool = False,
                          maxiter: int = 100,
                          iwe_impl: Optional[str] = "matmul"):
    """Whole-solve-on-device BFGS (``jax.scipy.optimize.minimize``).

    One XLA program: warp → scatter → blur → loss, differentiated by
    autodiff, iterated by a compiled BFGS with line search; the IWE forms
    on the MXU by default (``iwe_impl='matmul'``; pass None for the exact
    scatter). Returns the optimal parameters as a jax array.
    """
    loss = make_objective_loss(objective, warpfunc, img_size, blur_sigma,
                               iwe_impl=iwe_impl)
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)
    if x0 is None:
        if grid_search_init:
            # For collapse-prone objectives (zhu's timestamp images,
            # isoa's count and sosa's -sum(exp(-p*IWE)) all reach their
            # global optimum when every event is swept off the sensor), cap
            # the init search at velocities that would evacuate the frame
            # within the window. Mass-preserving objectives keep the
            # reference's full +-150 range — the cap would wrongly exclude
            # legitimate fast motions for them.
            init_range = 150.0
            if (isinstance(warpfunc, linvel_warp)
                    and getattr(objective, "name", "")
                    in ("zhu", "isoa", "sosa")):
                dt = ts[-1] - ts[0] if mask is None else (
                    jnp.max(jnp.where(mask != 0, ts, -jnp.inf))
                    - jnp.min(jnp.where(mask != 0, ts, jnp.inf)))
                vmax = (min(img_size) / 2.0) / jnp.maximum(dt, 1e-3)
                init_range = jnp.minimum(150.0, vmax)
            x0 = grid_search_refine(
                lambda p: loss(p, xs, ys, ts, ps, mask),
                warpfunc.dims, init_range=init_range)[0]
        else:
            x0 = jnp.zeros((warpfunc.dims,), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    res = jax_minimize(
        lambda p: loss(p, xs, ys, ts, ps, mask), x0, method="BFGS",
        options={"maxiter": maxiter, "gtol": 1e-6})
    return res.x


# ---------------------------------------------------------------------------
# SOFAS grid search
# ---------------------------------------------------------------------------

def _sample_scale(num_samples_per_param: int, log_scale: bool) -> np.ndarray:
    """Half-axis sample positions in (0, 1] (reference events_cmax.py:272-277)."""
    if log_scale:
        scale = np.logspace(0, 2.0, int(num_samples_per_param / 2.0) + 1)[1:]
        scale /= scale[-1]
    else:
        scale = np.linspace(0, 1.0, int(num_samples_per_param / 2.0) + 1)[1:]
    return scale


def _axes_from_ranges(param_ranges, scale):
    """Symmetric sample axes about each range's midpoint
    (reference events_cmax.py:285-292)."""
    axes = []
    for lo, hi in param_ranges:
        rng = hi - lo
        mid = lo + rng / 2.0
        pos = mid + scale * (rng / 2.0)
        neg = (mid - scale * (rng / 2.0))[::-1]
        axes.append(np.concatenate([neg, [mid], pos]))
    return axes


def grid_search_initial(xs, ys, ts, ps, warp_function, objective_function,
                        img_size, param_ranges=None, log_scale: bool = True,
                        num_samples_per_param: int = 5):
    """One level of SOFAS grid search (reference events_cmax.py:241-311).

    All ``num_samples^dims`` sample evaluations run as one vmapped, jitted
    batch instead of a Python loop.

    Divergence (documented): the reference initialises ``best_eval = 0`` so
    positive-loss optima are never selected (events_cmax.py:297-307); here
    the true argmin is returned.
    """
    assert num_samples_per_param % 2 == 1
    scale = _sample_scale(num_samples_per_param, log_scale)
    if param_ranges is None:
        param_ranges = [[-150, 150] for _ in range(warp_function.dims)]
    axes = _axes_from_ranges(param_ranges, scale)
    grids = np.meshgrid(*axes)
    coords = np.stack([g.ravel() for g in grids], axis=-1)  # (S, dims)

    vloss = _get_jitted_vmap(objective_function, warp_function,
                             tuple(img_size), 1.0)
    dxs = jnp.asarray(xs, jnp.float32)
    dys = jnp.asarray(ys, jnp.float32)
    dts = jnp.asarray(ts, jnp.float32)
    dps = jnp.asarray(ps, jnp.float32)
    evals = vloss(jnp.asarray(coords, jnp.float32), dxs, dys, dts, dps)
    evals = np.asarray(evals, np.float64)

    best = int(np.argmin(evals))
    return {
        "params": [tuple(c) for c in coords],
        "eval": list(evals),
        "search_axes": axes,
        "min_params": np.asarray(coords[best]),
        "min_func_eval": float(evals[best]),
    }


def find_new_range(search_axes, param):
    """New per-axis search range enclosing the unsearched region around the
    optimum (reference events_cmax.py:162-184).

    NB the left-edge case expands by the FULL axis span (``|axes[0] -
    axes[-1]|``) while the right edge uses one sample step — asymmetric,
    but replicated verbatim from the reference (its lines 177-179) for
    parity; `optimize_contrast` here defaults to the jit grid+refine path
    which does not use this function."""
    search_axes = np.asarray(search_axes)
    nearest_idx = int(np.searchsorted(search_axes, param))
    if nearest_idx >= len(search_axes) - 1:
        d1 = abs(search_axes[-1] - search_axes[-2])
        d2 = d1
    elif nearest_idx == 0:
        d1 = abs(search_axes[0] - search_axes[-1])
        d2 = abs(search_axes[0] - search_axes[1])
    else:
        d1 = abs(search_axes[nearest_idx] - search_axes[nearest_idx - 1])
        d2 = abs(search_axes[nearest_idx] - search_axes[nearest_idx + 1])
    return [param - d1, param + d2]


def grid_search_optimisation(xs, ys, ts, ps, warp_function,
                             objective_function, img_size, param_ranges=None,
                             log_scale: bool = True,
                             num_samples_per_param: int = 5, depth: int = 0,
                             th0: float = 1, max_iters: int = 20):
    """Recursive coarse-to-fine SOFAS search (reference events_cmax.py:186-237;
    the reference's recursive call targets a misnamed ``recursive_search`` —
    the intended recursion is implemented here)."""
    assert num_samples_per_param % 2 == 1 and num_samples_per_param >= 5
    optimal = grid_search_initial(xs, ys, ts, ps, warp_function,
                                  copy.deepcopy(objective_function), img_size,
                                  param_ranges=param_ranges,
                                  log_scale=log_scale,
                                  num_samples_per_param=num_samples_per_param)
    params = optimal["min_params"]
    new_ranges, max_range = [], 0.0
    for sa, param in zip(optimal["search_axes"], params):
        nr = find_new_range(sa, param)
        new_ranges.append(nr)
        max_range = max(max_range, abs(nr[1] - nr[0]))
    if max_range >= th0 and depth < max_iters:
        return grid_search_optimisation(
            xs, ys, ts, ps, warp_function, objective_function, img_size,
            param_ranges=new_ranges, log_scale=log_scale,
            num_samples_per_param=num_samples_per_param, depth=depth + 1,
            th0=th0, max_iters=max_iters)
    return optimal


# Alias matching the (misspelled) reference call site (events_cmax.py:233,336)
recursive_search = grid_search_optimisation


def grid_search_refine(loss_fn: Callable, dims: int,
                       init_range: float = 150.0,
                       num_samples_per_param: int = 5,
                       log_scale: bool = False, iters: int = 8,
                       th0: float = 1.0):
    """Jit-friendly coarse-to-fine grid search.

    The whole refine loop (sample -> vmapped eval -> re-center ranges) runs
    inside ``lax.fori_loop`` with dynamic ranges, so it vmaps across ROIs
    (``grid_cmax_batched``). Returns ``(best_params, best_eval)``.
    """
    scale = jnp.asarray(_sample_scale(num_samples_per_param, log_scale),
                        jnp.float32)
    S = 2 * scale.shape[0] + 1

    def sample_axis(lo, hi):
        rng = hi - lo
        mid = lo + rng / 2.0
        pos = mid + scale * (rng / 2.0)
        neg = (mid - scale * (rng / 2.0))[::-1]
        return jnp.concatenate([neg, mid[None], pos])

    def body(_, state):
        ranges, best_p, best_e = state
        axes = jax.vmap(sample_axis)(ranges[:, 0], ranges[:, 1])  # (dims, S)
        mesh = jnp.stack(jnp.meshgrid(*[axes[d] for d in range(dims)],
                                      indexing="ij"), axis=-1)
        coords = mesh.reshape(-1, dims)  # (S^dims, dims)
        evals = jax.vmap(loss_fn)(coords)
        best = jnp.argmin(evals)
        cand_p = coords[best]
        cand_e = evals[best]
        better = cand_e < best_e
        best_p = jnp.where(better, cand_p, best_p)
        best_e = jnp.where(better, cand_e, best_e)
        # re-center each axis around the best sample (half the previous step)
        step = (axes[:, 1:] - axes[:, :-1]).max(axis=1)
        new_ranges = jnp.stack([cand_p - step, cand_p + step], axis=-1)
        return new_ranges, best_p, best_e

    r0 = jnp.asarray(init_range, jnp.float32)  # may be traced (per-ROI caps)
    ranges0 = jnp.tile(jnp.stack([-r0, r0])[None, :], (dims, 1))
    init = (ranges0, jnp.zeros((dims,), jnp.float32), jnp.inf)
    _, best_p, best_e = jax.lax.fori_loop(0, iters, body, init)
    del th0, S
    return best_p, best_e


# ---------------------------------------------------------------------------
# ROI-tiled contrast maximisation (grid_cmax)
# ---------------------------------------------------------------------------

# Default ROI patch window: 20x20 ROIs centered with generous warp margins,
# MXU-aligned (rows x lanes). Shared by make_patch_loss and the ROI solver's
# velocity cap so they can never desync.
PATCH_DEFAULT = (64, 128)

# pyramid='auto' selector threshold: an ROI whose plain-solve flow field is
# locally incoherent — 3x3-median deviation-from-neighbor-median above this
# fraction of the local flow magnitude — takes the pyramid field instead of
# its own answer. Aliased dense-texture optima land incoherently across
# neighboring ROIs (measured median relative incoherence 0.55 on the dense
# bench scene), while a correct field deviates from its neighbor median only
# by the true flow gradient plus solver noise (0.05 on the sparse scene); the
# threshold sits in that gap with >2x margin either side. AUTO_MAG_FLOOR
# (px/s) keeps the normalizer away from zero in near-static regions. Tuned
# on the per-ROI oracle study over the dense-texture and sparse bench scenes
# (see tests/test_cmax.py::test_grid_cmax_pyramid_auto).
AUTO_REL_COH_TAU = 0.2
AUTO_MAG_FLOOR = 5.0
# Scene-level escalation: dense-texture aliasing is a GLOBAL property of
# the scene (the same texture statistics alias every ROI the same way), so
# when more than this fraction of valid ROIs is individually incoherent,
# 'auto' takes the whole pyramid field — including its final median
# smoothing — instead of per-ROI mixing. Per-ROI mixing on such scenes kept
# plain answers for ROIs that passed the coherence test while still being
# aliased, costing a measured ~20% vs the pure pyramid field (r4 verdict:
# auto 4.0 vs pyramid 3.3 px/s median on the dense scene); with the
# escalation auto == pyramid exactly there, while genuinely mixed or
# coherent scenes (fraction below the threshold) keep per-ROI selection.
AUTO_SCENE_FRAC = 0.5


def make_patch_loss(warpfunc, roi_size, objective=None, patch=PATCH_DEFAULT,
                    blur_sigma: float = 1.0,
                    full_pixels: Optional[int] = None):
    """MXU-fast per-ROI objective loss: patch-local accumulation as ONE matmul.

    Bilinear splatting factorizes — ``tap(y, x) = wy(y) * wx(x) * w`` — so
    the whole 4-tap image of warped events is a single (PH, C) x (C, PW)
    product of one-hot row/column matrices carrying the bilinear fractions:

        A[r, n] = (1-dy_n)[y0_n = r] + dy_n[y0_n + 1 = r]
        V[n, c] = w_n ((1-dx_n)[x0_n = c] + dx_n[x0_n + 1 = c])
        IWE     = A @ V

    Coordinates are patch-local (the ROI centered in a ``patch`` window), and
    the variance of the *full-frame* IWE is recovered analytically from patch
    sums (pixels outside the patch are zero): with FP = full pixel count,
    ``var = sum(IWE^2)/FP - (sum(IWE)/FP)^2``.

    Divergences (documented): events warped beyond the patch are dropped
    (the reference drops only beyond the sensor). With the default patch a
    20x20 ROI keeps all events for |v| * dt <= ~22 px; larger warps lose
    mass, which lowers contrast and steers the optimizer back — the same
    shape of penalty the sensor boundary applies in the reference. The blur
    halo leaking outside the patch window is ignored (pixels there are
    treated as exactly 0 / exp(0)).

    Every objective is supported; the full-frame loss is recovered
    analytically from patch sums (P = patch pixels, FP = full-frame pixels,
    pixels outside the patch hold 0):

      variance   -(Q/FP - (S/FP)^2)
      sos, rms   -Q/FP
      soe        -(sum exp(iwe) + (FP - P)) / FP
      sosa       -(sum exp(-p iwe) + (FP - P))
      r1         -(Q/FP) * (sum exp(-p iwe) + (FP - P))
      isoa       sum sigmoid((iwe - thresh)/0.1)   [soft surrogate: the hard
                 indicator has zero gradient a.e., so grid+GD need slopes;
                 report parity-exact values via the full-frame objective]
      moa        -max(max iwe, 0)
      zhu        +(sum T_pos^2 + sum T_neg^2) over patch timestamp images —
                 a 4-channel accumulation sharing the one-hot factors

    Returns ``loss(params, ex, ey, et, ep, mask, origin_yx) -> scalar``,
    fully differentiable (gradients flow through the bilinear fractions,
    exactly as for scatter-based IWEs).
    """
    from ..ops.blur import gaussian_kernel1d

    if objective is None or isinstance(objective, str):
        from ..models.objectives import OBJECTIVE_REGISTRY
        objective = OBJECTIVE_REGISTRY[objective or "variance"]()
    name = objective.name
    use_polarity = getattr(objective, "use_polarity", True)
    p_sup = float(getattr(objective, "p", 3))

    PH, PW = patch
    rh, rw = roi_size
    blur_k = (jnp.asarray(gaussian_kernel1d(blur_sigma), jnp.float32)
              if blur_sigma and blur_sigma > 0 else None)

    def _blur(img):
        if blur_k is None:
            return img
        r = blur_k.shape[0]
        img = jax.lax.conv_general_dilated(
            img[None, None], blur_k[None, None, :, None],
            (1, 1), [(r // 2, r // 2), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
        return jax.lax.conv_general_dilated(
            img[None, None], blur_k[None, None, None, :],
            (1, 1), [(0, 0), (r // 2, r // 2)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    def loss(params, ex, ey, et, ep, mask, origin_yx):
        mask = jnp.asarray(mask, jnp.float32)
        # Empty ROIs (all-zero mask) would give t0 = -inf -> NaN coords ->
        # NaN loss; pin t0 to 0 so they produce a finite (zero-IWE) loss.
        any_valid = jnp.any(mask != 0)
        t0 = jnp.where(any_valid,
                       jnp.max(jnp.where(mask != 0, et, -jnp.inf)), 0.0)
        xw, yw = warpfunc.warp_fn(params, ex, ey, et, t0)
        px = xw - (origin_yx[1] + rw / 2.0 - PW / 2.0)
        py = yw - (origin_yx[0] + rh / 2.0 - PH / 2.0)
        w_pol = ep if use_polarity else jnp.abs(ep)
        w = w_pol * mask

        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        dx = (px - x0).astype(jnp.float32)
        dy = (py - y0).astype(jnp.float32)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        okx = (ix0 >= 0) & (ix0 + 1 < PW)
        oky = (iy0 >= 0) & (iy0 + 1 < PH)
        inpatch = (okx & oky).astype(jnp.float32)
        ix0 = jnp.clip(ix0, 0, PW - 2)
        iy0 = jnp.clip(iy0, 0, PH - 2)

        C = ex.shape[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (PH, C), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (C, PW), 1)
        A = ((row_iota == iy0[None, :]).astype(jnp.float32) * (1 - dy)[None]
             + (row_iota == (iy0 + 1)[None, :]).astype(jnp.float32) * dy[None])
        Ab = A.astype(jnp.bfloat16)
        C0 = (col_iota == ix0[:, None]).astype(jnp.float32)
        C1 = (col_iota == (ix0 + 1)[:, None]).astype(jnp.float32)

        def accumulate(wk):
            """(PH, PW) bilinear image of per-event weights ``wk``."""
            V = C0 * (wk * (1 - dx))[:, None] + C1 * (wk * dx)[:, None]
            return jax.lax.dot_general(
                Ab, V.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        FP = jnp.float32(full_pixels if full_pixels is not None else PH * PW)
        P = jnp.float32(PH * PW)

        if name == "zhu":
            valid = mask * inpatch
            t_first = jnp.where(any_valid,
                                jnp.min(jnp.where(mask != 0, et, jnp.inf)),
                                0.0)
            nt = (et - t_first) / (t0 - t_first + 1e-6)
            posw = jnp.where(ep > 0, 1.0, 0.0) * valid
            negw = jnp.where(ep <= 0, 1.0, 0.0) * valid
            tpos = accumulate(nt * posw)
            cpos = 1.0 + accumulate(posw)
            tneg = accumulate(nt * negw)
            cneg = 1.0 + accumulate(negw)
            pos = _blur(tpos / cpos)
            neg = _blur(tneg / cneg)
            return jnp.sum(pos * pos) + jnp.sum(neg * neg)

        iwe = _blur(accumulate(w * inpatch))
        Q = jnp.sum(iwe * iwe)
        if name in ("sos", "rms"):
            # mean(IWE^2) over the full frame == Q / FP (empty pixels are 0);
            # the reference's sos and rms losses are the same expression.
            return -Q / FP
        if name == "soe":
            return -(jnp.sum(jnp.exp(iwe)) + (FP - P)) / FP
        if name == "sosa":
            return -(jnp.sum(jnp.exp(-p_sup * iwe)) + (FP - P))
        if name == "r1":
            sosa = jnp.sum(jnp.exp(-p_sup * iwe)) + (FP - P)
            return -(Q / FP) * sosa
        if name == "isoa":
            # the objective's own surrogate (isoa_objective.soft_loss_fn);
            # zero pixels outside the patch contribute a params-independent
            # constant, dropped here
            return objective.soft_loss_fn(iwe)
        if name == "moa":
            return -jnp.maximum(jnp.max(iwe), 0.0)
        S = jnp.sum(iwe)
        return -(Q / FP - (S / FP) ** 2)  # variance

    return loss


def make_patch_variance_loss(warpfunc, roi_size, patch=(64, 128),
                             blur_sigma: float = 1.0,
                             full_pixels: Optional[int] = None,
                             objective: str = "variance"):
    """Backward-compatible alias of :func:`make_patch_loss`."""
    return make_patch_loss(warpfunc, roi_size, objective, patch=patch,
                           blur_sigma=blur_sigma, full_pixels=full_pixels)


def grid_cmax(xs, ys, ts, ps, roi_size=(20, 20), step=None, warp=None,
              obj=None, min_events: int = 10, img_size=None):
    """Per-ROI contrast maximisation, host loop (reference events_cmax.py:28-76).

    Divergences (documented): the final objective evaluation uses the ROI's
    own IWE over the full-sensor image as in the reference, and unlike the
    reference — which silently re-instantiates its ``warp``/``obj`` arguments
    (events_cmax.py:48, 65) — the passed ``warp``/``obj`` are honoured.
    Reference-parity quirk kept: like the reference (events_cmax.py:53-57,
    ``xs < xc+step[1]``), ``step`` is both the stride AND the window extent,
    so ``roi_size`` only sets ``step``'s default — passing ``step`` smaller
    than ``roi_size`` yields disjoint step-sized windows, not overlapping
    ROIs.
    For TPU-scale throughput use :func:`grid_cmax_batched`.
    """
    step = roi_size if step is None else step
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    resolution = infer_resolution(xs, ys) if img_size is None else img_size
    warp = linvel_warp() if warp is None else warp

    results_params, results_rois, results_f_evals = [], [], []
    for xc in range(0, resolution[1], step[1]):
        in_x = (xs >= xc) & (xs < xc + step[1])
        for yc in range(0, resolution[0], step[0]):
            sel = in_x & (ys >= yc) & (ys < yc + step[0])
            roi_xs, roi_ys, roi_ts, roi_ps = xs[sel], ys[sel], ts[sel], ps[sel]
            if len(roi_xs) > min_events:
                roi_obj = (variance_objective(adaptive_lifespan=True,
                                              minimum_events=105)
                           if obj is None else copy.deepcopy(obj))
                params = optimize_contrast(roi_xs, roi_ys, roi_ts, roi_ps,
                                           warp, roi_obj, numeric_grads=False,
                                           blur_sigma=2.0,
                                           img_size=resolution,
                                           grid_search_init=True)
                params = optimize_contrast(roi_xs, roi_ys, roi_ts, roi_ps,
                                           warp, roi_obj, numeric_grads=False,
                                           blur_sigma=1.0,
                                           img_size=resolution, x0=params)
                iwe, _ = get_iwe(params, xs, ys, ts, ps, warp, resolution,
                                 use_polarity=True, compute_gradient=False)
                f_eval = roi_obj.evaluate_function(iwe=iwe)
                results_params.append(np.asarray(params))
                results_rois.append([yc, xc, step[0], step[1]])
                results_f_evals.append(f_eval)
    return results_params, results_rois, results_f_evals


def bucket_events_by_roi(xs, ys, ts, ps, resolution, roi_size,
                         capacity: Optional[int] = None,
                         capacity_cap: Optional[int] = 2048,
                         rng: Optional[np.random.Generator] = None,
                         return_counts: bool = False):
    """Bucket events into fixed-capacity per-ROI batches (host side).

    Returns ``(bx, by, bt, bp, bmask, roi_origins, overflow)`` where each
    ``b*`` is ``(R, capacity)`` and ``roi_origins`` is ``(R, 2)`` = (y0, x0).
    ROIs holding more than ``capacity`` events are *uniformly subsampled*
    (time order preserved) rather than truncated — the contrast objective is
    statistically unchanged while the solve cost stays bounded; ``overflow``
    counts the subsampled-away events. Default capacity is the max ROI count
    rounded up to a power of two, clipped to ``capacity_cap``.
    ``return_counts=True`` appends the true (pre-subsampling) per-ROI event
    counts ``(R,)`` to the tuple.
    """
    H, W = resolution
    rh, rw = roi_size
    ny = (H + rh - 1) // rh
    nx = (W + rw - 1) // rw
    R = ny * nx
    rng = np.random.default_rng(0) if rng is None else rng
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    rid = (np.clip(ys.astype(np.int64) // rh, 0, ny - 1) * nx
           + np.clip(xs.astype(np.int64) // rw, 0, nx - 1))
    order = np.argsort(rid, kind="stable")
    counts = np.bincount(rid[order], minlength=R)
    if capacity is None:
        capacity = int(counts.max()) if len(counts) else 1
        capacity = max(1, int(2 ** np.ceil(np.log2(max(capacity, 1)))))
        if capacity_cap is not None:
            capacity = min(capacity, capacity_cap)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    if counts.max(initial=0) <= capacity:
        # no bucket overflows: native counting-sort fill (one O(n) pass,
        # ~100 Mev/s) with a vectorized numpy fallback; the per-bucket
        # Python loop below costs ~2 Mev/s at millions of events
        from .. import native
        packed = native.bucket_fill(xs, ys, ts, ps, (rh, rw), (ny, nx),
                                    capacity) if native.available() else None
        if packed is not None:
            bx, by, bt, bp, bmask, _ = packed
            oy, ox = np.divmod(np.arange(R), nx)
            roi_origins = np.stack([oy * rh, ox * rw], axis=-1)
            out = (jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bt),
                   jnp.asarray(bp), jnp.asarray(bmask),
                   jnp.asarray(roi_origins), 0)
            return out + (counts,) if return_counts else out
        rid_sorted = rid[order]
        pos = np.arange(len(order)) - starts[rid_sorted]
        flat = rid_sorted.astype(np.int64) * capacity + pos

        def pack(arr):
            out = np.zeros(R * capacity, dtype=np.float32)
            out[flat] = arr[order]
            return out.reshape(R, capacity)

        bx, by = pack(xs), pack(ys)
        bt, bp = pack(ts), pack(ps)
        bmask = np.zeros(R * capacity, np.float32)
        bmask[flat] = 1.0
        bmask = bmask.reshape(R, capacity)
    else:
        # per-ROI source indices (subsampled when over capacity)
        sel_idx = []
        for r in range(R):
            src = order[starts[r]:starts[r] + counts[r]]
            if len(src) > capacity:
                keep = np.sort(rng.choice(len(src), size=capacity,
                                          replace=False))
                src = src[keep]
            sel_idx.append(src)

        def pack(arr):
            out = np.zeros((R, capacity), dtype=np.float32)
            for r, src in enumerate(sel_idx):
                out[r, :len(src)] = arr[src]
            return out

        bx, by = pack(xs), pack(ys)
        bt, bp = pack(ts), pack(ps)
        bmask = np.zeros((R, capacity), np.float32)
        for r, src in enumerate(sel_idx):
            bmask[r, :len(src)] = 1.0
    oy, ox = np.divmod(np.arange(R), nx)
    roi_origins = np.stack([oy * rh, ox * rw], axis=-1)
    overflow = int(np.maximum(counts - capacity, 0).sum())
    out = (jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bt),
           jnp.asarray(bp), jnp.asarray(bmask),
           jnp.asarray(roi_origins), overflow)
    return out + (counts,) if return_counts else out


# Hard memory bound on the overflow-refine tier's per-ROI capacity: beyond
# this, tier-2 itself subsamples (and grid_cmax_batched warns honestly).
OVERFLOW_CAP_MAX = 1 << 17


def _tier2_shapes(max_count: int, n_over: int):
    """Quantize the overflow-refine tier's batch shape to powers of two.

    The tier-2 executable is shape-specialized by jit, and both the
    over-capacity ROI count and the max per-ROI count drift from video
    window to video window (and between a benchmark's warmup scene and its
    timed scene). Fine-grained sizing (multiple-of-512 capacity,
    multiple-of-8 rows — the original scheme) recompiles on nearly every
    such drift, and a recompile through a remote-device link costs seconds
    vs the ~0.05 s refine itself (measured: the r4 bench read 10.7 s
    instead of 0.28 s for exactly this reason). Power-of-two rounding keeps
    one executable live while the true sizes stay within a 2x band, at a
    bounded <=2x padding cost on a tier that is already small.

    Returns ``(cap2, R2)``: per-ROI capacity (a power-of-two multiple of
    512, clamped to ``OVERFLOW_CAP_MAX``) and the padded row count (a power
    of two, min 8).
    """
    cap2 = 512
    while cap2 < max_count:
        cap2 <<= 1
    cap2 = min(cap2, OVERFLOW_CAP_MAX)
    R2 = 8
    while R2 < n_over:
        R2 <<= 1
    return cap2, R2


def _pack_roi_subset(xs, ys, ts, ps, resolution, roi_size, roi_ids,
                     capacity, total_rows,
                     rng: Optional[np.random.Generator] = None):
    """Pack the events of the given global ROI ids into a fixed
    ``(total_rows, capacity)`` batch (rows beyond ``len(roi_ids)`` are
    zero-mask padding so the vmapped solver shape stays stable across
    scenes). The overflow-refine second tier of ``grid_cmax_batched``:
    unlike the tier-1 bucketing this packs only the over-capacity ROIs, at
    a capacity sized to their true counts — matching the reference's exact
    per-ROI event subsets (reference events_cmax.py:53-62) without paying
    max-count capacity for every ROI. ROIs still above ``capacity`` (the
    ``OVERFLOW_CAP_MAX`` bound) are uniformly subsampled; ``overflow``
    counts those events. Returns ``(bx, by, bt, bp, bmask, origins,
    overflow)``.
    """
    H, W = resolution
    rh, rw = roi_size
    ny = (H + rh - 1) // rh
    nx = (W + rw - 1) // rw
    R = ny * nx
    roi_ids = np.asarray(roi_ids, np.int64)
    xs, ys, ts, ps = map(np.asarray, (xs, ys, ts, ps))
    rid = (np.clip(ys.astype(np.int64) // rh, 0, ny - 1) * nx
           + np.clip(xs.astype(np.int64) // rw, 0, nx - 1))
    local = np.full(R, -1, np.int64)
    local[roi_ids] = np.arange(len(roi_ids))
    keep = np.nonzero(local[rid] >= 0)[0]
    loc = local[rid[keep]]
    sort = np.argsort(loc, kind="stable")  # time order preserved per ROI
    order, loc = keep[sort], loc[sort]
    counts = np.bincount(loc, minlength=len(roi_ids))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    overflow = int(np.maximum(counts - capacity, 0).sum())
    if overflow:
        rng = np.random.default_rng(0) if rng is None else rng
        sel = []
        for r in range(len(roi_ids)):
            src = order[starts[r]:starts[r] + counts[r]]
            if len(src) > capacity:
                src = src[np.sort(rng.choice(len(src), capacity,
                                             replace=False))]
            sel.append(src)
        order = (np.concatenate(sel) if sel
                 else np.empty(0, order.dtype))
        counts = np.minimum(counts, capacity)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        loc = np.repeat(np.arange(len(roi_ids)), counts)
    pos = np.arange(len(order)) - starts[loc]
    flat = loc * capacity + pos

    def pack(arr):
        out = np.zeros(total_rows * capacity, dtype=np.float32)
        out[flat] = arr[order]
        return out.reshape(total_rows, capacity)

    bmask = np.zeros(total_rows * capacity, np.float32)
    bmask[flat] = 1.0
    oy, ox = np.divmod(roi_ids, nx)
    origins = np.zeros((total_rows, 2), np.float32)
    origins[:len(roi_ids), 0] = oy * rh
    origins[:len(roi_ids), 1] = ox * rw
    return (jnp.asarray(pack(xs)), jnp.asarray(pack(ys)),
            jnp.asarray(pack(ts)), jnp.asarray(pack(ps)),
            jnp.asarray(bmask.reshape(total_rows, capacity)),
            jnp.asarray(origins), overflow)


_global_motion_cache: dict = {}


def fit_global_motion(xs, ys, ts, ps, img_size, obj=None,
                      blur_sigma: float = 1.0, maxiter: int = 80,
                      gd_lr: float = 4.0, mask=None):
    """Full-frame 4-DoF global motion fit: contrast maximisation under the
    ``xyztheta`` similarity field ``v(x, y) = (vx + s*x - w*y,
    vy + s*y + w*x)`` (translation + divergence + rotation).

    Two stages, one compiled program: a 2-D grid search over pure
    translation (s = w = 0), then normalized-gradient descent over all four
    dims in a SCALED space where one unit of s/w moves a point half a
    sensor diagonal away by ~1 px/s — so a single px/s learning rate serves
    every dim. Returns ``(params (4,), loss)``.

    This is the pyramid's base estimator (``grid_cmax_batched(pyramid>1)``)
    and a capability the reference only gestures at (its ``xyztheta_warp``
    is an unimplemented stub, reference warps.py:63-72).
    """
    obj = variance_objective() if obj is None else obj
    resolution = tuple(int(v) for v in img_size)
    key = (obj.name, _objective_kwargs(obj), resolution, float(blur_sigma),
           int(maxiter), float(gd_lr))
    solve = _global_motion_cache.get(key)
    if solve is None:
        warp = xyztheta_warp()
        loss = make_objective_loss(obj, warp, resolution, blur_sigma)
        r0 = 0.5 * float(np.hypot(*resolution))
        scale = jnp.asarray([1.0, 1.0, 1.0 / r0, 1.0 / r0], jnp.float32)

        def _solve(exs, eys, ets, eps, emask):
            def f_q(q):
                return loss(q * scale, exs, eys, ets, eps, emask)

            def f_trans(v2):
                return f_q(jnp.concatenate([v2, jnp.zeros(2)]))

            # Physical bounds on divergence/rotation per window: variance-
            # style objectives carry a CONCENTRATION bias (a strong spurious
            # contraction keeps all mass in frame and wins on small scenes —
            # the degeneracy pinned in r2's simulator study), so cap the
            # scale change at |s|*dt <= 0.4 and the rotation at
            # |w|*dt <= 1.0 rad over the window.
            any_valid = jnp.any(emask != 0)
            t_hi = jnp.max(jnp.where(emask != 0, ets, -jnp.inf))
            t_lo = jnp.min(jnp.where(emask != 0, ets, jnp.inf))
            dt_w = jnp.where(any_valid, jnp.maximum(t_hi - t_lo, 1e-3), 1.0)
            qmax = jnp.asarray([jnp.inf, jnp.inf, 0.0, 0.0]).at[2].set(
                0.4 / dt_w * r0).at[3].set(1.0 / dt_w * r0)

            q0_t, _ = grid_search_refine(f_trans, 2, init_range=150.0,
                                         num_samples_per_param=5, iters=6)
            q0 = jnp.concatenate([q0_t, jnp.zeros(2)])
            vg = jax.value_and_grad(f_q)

            def step(i, state):
                q, m, best_q, best_v = state
                v, g = vg(q)
                better = v < best_v
                best_q = jnp.where(better, q, best_q)
                best_v = jnp.where(better, v, best_v)
                g = g / (jnp.linalg.norm(g) + 1e-12)
                m = 0.8 * m + g
                lr = gd_lr * 0.5 * (1 + jnp.cos(jnp.pi * i / maxiter))
                return jnp.clip(q - lr * m, -qmax, qmax), m, best_q, best_v

            init = (q0, jnp.zeros_like(q0), q0, f_q(q0))
            q, _, best_q, best_v = jax.lax.fori_loop(0, maxiter, step, init)
            v_final = f_q(q)
            final_better = v_final < best_v
            best_q = jnp.where(final_better, q, best_q)
            best_v = jnp.where(final_better, v_final, best_v)
            return best_q * scale, best_v

        solve = jax.jit(_solve)
        _global_motion_cache[key] = solve

    exs = jnp.asarray(xs, jnp.float32)
    eys = jnp.asarray(ys, jnp.float32)
    ets = jnp.asarray(ts, jnp.float32)
    eps = jnp.asarray(ps, jnp.float32)
    emask = (jnp.ones_like(eps) if mask is None
             else jnp.asarray(mask, jnp.float32))
    return solve(exs, eys, ets, eps, emask)


def xyztheta_velocity_at(params, x, y):
    """The velocity field induced by ``xyztheta`` params at points (x, y):
    ``(vx + s*x - w*y, vy + s*y + w*x)`` — e.g. to seed per-ROI linvel
    solves from a global fit."""
    vx, vy, s, w = (float(params[0]), float(params[1]), float(params[2]),
                    float(params[3]))
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    return np.stack([vx + s * x - w * y, vy + s * y + w * x], axis=-1)


def grid_cmax_batched(xs, ys, ts, ps, roi_size=(20, 20), warp=None,
                      obj=None, min_events: int = 10, img_size=None,
                      blur_sigma: float = 1.0, maxiter: int = 50,
                      capacity: Optional[int] = None,
                      solver: str = "gd", gd_lr: float = 4.0,
                      smooth: Optional[str] = None, x0=None,
                      pyramid=1, trust_radius: Optional[float] = None,
                      overflow_refine: bool = True):
    """All-ROIs-at-once contrast maximisation: one vmapped, jitted solve.

    TPU-first replacement for the reference's Python ROI loop
    (events_cmax.py:53-67): events are bucketed by ROI into fixed-capacity
    batches (subsampled above the capacity cap); a coarse-to-fine grid
    search plus a refine stage runs for *every* ROI in parallel.

    ``pyramid > 1`` runs a spatial coarse-to-fine cascade (linvel warps
    only): level k solves at ``roi_size * 2^k`` — bigger ROIs see more
    structure, so their contrast optimum is better determined on dense
    texture — and each finer level warm-start-refines from its parent ROI's
    (median-smoothed) params instead of its own grid search. Cost is ~0.5x
    extra per level (refines skip the grid search); accuracy on textured
    scenes improves markedly (see cli.eval_cmax --pyramid). NB a caller-
    provided ``x0`` suppresses the cascade entirely (the warm start IS the
    seed): on video, pass ``pyramid`` on the first window and warm-start
    the rest (``cli.stream_flow --pyramid_first``).

    ``pyramid='auto'`` removes the scene-type foreknowledge requirement:
    it computes BOTH fields — the plain per-ROI solve and the
    pyramid-2+median cascade — and selects per ROI by the *local coherence
    of the plain field*: aliased dense-texture optima land incoherently
    across neighboring ROIs (each ROI's broad contrast optimum picks a
    different alias), while a correct field deviates from its neighbor
    median only by the true flow gradient plus solver noise. An ROI whose
    3x3-median deviation exceeds ``AUTO_REL_COH_TAU`` of the local flow
    magnitude takes the pyramid field, and when MOST valid ROIs trip the
    test the whole pyramid field is taken (``AUTO_SCENE_FRAC`` — texture
    aliasing is a scene-global property, and per-ROI mixing there kept
    aliased-but-coherent plain answers worth a measured ~20%). Measured
    (runs/cmax_auto/README.md, three deterministic scenes): auto EQUALS
    the per-scene best of {plain, pyramid2} on the dense-texture scene
    (3.31 px/s median, was 4.02 before the escalation) and on the
    spatially-varying rotating bench scene (3.97, where pyramid2 is 27%
    WORSE than plain), and keeps plain on the sparse scene (0.37 vs
    pyramid's 0.26 — a sub-noise 0.11 px/s concession). Not the default
    because it costs ~2.2x the plain solve and warm-started video paths
    suppress cascades anyway. A caller ``smooth`` re-smooths the mixed
    field.

    ``overflow_refine`` (default True): ROIs holding more events than the
    bucket capacity are first solved on a uniform subsample (tier 1 —
    measured accuracy-neutral for contrast objectives, r2 capacity sweep),
    then re-solved on their FULL event set in a second, smaller batch sized
    to the true max count (warm-started from tier 1, grid search skipped).
    Every event therefore participates in the final answer — matching the
    reference's exact per-ROI subsets (events_cmax.py:53-62) — at ~0.4x of
    tier-1's cost for the overflow rows only, instead of paying max-count
    capacity across all ROIs. The subsampling warning only fires if the
    refine itself hits ``OVERFLOW_CAP_MAX`` (or with
    ``overflow_refine=False``).

    @param solver ``'gd'`` (default): fixed-``maxiter`` normalized-gradient
        descent with momentum — every ROI takes exactly the same compiled
        step count, which maps far better onto lockstep vmapping than
        ``'bfgs'`` (jax BFGS line searches run to the slowest ROI's
        convergence). Both refine the grid-search init inside one basin.
    Returns ``(params (R, dims), rois (R, 4), f_evals (R,), valid (R,))``.
    """
    warp = linvel_warp() if warp is None else warp
    obj = variance_objective() if obj is None else obj
    resolution = infer_resolution(xs, ys) if img_size is None else img_size
    rh, rw = roi_size

    if pyramid == "auto":
        if x0 is not None or not isinstance(warp, linvel_warp):
            pyramid = 1  # warm start / non-linvel: cascade is suppressed
        else:
            # Scene-adaptive per-ROI selection between the two measured-best
            # configurations: the plain per-ROI solve (sparse scenes: each
            # ROI sees a distinct feature, its own optimum is sharp) and the
            # global-fit-seeded pyramid cascade (dense texture: per-ROI
            # contrast optima are broad/aliased and the solve walks into
            # them — VERDICT r3 measured 22.0 px/s median AEE there).
            # Selector: local incoherence of the plain field relative to
            # the local flow magnitude (see AUTO_REL_COH_TAU above).
            common = dict(roi_size=roi_size, warp=warp, obj=obj,
                          min_events=min_events,
                          img_size=tuple(int(v) for v in resolution),
                          blur_sigma=blur_sigma, maxiter=maxiter,
                          capacity=capacity, solver=solver, gd_lr=gd_lr,
                          overflow_refine=overflow_refine,
                          trust_radius=trust_radius)
            p_plain, rois, f_plain, valid = grid_cmax_batched(
                xs, ys, ts, ps, **common)
            p_pyr, _, f_pyr, _ = grid_cmax_batched(
                xs, ys, ts, ps, pyramid=2, smooth="median", **common)
            p_plain, p_pyr = jnp.asarray(p_plain), jnp.asarray(p_pyr)
            ny = (resolution[0] + rh - 1) // rh
            nx = (resolution[1] + rw - 1) // rw
            med = _neighbor_median(p_plain, valid, ny, nx)
            dev = jnp.linalg.norm(p_plain - med, axis=-1)
            coh = _neighbor_median(dev[:, None], valid, ny, nx)[:, 0]
            mag = jnp.linalg.norm(p_plain, axis=-1)
            lmag = _neighbor_median(mag[:, None], valid, ny, nx)[:, 0]
            sel = coh > AUTO_REL_COH_TAU * jnp.maximum(lmag, AUTO_MAG_FLOOR)
            # scene-level escalation (see AUTO_SCENE_FRAC): a mostly-
            # incoherent plain field means global dense-texture aliasing —
            # take the pyramid field wholesale (keeping its median
            # smoothing) rather than per-ROI mixing
            nvalid = jnp.maximum(jnp.sum(valid), 1)
            global_pyr = jnp.sum(sel & valid) > AUTO_SCENE_FRAC * nvalid
            sel = sel | global_pyr
            params = jnp.where(sel[:, None], p_pyr, p_plain)
            f_evals = jnp.where(sel, jnp.asarray(f_pyr),
                                jnp.asarray(f_plain))
            if smooth is not None:
                if smooth != "median":
                    raise ConfigurationError(f"unknown smooth mode "
                                             f"{smooth!r}")
                params = _neighbor_median(params, valid, ny, nx)
            return params, rois, f_evals, valid

    trust_vec = None  # per-ROI L-inf trust radii for the warm refine
    if pyramid > 1 and x0 is None and isinstance(warp, linvel_warp):
        # Coarse level: solve at 2x the ROI size (recursively for deeper
        # pyramids; the base of the recursion seeds from a full-frame 4-DoF
        # global-motion fit), median-smooth, and hand each fine ROI its
        # parent's params as a warm start (the with_x0 refine path below).
        coarse_kw = {}
        if pyramid == 2:
            # Recursion base: fit translation+divergence+rotation over the
            # WHOLE frame (every event versus one sparse ROI's worth), then
            # seed each coarse ROI with the induced velocity at its center.
            # Trust = floor + the field's own variation across a coarse ROI
            # half-diagonal (affine field: exact, location-independent).
            g_params, _gl = fit_global_motion(
                xs, ys, ts, ps, resolution, obj=obj,
                blur_sigma=blur_sigma)
            g_params = np.asarray(g_params)
            nyc2 = (resolution[0] + 2 * rh - 1) // (2 * rh)
            nxc2 = (resolution[1] + 2 * rw - 1) // (2 * rw)
            oy2, ox2 = np.divmod(np.arange(nyc2 * nxc2), nxc2)
            cy2 = oy2 * 2 * rh + rh
            cx2 = ox2 * 2 * rw + rw
            coarse_kw["x0"] = jnp.asarray(
                xyztheta_velocity_at(g_params, cx2, cy2), jnp.float32)
            half_diag = float(np.hypot(rh, rw))
            coarse_kw["trust_radius"] = 3.0 + half_diag * float(
                np.hypot(g_params[2], g_params[3]))
        c_params, _cr, _cf, _cv = grid_cmax_batched(
            xs, ys, ts, ps, roi_size=(rh * 2, rw * 2), warp=warp, obj=obj,
            min_events=min_events, img_size=tuple(resolution),
            blur_sigma=blur_sigma, maxiter=maxiter, capacity=capacity,
            solver=solver, gd_lr=gd_lr, smooth="median",
            pyramid=pyramid - 1, overflow_refine=overflow_refine,
            **coarse_kw)
        ny = (resolution[0] + rh - 1) // rh
        nx = (resolution[1] + rw - 1) // rw
        nyc = (resolution[0] + 2 * rh - 1) // (2 * rh)
        nxc = (resolution[1] + 2 * rw - 1) // (2 * rw)
        iy, ix = np.divmod(np.arange(ny * nx), nx)
        parent = (np.minimum(iy // 2, nyc - 1) * nxc
                  + np.minimum(ix // 2, nxc - 1))
        c_params = np.asarray(c_params)
        x0 = jnp.asarray(c_params[parent])
        if trust_radius is None:
            # ADAPTIVE trust: keep the fine refine near the better-informed
            # coarse seed (unconstrained descent walks into sparse-ROI noise
            # minima — measured), but widen the ball where the coarse field
            # itself varies (rotation/divergence), since there the true fine
            # flow legitimately deviates from the parent. Radius = floor +
            # the 3x3 coarse-neighborhood spread (max component range).
            # geometry: the 3x3 coarse spread covers +-1 coarse ROI = +-4
            # fine half-steps of true field variation, while a fine ROI
            # sits at most 1 fine half-step from its parent's center ->
            # needed radius ~ spread/4 (+ a floor for coarse-field noise)
            cgrid = c_params.reshape(nyc, nxc, -1)
            pad = np.pad(cgrid, ((1, 1), (1, 1), (0, 0)), mode="edge")
            neigh = np.stack([pad[1 + dy:1 + dy + nyc, 1 + dx:1 + dx + nxc]
                              for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
            spread = (neigh.max(axis=0) - neigh.min(axis=0)).max(axis=-1)
            trust_c = 3.0 + 0.25 * spread.reshape(-1)
            trust_vec = jnp.asarray(trust_c[parent], jnp.float32)
        else:
            trust_vec = jnp.full((ny * nx,), float(trust_radius),
                                 jnp.float32)

    bx, by, bt, bp, bmask, origins, overflow, counts = bucket_events_by_roi(
        xs, ys, ts, ps, resolution, roi_size, capacity, return_counts=True)

    solver_key = (type(warp).__name__, obj.name,
                  getattr(obj, "thresh", None), getattr(obj, "p", None),
                  getattr(obj, "adaptive_lifespan", False),
                  getattr(obj, "pixel_crossings", 5),
                  getattr(obj, "minimum_events", 105),
                  tuple(resolution), tuple(roi_size), float(blur_sigma),
                  int(maxiter), solver, float(gd_lr))
    if x0 is not None:
        # Warm start (previous video window's params, or the pyramid's
        # coarse level): skip the grid search and descend from x0 per ROI —
        # ~2x less work per window and temporally coherent fields. The
        # solver takes a traced per-ROI trust radius (inf = unconstrained,
        # the plain temporal-warm-start default), so one executable serves
        # every trust configuration.
        if trust_vec is None:
            trust_vec = jnp.full((origins.shape[0],),
                                 jnp.inf if trust_radius is None
                                 else float(trust_radius), jnp.float32)
        solve = _warm_roi_solver(solver_key, warp, obj, resolution,
                                 roi_size, blur_sigma, maxiter, solver,
                                 gd_lr)
        params, f_evals = solve(bx, by, bt, bp, bmask,
                                jnp.asarray(origins, jnp.float32),
                                jnp.asarray(x0, jnp.float32), trust_vec)
    else:
        solve = _roi_solver_cache.get(solver_key)
        if solve is None:
            solve = _build_roi_solver(warp, obj, tuple(resolution), roi_size,
                                      blur_sigma, maxiter, solver, gd_lr)
            _roi_solver_cache[solver_key] = solve
        params, f_evals = solve(bx, by, bt, bp, bmask,
                                jnp.asarray(origins, jnp.float32))
    valid = jnp.sum(bmask, axis=1) > min_events

    if overflow and overflow_refine:
        # Tier 2: re-solve the over-capacity ROIs on their FULL event sets.
        # One (R2, cap2) batch, both sizes quantized to powers of two
        # (_tier2_shapes) so the executable stays stable across video
        # windows with drifting overflow patterns. Reuses the cached warm
        # solver (with_x0 + traced trust) — the grid search is skipped:
        # tier 1's subsampled answer already found the basin (subsampling
        # is measured accuracy-neutral), the refine polishes it against
        # every event.
        cap_used = int(bx.shape[1])
        counts = np.asarray(counts)
        over = np.nonzero(counts > cap_used)[0]
        cap2, R2 = _tier2_shapes(int(counts[over].max()), len(over))
        if cap2 < cap_used:
            # Caller capacity already exceeds OVERFLOW_CAP_MAX: every
            # overflow row would re-solve on a SMALLER subsample than tier
            # 1 already used — strictly worse. Keep tier 1's answer; the
            # subsampling warning below still fires for these ROIs.
            pass
        else:
            bx2, by2, bt2, bp2, bm2, org2, overflow = _pack_roi_subset(
                xs, ys, ts, ps, resolution, roi_size, over, cap2, R2)
            solve2 = _warm_roi_solver(solver_key, warp, obj, resolution,
                                      roi_size, blur_sigma, maxiter, solver,
                                      gd_lr)
            dims = int(jnp.shape(params)[-1])
            x0_2 = np.zeros((R2, dims), np.float32)
            trust2 = np.full((R2,), np.inf, np.float32)
            if x0 is not None:
                # tier 1 was itself a warm solve: replay it exactly on the
                # full window (same seed, same trust ball)
                x0_2[:len(over)] = np.asarray(x0, np.float32)[over]
                trust2[:len(over)] = np.asarray(trust_vec, np.float32)[over]
            else:
                x0_2[:len(over)] = np.asarray(params, np.float32)[over]
            p2, f2 = solve2(bx2, by2, bt2, bp2, bm2, org2,
                            jnp.asarray(x0_2), jnp.asarray(trust2))
            params = jnp.asarray(params).at[over].set(p2[:len(over)])
            f_evals = jnp.asarray(f_evals).at[over].set(f2[:len(over)])
            # `overflow` is now only what tier 2 itself had to drop (ROIs
            # past OVERFLOW_CAP_MAX) — the warning below fires only for
            # that.

    if smooth is not None:
        if smooth != "median":
            raise ConfigurationError(f"unknown smooth mode {smooth!r}")
        # Post-process (beyond the reference): 3x3 neighbor-median flow
        # smoothing. Per-ROI contrast optima are broad when an ROI sees a
        # partial feature, but true flow fields are locally smooth.
        # MEASURED (simulated GT): on a drifting-texture scene the median
        # field cuts mean AEE 14.9 -> 11.0 px/s (median 12.1 -> 10.7); on
        # the sparse-point rotating bench scene results are mixed (median
        # error improves, border-ROI means can worsen) — hence opt-in.
        # Loss-gated acceptance and descend-from-median re-solves were
        # both measured NOT to help: the per-ROI loss genuinely prefers
        # its broad-optimum answer, so only the pure median field wins.
        ny = (resolution[0] + rh - 1) // rh
        nx = (resolution[1] + rw - 1) // rw
        params = _neighbor_median(jnp.asarray(params), valid, ny, nx)

    rois = jnp.concatenate(
        [origins, jnp.tile(jnp.asarray([[rh, rw]]), (origins.shape[0], 1))],
        axis=-1)
    if overflow:
        # No silent caps: per-ROI uniform subsampling is measured-safe for
        # cmax accuracy (bucket_events_by_roi docstring) but callers
        # deserve to know it happened. With overflow_refine (default) this
        # only fires for ROIs past OVERFLOW_CAP_MAX. warnings dedups by
        # call site, so video loops see this once, not per window.
        import warnings

        warnings.warn(
            f"grid_cmax_batched: {overflow} events beyond the per-ROI "
            f"capacity were uniformly subsampled"
            + (" in the overflow-refine tier (an ROI holds more than "
               f"OVERFLOW_CAP_MAX={OVERFLOW_CAP_MAX} events)"
               if overflow_refine else
               " (raise capacity= or leave overflow_refine on to keep "
               "them)"), RuntimeWarning, stacklevel=2)
    return params, rois, f_evals, valid


def _neighbor_median(params, valid, ny, nx):
    """Per-ROI 3x3 neighbor median of valid params over the (ny, nx) ROI
    grid (row-major), nan-ignoring; ROIs with no valid neighbors keep
    their own params."""
    d = params.shape[-1]
    grid = jnp.where(valid[:, None], params,
                     jnp.nan).reshape(ny, nx, d)
    padded = jnp.pad(grid, ((1, 1), (1, 1), (0, 0)),
                     constant_values=jnp.nan)
    stack = jnp.stack([padded[1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    med = jnp.nanmedian(stack, axis=0).reshape(ny * nx, d)
    return jnp.where(jnp.isnan(med), params, med)


_roi_solver_cache: dict = {}


def _build_roi_solver(warp, obj, resolution, roi_size, blur_sigma, maxiter,
                      solver, gd_lr):
    """Compile the vmapped per-ROI grid-search + refine solver once per
    configuration (rebuilding the jit per call would recompile every time —
    compile over a device tunnel costs seconds)."""
    return jax.jit(jax.vmap(make_roi_solve_one(
        warp, obj, resolution, roi_size, blur_sigma, maxiter, solver,
        gd_lr)))


def _warm_roi_solver(solver_key, warp, obj, resolution, roi_size, blur_sigma,
                     maxiter, solver, gd_lr):
    """Cached warm-start refine solver (``with_x0`` + traced per-ROI trust
    radius) — shared by the temporal/pyramid warm path and the tier-2
    overflow refine, so both always run the same executable."""
    warm_key = solver_key + ("warm-traced",)
    solve = _roi_solver_cache.get(warm_key)
    if solve is None:
        solve = jax.jit(jax.vmap(make_roi_solve_one(
            warp, obj, tuple(resolution), roi_size, blur_sigma,
            maxiter, solver, gd_lr, with_x0=True, trust_radius="traced")))
        _roi_solver_cache[warm_key] = solve
    return solve


def make_roi_solve_one(warp, obj, resolution, roi_size, blur_sigma, maxiter,
                       solver="gd", gd_lr=4.0, with_x0: bool = False,
                       trust_radius=None):
    """Single-ROI solve ``(ex, ey, et, ep, emask, origin) -> (params,
    f_eval)``: patch-matmul loss (every objective), velocity-capped grid
    search, adaptive-lifespan mask, fixed-step refine. vmap it for batched
    solves (grid_cmax_batched) or shard-vmap it across a mesh
    (parallel.sharded_grid_cmax).

    ``with_x0=True`` returns a *refine* variant ``(ex, ey, et, ep, emask,
    origin, x0) -> (params, f_eval)`` that skips the grid search and
    descends from the given start (the neighbor-consensus second stage).
    ``trust_radius`` (refine variant, 'gd' solver): clamp the iterate to an
    L-inf ball of that radius around ``x0`` — a seed from a better-informed
    source (coarser pyramid level / previous window) must not be abandoned
    for a sparse ROI's own noise minimum, which the unconstrained descent
    otherwise reaches (measured: normalized-gradient steps can travel
    ~maxiter*gd_lr/2 px/s from the seed). Pass the string ``'traced'`` for
    a per-ROI radius: the returned function takes one extra trailing
    argument ``trust`` (scalar per ROI; vmap it alongside ``x0``)."""
    use_patch = obj.name in ("variance", "sos", "rms", "soe", "sosa",
                             "isoa", "moa", "r1", "zhu")
    # The patch window must enclose the ROI with warp margin, whatever the
    # caller's roi_size: grow beyond PATCH_DEFAULT in MXU-aligned steps
    # (8 rows / 128 lanes). Without this, ROIs larger than the default
    # patch would silently drop events at zero warp and corrupt the loss.
    patch = (max(PATCH_DEFAULT[0], -(-(roi_size[0] + 32) // 8) * 8),
             max(PATCH_DEFAULT[1], -(-(roi_size[1] + 32) // 128) * 128))
    if use_patch:
        patch_loss = make_patch_loss(
            warp, roi_size, obj, patch=patch, blur_sigma=blur_sigma,
            full_pixels=(resolution[0] + 1) * (resolution[1] + 1))
    else:  # unknown/custom objectives: full-frame loss fallback
        full_loss = make_objective_loss(obj, warp, resolution, blur_sigma)

    adaptive = getattr(obj, "adaptive_lifespan", False)
    pixel_crossings = getattr(obj, "pixel_crossings", 5)
    min_events = getattr(obj, "minimum_events", 105)
    # Velocity search cap: a linvel warp with |v|*dt beyond the patch margin
    # evacuates every event from the patch — a spurious global minimum for
    # mass-losing objectives (isoa/zhu count/timestamp collapse; the sensor
    # boundary plays the same trick on the reference, just further out).
    # Never search params that empty the patch within the ROI's window.
    margin = (min(patch[0] - roi_size[0],
                  patch[1] - roi_size[1]) / 2.0 - 2.0)
    # ROIs approaching the patch size leave no margin: disable the cap
    # rather than searching a degenerate (non-positive) range
    velocity_cap = (use_patch and isinstance(warp, linvel_warp)
                    and margin > 2.0)

    def _finish(ex, ey, et, ep, emask, origin, x0, f_masked, f, trust=None):
        # Adaptive lifespan (reference events_cmax.py:29: grid_cmax uses
        # variance_objective(adaptive_lifespan=True)): after grid init, trim
        # the event window to pixel_crossings/|v| seconds as a mask update
        # so the linearized warp stays valid for fast ROIs.
        refine_mask = emask
        if adaptive:
            # base_mask=emask: bucketed ROI batches are zero-padded at the
            # tail, so lifespan_mask must search over the *valid* prefix
            # (pads sent to +inf) and count valid events for its fallback.
            refine_mask = lifespan_mask(
                et, x0, pixel_crossings, minimum_events=min_events,
                base_mask=emask, drop_last=False)
            # never optimize against an (almost) empty window
            enough = jnp.sum(refine_mask) >= jnp.minimum(
                jnp.sum(emask), float(min_events))
            refine_mask = jnp.where(enough, refine_mask, emask)

        if solver == "bfgs":
            res = jax_minimize(lambda p: f_masked(p, refine_mask), x0,
                               method="BFGS",
                               options={"maxiter": maxiter, "gtol": 1e-6})
            return res.x, f(res.x)

        # normalized-gradient descent with momentum and cosine lr decay:
        # fixed iteration count -> perfectly lockstep under vmap.
        vg = jax.value_and_grad(lambda p: f_masked(p, refine_mask))

        def step(i, state):
            p, m, best_p, best_v = state
            v, g = vg(p)
            better = v < best_v
            best_p = jnp.where(better, p, best_p)
            best_v = jnp.where(better, v, best_v)
            g = g / (jnp.linalg.norm(g) + 1e-12)
            m = 0.8 * m + g
            lr = gd_lr * 0.5 * (1 + jnp.cos(jnp.pi * i / maxiter))
            p = p - lr * m
            if trust is not None:
                p = x0 + jnp.clip(p - x0, -trust, trust)
            return p, m, best_p, best_v

        init = (x0, jnp.zeros_like(x0), x0,
                f_masked(x0, refine_mask))
        p, _, best_p, best_v = jax.lax.fori_loop(0, maxiter, step, init)
        v_final = f_masked(p, refine_mask)
        final_better = v_final < best_v
        best_p = jnp.where(final_better, p, best_p)
        best_v = jnp.where(final_better, v_final, best_v)
        # report the final objective over the FULL window (reference
        # convention: f_eval over all events, events_cmax.py:68-74)
        return best_p, f(best_p)


    def _losses(ex, ey, et, ep, emask, origin):
        """(f_masked, f) for one ROI — the single definition of the
        patch-vs-full loss dispatch shared by the cold-start and both
        warm-refine solvers (they must optimize the identical objective)."""
        def f_masked(p, m):
            if use_patch:
                return patch_loss(p, ex, ey, et, ep, m, origin)
            return full_loss(p, ex, ey, et, ep, m)

        def f(p):
            return f_masked(p, emask)

        return f_masked, f

    def solve_one(ex, ey, et, ep, emask, origin):
        f_masked, f = _losses(ex, ey, et, ep, emask, origin)
        init_range = 150.0
        if velocity_cap:
            any_valid = jnp.any(emask != 0)
            t_last = jnp.max(jnp.where(emask != 0, et, -jnp.inf))
            t_first = jnp.min(jnp.where(emask != 0, et, jnp.inf))
            dt_roi = jnp.where(any_valid, t_last - t_first, 0.0)
            init_range = jnp.minimum(
                150.0, margin / jnp.maximum(dt_roi, 1e-3))

        x0, _ = grid_search_refine(f, warp.dims, init_range=init_range,
                                   num_samples_per_param=5, iters=6)
        return _finish(ex, ey, et, ep, emask, origin, x0, f_masked, f)

    def refine_one(ex, ey, et, ep, emask, origin, x0):
        f_masked, f = _losses(ex, ey, et, ep, emask, origin)
        return _finish(ex, ey, et, ep, emask, origin,
                       jnp.asarray(x0, jnp.float32), f_masked, f,
                       trust=None if trust_radius in (None, "traced")
                       else trust_radius)

    def refine_one_trust(ex, ey, et, ep, emask, origin, x0, trust):
        f_masked, f = _losses(ex, ey, et, ep, emask, origin)
        return _finish(ex, ey, et, ep, emask, origin,
                       jnp.asarray(x0, jnp.float32), f_masked, f,
                       trust=trust)

    if with_x0:
        return refine_one_trust if trust_radius == "traced" else refine_one
    return solve_one


# ---------------------------------------------------------------------------
# dIWE segmentation + diagnostics
# ---------------------------------------------------------------------------

def segmentation_mask_from_d_iwe(d_iwe, th=None):
    """Motion-segmentation mask by percentile thresholding |dIWE|
    (reference events_cmax.py:78-101)."""
    d_iwe = np.asarray(d_iwe)
    th1 = np.percentile(np.abs(d_iwe), 90)
    validx = d_iwe[0].ravel()[np.abs(d_iwe[0].ravel()) > th1]
    validy = d_iwe[1].ravel()[np.abs(d_iwe[1].ravel()) > th1]
    x_c = np.percentile(validx, 95) if validx.size else 0.0
    y_c = np.percentile(validy, 95) if validy.size else 0.0
    thx = x_c if th is None else th
    thy = y_c if th is None else th
    imgx = (d_iwe[0] > thx).astype(int) + (d_iwe[0] < -thx).astype(int)
    imgy = (d_iwe[1] > thy).astype(int) + (d_iwe[1] < -thy).astype(int)
    return np.clip(imgx + imgy, 0, 1)


def draw_objective_function(xs, ys, ts, ps, objective=None, warpfunc=None,
                            x_range=(-200, 200), y_range=(-200, 200),
                            gt=(0, 0), show_gt: bool = True,
                            resolution: float = 20, img_size=(180, 240),
                            show_axes: bool = True, norm_min=None,
                            norm_max=None, show: bool = True,
                            save_path: Optional[str] = None):
    """Sample a 2-DoF objective landscape into a heatmap
    (reference events_cmax.py:103-160) — every sample evaluated in one
    vmapped, jitted batch rather than a Python double loop."""
    import matplotlib
    import matplotlib.pyplot as plt

    objective = variance_objective(minimum_events=1) if objective is None else objective
    warpfunc = linvel_warp() if warpfunc is None else warpfunc
    width = x_range[1] - x_range[0]
    height = y_range[1] - y_range[0]
    imshape = (int(height / resolution + 0.5), int(width / resolution + 0.5))

    vys, vxs = np.meshgrid(np.arange(imshape[0]), np.arange(imshape[1]),
                           indexing="ij")
    coords = np.stack([vxs.ravel() * resolution + x_range[0],
                       vys.ravel() * resolution + y_range[0]], axis=-1)
    vloss = _get_jitted_vmap(objective, warpfunc, tuple(img_size), 0.0)
    dxs = jnp.asarray(xs, jnp.float32)
    dys = jnp.asarray(ys, jnp.float32)
    dts = jnp.asarray(ts, jnp.float32)
    dps = jnp.asarray(ps, jnp.float32)
    evals = vloss(jnp.asarray(coords, jnp.float32), dxs, dys, dts, dps)
    img = -np.asarray(evals).reshape(imshape)

    norm_min = img.min() if norm_min is None else norm_min
    norm_max = img.max() if norm_max is None else norm_max
    img = (img - norm_min) / ((norm_max - norm_min) + 1e-6)

    plt.imshow(img, interpolation="bilinear", cmap="viridis")
    if not show_axes:
        plt.xticks([])
        plt.yticks([])
    else:
        plt.xlabel("$v_x$")
        plt.ylabel("$v_y$")
    if show_gt:
        xloc = ((gt[0] - x_range[0]) / width) * imshape[1]
        yloc = ((gt[1] - y_range[0]) / height) * imshape[0]
        plt.axhline(y=yloc, color="r", linestyle="--")
        plt.axvline(x=xloc, color="r", linestyle="--")
    if save_path is not None:
        plt.savefig(save_path)
    if show:
        plt.show()
    return img


def get_hsv_shifted():
    """Shifted-HSV colormap (Mitrokhin et al.; reference events_cmax.py:14-26)."""
    from matplotlib import cm
    from matplotlib.colors import LinearSegmentedColormap

    hsv = cm.get_cmap("hsv")
    colors = [hsv(np.fmod(i + 0.6666, 1.0)) for i in np.arange(0, 0.6666, 0.01)]
    return LinearSegmentedColormap.from_list("hsv_shifted", colors, N=100)
