"""Parametric motion (warp) models.

Rebuild of reference ``lib/contrast_max/warps.py``. Each model is a *pure
function* ``warp_fn(params, xs, ys, ts, t0) -> (x', y')`` — fully
differentiable, so ``jax.grad``/``jax.jacfwd`` derive every Jacobian the
reference hand-codes — wrapped in a small class carrying ``name``/``dims``
and the reference's ``warp(xs, ys, ts, ps, t0, params, compute_grad)``
call signature (warps.py:22-42) for drop-in familiarity.

The reference declares but never implements ``xyztheta_warp`` and
``pure_rotation_warp`` (warps.py:63-83, bodies are ``pass``); here they are
implemented for real.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Tuple

import jax
import jax.numpy as jnp
from ..errors import RegistryError

Array = jax.Array


class warp_function(ABC):
    """Base class for parametric, differentiable event warps.

    Subclasses implement ``warp_fn``; ``warp`` (reference signature,
    warps.py:22-42) and the per-event Jacobians are derived from it.
    """

    def __init__(self, name: str, dims: int):
        self.name = name
        self.dims = dims

    @abstractmethod
    def warp_fn(self, params: Array, xs: Array, ys: Array, ts: Array,
                t0) -> Tuple[Array, Array]:
        """Pure functional warp: events at ``ts`` moved to reference time
        ``t0`` under motion ``params``. Returns ``(x', y')``."""

    def jacobian(self, params, xs, ys, ts, t0):
        """Per-event Jacobians d(x')/d(params), d(y')/d(params), shape
        ``(dims, N)`` — the layout of reference warps.py:57-60. Derived with
        ``jax.jacfwd`` unless a subclass overrides with an analytic form."""
        params = jnp.asarray(params, jnp.float32)

        def xw(p):
            return self.warp_fn(p, xs, ys, ts, t0)[0]

        def yw(p):
            return self.warp_fn(p, xs, ys, ts, t0)[1]

        jx = jax.jacfwd(xw)(params)  # (N, dims)
        jy = jax.jacfwd(yw)(params)
        return jx.T, jy.T

    def warp(self, xs, ys, ts, ps, t0, params, compute_grad: bool = False):
        """Reference-compatible entry (warps.py:22-42):
        returns ``(x', y', jacobian_x, jacobian_y)``."""
        del ps
        xs = jnp.asarray(xs, jnp.float32)
        ys = jnp.asarray(ys, jnp.float32)
        ts = jnp.asarray(ts, jnp.float32)
        params = jnp.asarray(params, jnp.float32)
        xw, yw = self.warp_fn(params, xs, ys, ts, t0)
        jx, jy = (None, None)
        if compute_grad:
            jx, jy = self.jacobian(params, xs, ys, ts, t0)
        return xw, yw, jx, jy


class linvel_warp(warp_function):
    """Linear-velocity (global optic flow) warp, 2 DoF (warps.py:44-61):
    ``x' = x - (t - t0) * vx``, ``y' = y - (t - t0) * vy``."""

    def __init__(self):
        super().__init__("linvel_warp", 2)

    def warp_fn(self, params, xs, ys, ts, t0):
        dt = ts - t0
        return xs - dt * params[0], ys - dt * params[1]

    def jacobian(self, params, xs, ys, ts, t0):
        # Analytic: dx'/dvx = -(t - t0); dy'/dvy = -(t - t0).
        dt = (jnp.asarray(ts, jnp.float32) - t0)
        zeros = jnp.zeros_like(dt)
        jx = jnp.stack([-dt, zeros])
        jy = jnp.stack([zeros, -dt])
        return jx, jy


class xyztheta_warp(warp_function):
    """4-DoF translation + scale + rotation warp (Mitrokhin et al., 'Event-
    based moving object detection and tracking').

    The reference declares this model but leaves ``warp`` unimplemented
    (warps.py:63-72); this is a real implementation of the linearized 4-DoF
    similarity motion field about the image origin:

        x' = x - dt * (vx + s*x - w*y)
        y' = y - dt * (vy + s*y + w*x)

    with params = (vx, vy, s, w): translation velocity, divergence (expansion
    rate, the 'z' motion) and angular velocity.
    """

    def __init__(self):
        super().__init__("xyztheta_warp", 4)

    def warp_fn(self, params, xs, ys, ts, t0):
        dt = ts - t0
        vx, vy, s, w = params[0], params[1], params[2], params[3]
        xw = xs - dt * (vx + s * xs - w * ys)
        yw = ys - dt * (vy + s * ys + w * xs)
        return xw, yw

    def jacobian(self, params, xs, ys, ts, t0):
        dt = (jnp.asarray(ts, jnp.float32) - t0)
        zeros = jnp.zeros_like(dt)
        jx = jnp.stack([-dt, zeros, -dt * xs, dt * ys])
        jy = jnp.stack([zeros, -dt, -dt * ys, -dt * xs])
        return jx, jy


class pure_rotation_warp(warp_function):
    """Pure-rotation warp: params (cx, cy, w) — center of rotation and
    angular velocity.

    Declared-but-stubbed in the reference (warps.py:74-83, docstring says
    'params x, y, theta'); implemented here exactly: each event is rotated
    about (cx, cy) by the angle accumulated since t0:

        a  = w * (t - t0)
        x' = cx + cos(a)(x - cx) + sin(a)(y - cy)
        y' = cy - sin(a)(x - cx) + cos(a)(y - cy)
    """

    def __init__(self):
        super().__init__("pure_rotation_warp", 3)

    def warp_fn(self, params, xs, ys, ts, t0):
        cx, cy, w = params[0], params[1], params[2]
        a = w * (ts - t0)
        ca, sa = jnp.cos(a), jnp.sin(a)
        rx = xs - cx
        ry = ys - cy
        return cx + ca * rx + sa * ry, cy - sa * rx + ca * ry


# Functional aliases for direct use under jit/vmap.
def linvel_warp_fn(params, xs, ys, ts, t0):
    dt = ts - t0
    return xs - dt * params[0], ys - dt * params[1]


WARP_REGISTRY = {
    "linvel": linvel_warp,
    "linvel_warp": linvel_warp,
    "xyztheta": xyztheta_warp,
    "xyztheta_warp": xyztheta_warp,
    "pure_rotation": pure_rotation_warp,
    "pure_rotation_warp": pure_rotation_warp,
}


def get_warp(name: str) -> warp_function:
    """Explicit registry lookup (replaces the reference's ``eval``-based
    stringly-typed construction, base_dataset.py:190-195)."""
    try:
        return WARP_REGISTRY[name]()
    except KeyError:
        raise RegistryError(
            f"Unknown warp model {name!r}; have {sorted(WARP_REGISTRY)}")
