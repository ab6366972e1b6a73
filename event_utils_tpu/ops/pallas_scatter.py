"""Pallas TPU kernels for event accumulation.

The generic XLA scatter-add tops out around 70 Mev/s on a v5e chip (it
serializes colliding updates). These kernels reformulate accumulation as
**one-hot matmuls on the MXU**: for a chunk of C events with row ids r and
column ids c,

    out += A^T-style product:  out[r, c] += sum_n  w_n [r_n = r][c_n = c]
         = dot( where(iota_H == y, w, 0),  (iota_W == x) )

i.e. a (H, C) x (C, W) matmul of one-hot matrices — dense FLOPs, but they
ride the systolic array at ~10^14 MAC/s instead of the scatter unit's
~10^8 updates/s.

``voxel_matmul`` exploits that event streams are **time-sorted**: a chunk
of consecutive events usually spans at most two temporal bins, so two
matmuls (plus an exact polarity matmul whose residue yields the middle tap
for free) cover the chunk regardless of B; a dynamic bin walk handles the
rare chunk spanning more. The accumulator lives in VMEM across the whole
grid sweep and is written once.

Precision: one-hot entries are exact in bf16; weights are carried either as
a single bf16 factor (~4e-3 relative error) or a hi+lo bf16 pair
(``precision='hilo'``, ~1e-5 relative — the default).

Requires sorted timestamps for the voxel kernel (asserted outside); the
image kernel has no such requirement.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 4096


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _resolve_interpret(interpret):
    """Pallas kernels only compile for TPU; on the CPU backend (tests, fake
    meshes) fall back to the interpreter automatically."""
    if interpret is not None:
        return interpret
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=1)
def _vmem_budget() -> int:
    """Planning budget for kernel working sets, resolved per device at
    runtime. The per-core VMEM of every shipping TPU generation through v5
    is 16 MB (v6e doubles it), but Mosaic's own scratch and double-buffering
    allocations come on top of the model's — planning to HALF the physical
    size is the empirically safe ratio (a 12 MB plan on a 16 MB part still
    produced compile-time OOM at 480x640). Override with
    ``EVENT_UTILS_TPU_VMEM_BUDGET_MB`` when a toolchain/part disagrees."""
    import os

    env = os.environ.get("EVENT_UTILS_TPU_VMEM_BUDGET_MB")
    if env:
        return int(float(env) * 1024 * 1024)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # backend not initialized / no devices
        kind = ""
    physical = 32 if ("v6" in kind or "trillium" in kind) else 16
    return physical * 1024 * 1024 // 2


def _fit_chunk(requested: int, out_bytes: int, per_event_bytes: float,
               minimum: int = 512):
    """Largest power-of-two chunk <= requested whose working set fits the
    VMEM budget; None if even ``minimum`` cannot fit (caller falls back).

    ``per_event_bytes``: bytes of chunk-proportional VMEM (one-hot factor
    matrices + temporaries) per event of chunk.
    """
    budget = _vmem_budget() - out_bytes
    if budget <= 0:
        return None
    minimum = min(minimum, requested)  # honour explicitly small chunks
    chunk = requested
    while chunk >= minimum:
        if chunk * per_event_bytes <= budget:
            return chunk
        chunk //= 2
    return None


def _too_big_warning(kernel: str, shape, fallback: str):
    import warnings

    warnings.warn(
        f"{kernel}: sensor {tuple(shape)} exceeds the VMEM working-set "
        f"budget for the one-hot matmul formulation (its cost also grows "
        f"with pixel count, so the MXU path loses its advantage on large "
        f"sensors); falling back to {fallback}. Pass impl=None to silence.",
        stacklevel=3)


# ---------------------------------------------------------------------------
# Voxel grid: (B, H, W) accumulation of time-sorted events
# ---------------------------------------------------------------------------

def _voxel_kernel(scalars_ref, x_ref, y_ref, t_ref, p_ref, out_ref,
                  *, B, H, W, HP, WP, precision, nch=None):
    # nch=None: 1-D grid over chunks (monolithic sensor). nch=int: 2-D grid
    # (tile, chunk) — program_id(0) is the sensor tile, whose accumulator
    # block out_ref re-initializes at that tile's first chunk; the scalar
    # table is indexed by the flattened chunk id.
    if nch is None:
        i = pl.program_id(0)
        srow = i
    else:
        i = pl.program_id(1)
        srow = pl.program_id(0) * nch + i

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[:]
    y = y_ref[:]
    t = t_ref[:]          # normalized bin coordinate (pads carry -100)
    p = p_ref[:]
    C = x.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (HP, C), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (C, WP), 1)
    int8_mode = precision == "int8"
    oh_dtype = jnp.int8 if int8_mode else jnp.bfloat16
    row_hit = row_iota == y[None, :]                # (HP, C) one-hot rows
    Bx = (col_iota == x[:, None]).astype(oh_dtype)  # (C, WP)

    blo = scalars_ref[srow, 0]
    crosses = scalars_ref[srow, 1]
    span2 = scalars_ref[srow, 2]

    def tap_weight(b):
        """Temporal-bilinear tap weight for (possibly dynamic) bin b."""
        return p * jnp.maximum(0.0, 1.0 - jnp.abs(t - b.astype(jnp.float32)))

    def _dot(Aw, Bm, acc_dtype):
        return jax.lax.dot_general(Aw, Bm, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_dtype)

    def rowfac(w):
        """Weighted row factor via ONE select: fold w straight into the
        one-hot (cheaper than compare -> cast -> multiply, and it avoids
        the int8 path's i32-multiply workaround entirely)."""
        return jnp.where(row_hit, w[None, :], 0).astype(oh_dtype)

    def weighted(w, exact=False):
        if int8_mode:
            # Two-level int8 quantization of w in [-1, 1]:
            #   w ~= q1/127 + q2/(127*254),  |error| <= 1/(2*127*254) ~ 1.6e-5
            # Polarity (exact +-1) folds into q1 as +-127. NB: the MXU's 2x
            # int8 rate is real (192 vs 116 TFLOP/s isolated) but is NOT
            # realized here: the f32-select -> i8 pack of each row factor
            # dominates, netting only ~1.1x over hilo end-to-end, and Mosaic
            # rejects both i8-vector selects (i1-mask relayout) and i8
            # elementwise arith that would avoid the pack (measured r2).
            w127 = w * 127.0
            q1 = jnp.round(w127)
            o1 = _dot(rowfac(q1), Bx, jnp.int32)
            if exact:
                return o1.astype(jnp.float32) * (1.0 / 127.0)
            q2 = jnp.round((w127 - q1) * 254.0)
            o2 = _dot(rowfac(q2), Bx, jnp.int32)
            return (o1.astype(jnp.float32) * (1.0 / 127.0)
                    + o2.astype(jnp.float32) * (1.0 / (127.0 * 254.0)))
        if precision == "hilo" and not exact:
            hi = w.astype(jnp.bfloat16).astype(jnp.float32)
            lo = w - hi
            o = _dot(rowfac(hi), Bx, jnp.float32)
            return o + _dot(rowfac(lo), Bx, jnp.float32)
        return _dot(rowfac(w), Bx, jnp.float32)

    def accum(b, o):
        off = pl.multiple_of(b * HP, 8)
        out_ref[pl.ds(off, HP), :] = out_ref[pl.ds(off, HP), :] + o[:, :W]

    # Temporal-bilinear weights partition polarity: sum_k w_k == ps for every
    # event whose taps stay below B (clipped taps land in the padding bins,
    # which are sliced away). The middle tap is therefore the exact residue
    # of the chunk's total polarity image, and one *exact* +-1 matmul
    # replaces a weighted (hilo: two) matmul:  o1 = M_p - o0 [- o2].
    m_p = weighted(p, exact=True)  # +-1 exact in bf16: one matmul
    o0 = weighted(tap_weight(blo))
    accum(blo, o0)
    resid0 = m_p - o0

    @pl.when((crosses == 0) & (span2 == 0))
    def _():
        accum(blo + 1, resid0)

    @pl.when((crosses == 1) & (span2 == 0))
    def _():
        o2 = weighted(tap_weight(blo + 2))
        accum(blo + 2, o2)
        accum(blo + 1, resid0 - o2)

    # Rare fallback (B comparable to N/chunk): the chunk spans > 2 bins, so
    # walk every covered bin with an explicit weighted matmul.
    @pl.when(span2 == 1)
    def _():
        blast = scalars_ref[srow, 3]

        def body(b, _):
            accum(b, weighted(tap_weight(b)))
            return 0

        jax.lax.fori_loop(blo + 1, jnp.minimum(blast, B - 1) + 2, body, 0)


def voxel_matmul_max_chunk(B: int, sensor_size, requested: int = DEFAULT_CHUNK):
    """Largest chunk for which the voxel kernel's working set fits VMEM;
    None when the sensor is too large for the formulation at any chunk."""
    H, W = sensor_size
    HP = _round_up(H, 8)
    WP = _round_up(W, 128)
    out_bytes = (B + 2) * HP * W * 4
    per_event = 2 * WP + 6 * HP  # Bx one-hot + live row factors (bf16)
    return _fit_chunk(requested, out_bytes, per_event)


@functools.partial(jax.jit, static_argnames=("B", "sensor_size", "chunk",
                                             "precision", "interpret"))
def voxel_matmul(xs, ys, ts, ps, B: int, sensor_size=(180, 240),
                 chunk: int = DEFAULT_CHUNK, precision: str = "hilo",
                 mask=None, t0=None, t1=None,
                 interpret: Optional[bool] = None):
    """(B, H, W) temporally-bilinear voxel grid of *time-sorted* events.

    Matches ``events_to_voxel(..., temporal_bilinear=True)`` (integer
    spatial coordinates) to ``precision``: 'hilo' ~1e-5 relative (2 bf16
    matmuls/tap), 'int8' ~2e-5 (2 int8 matmuls/tap at 2x MXU rate),
    'bf16' ~4e-3 (1 matmul/tap).
    Out-of-image events are dropped; masked events contribute nothing.
    ``interpret`` runs the kernel in the Pallas interpreter (CPU testing).
    """
    H, W = sensor_size
    HP = _round_up(H, 8)
    WP = _round_up(W, 128)
    chunk = voxel_matmul_max_chunk(B, sensor_size, chunk)
    if chunk is None:
        from ..errors import SensorLimitError
        raise SensorLimitError(
            f"voxel_matmul: sensor {sensor_size} x {B} bins exceeds the VMEM "
            "working-set budget; use events_to_voxel (which falls back to "
            "the exact scatter for oversized sensors)")
    xs = jnp.asarray(xs).astype(jnp.int32)
    ys = jnp.asarray(ys).astype(jnp.int32)
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)
    n = xs.shape[0]
    if n == 0:
        # zero grid steps would skip the kernel's program_id(0)-gated
        # accumulator initialization and return uninitialized VMEM
        return jnp.zeros((B, H, W), jnp.float32)

    in_img = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    ps = jnp.where(in_img, ps, 0.0)
    if mask is not None:
        ps = ps * jnp.asarray(mask, jnp.float32)
    xs = jnp.clip(xs, 0, W - 1)
    ys = jnp.clip(ys, 0, H - 1)

    if t0 is None or t1 is None:
        if mask is None:
            tt0, tt1 = ts[0], ts[-1]
        else:
            big = jnp.float32(3.4e38)
            tt0 = jnp.min(jnp.where(mask != 0, ts, big))
            tt1 = jnp.max(jnp.where(mask != 0, ts, -big))
        t0 = tt0 if t0 is None else t0
        t1 = tt1 if t1 is None else t1
    dt = t1 - t0
    t_norm = (ts - t0) / jnp.where(dt == 0, 1.0, dt) * (B - 1)

    # Out-of-window events (possible only under explicit t0/t1 overrides):
    # their outside tap must be DROPPED, but the kernel's residual trick
    # assumes the taps partition the full polarity, and the per-chunk
    # blo/blast classification assumes t_norm within [0, B-1] — an event
    # beyond either edge both leaks mass into a neighbouring real bin and
    # can misclassify its whole chunk (reproduced: a t1 override dumped 496
    # post-window events' full mass into bin B-1). Fold the surviving
    # edge-bin tap weight into ps and pin t_norm to the edge: the edge tap
    # is then exact, the residual 0, and fully-outside events carry ps=0 —
    # matching the exact scatter path and this kernel's own VJP.
    below = t_norm < 0.0
    above = t_norm > (B - 1.0)
    # where (not maximum/clip): lax.max's tie gradient at t_norm == 0 would
    # halve the time cotangent of events exactly at the window start
    ps = jnp.where(below, ps * jnp.maximum(0.0, 1.0 + t_norm), ps)
    ps = jnp.where(above, ps * jnp.maximum(0.0, 1.0 - (t_norm - (B - 1.0))),
                   ps)
    # NB folded weights are fractional, so the kernel's single-matmul
    # "exact mass" m_p truncates them (bf16 / int8-q1); the truncation
    # lands in the residual bin at ~bf16 scale PER FOLDED EVENT (empirical
    # max ~1e-4 of the grid scale — the below-window fold always had this
    # property, and it is orders below the leak these folds prevent).
    t_norm = jnp.where(below, 0.0, t_norm)
    t_norm = jnp.where(above, B - 1.0, t_norm)

    return _voxel_core(xs, ys, t_norm, ps,
                       (B, H, W, HP, WP, chunk, precision,
                        _resolve_interpret(interpret)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _voxel_core(xs, ys, t_norm, ps, cfg):
    """Pallas forward with a gather-based custom VJP.

    The backward of a scatter-add is a gather: grads flow to ``ps`` (tap
    weights) and ``t_norm`` (the temporal bilinear fraction); integer
    coordinates get zero cotangents, like floor() in the scatter
    formulation.
    """
    B, H, W, HP, WP, chunk, precision, interpret = cfg
    pad = (-xs.shape[0]) % chunk
    xs = jnp.pad(xs, (0, pad))
    ys = jnp.pad(ys, (0, pad))
    t_norm = jnp.pad(t_norm, (0, pad), constant_values=-100.0)
    ps = jnp.pad(ps, (0, pad))
    nch = xs.shape[0] // chunk
    t2 = t_norm.reshape(nch, chunk)

    # Per-chunk base bin from the first (smallest) timestamp; pads carry
    # t_norm = -100 and ps = 0 so they never contribute.
    blo = jnp.clip(jnp.floor(t2[:, 0]).astype(jnp.int32), 0, B - 1)
    t_last = jnp.max(jnp.where(t2 > -50.0, t2, -100.0), axis=1)
    blast = jnp.clip(jnp.floor(t_last).astype(jnp.int32), 0, B - 1)
    crosses = (blast == blo + 1).astype(jnp.int32)
    span2 = (blast > blo + 1).astype(jnp.int32)
    scalars = jnp.stack([blo, crosses, span2, blast], axis=1)

    kernel = functools.partial(_voxel_kernel, B=B, H=H, W=W, HP=HP, WP=WP,
                               precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[pl.BlockSpec((chunk,), lambda i, blo: (i,))] * 4,
        out_specs=pl.BlockSpec(((B + 2) * HP, W), lambda i, blo: (0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((B + 2) * HP, W), jnp.float32),
        interpret=interpret,
    )(scalars, xs, ys, t_norm, ps)
    return out.reshape(B + 2, HP, W)[:B, :H]


@functools.partial(jax.jit, static_argnames=("B", "tile", "chunk",
                                             "precision", "interpret"))
def voxel_matmul_tiles(bx, by, bt, bp, B: int, tile, t0, t1, mask=None,
                       chunk: int = DEFAULT_CHUNK, precision: str = "hilo",
                       interpret: Optional[bool] = None):
    """Per-tile voxel grids for pre-bucketed events, ONE kernel launch.

    Inputs are ``(T, cap)`` arrays of tile-LOCAL coordinates with a shared
    global time window ``[t0, t1]`` (each tile's stream must be time-sorted;
    bucketing a sorted stream preserves this). Returns ``(T, B, th, tw)``
    float32 — the caller stitches tiles into the sensor frame.

    This is the large-sensor voxel engine: the one-hot formulation's cost
    per event is ~``6*HP*WP`` FLOPs, so running it per tile keeps the MXU
    rate independent of total sensor size. The 2-D Pallas grid
    ``(tile, chunk)`` keeps ONE launch for the whole sensor: each tile's
    ``(B+2)*HP x W`` accumulator block stays in VMEM across that tile's
    chunk sweep and is flushed once. Forward-only (no custom VJP) — this is
    an ingest-path builder; use ``voxel_matmul`` in loss paths.
    """
    th, tw = tile
    HP = _round_up(th, 8)
    WP = _round_up(tw, 128)
    chunk = voxel_matmul_max_chunk(B, tile, chunk)
    if chunk is None:
        from ..errors import SensorLimitError
        raise SensorLimitError(
            f"voxel_matmul_tiles: tile {tile} x {B} bins exceeds the VMEM "
            "working-set budget; use a smaller tile")
    bx = jnp.asarray(bx).astype(jnp.int32)
    by = jnp.asarray(by).astype(jnp.int32)
    bt = jnp.asarray(bt, jnp.float32)
    bp = jnp.asarray(bp, jnp.float32)
    T, cap = bx.shape
    if cap == 0 or T == 0:
        return jnp.zeros((T, B, th, tw), jnp.float32)

    in_tile = (bx >= 0) & (bx < tw) & (by >= 0) & (by < th)
    bp = jnp.where(in_tile, bp, 0.0)
    if mask is not None:
        bp = bp * jnp.asarray(mask, jnp.float32)
    bx = jnp.clip(bx, 0, tw - 1)
    by = jnp.clip(by, 0, th - 1)

    dt = t1 - t0
    t_norm = (bt - t0) / jnp.where(dt == 0, 1.0, dt) * (B - 1)
    # same edge-fold as voxel_matmul: out-of-window events pin to the edge
    # bin with their surviving tap weight folded into bp
    below = t_norm < 0.0
    above = t_norm > (B - 1.0)
    bp = jnp.where(below, bp * jnp.maximum(0.0, 1.0 + t_norm), bp)
    bp = jnp.where(above,
                   bp * jnp.maximum(0.0, 1.0 - (t_norm - (B - 1.0))), bp)
    t_norm = jnp.where(below, 0.0, t_norm)
    t_norm = jnp.where(above, B - 1.0, t_norm)
    # dead slots (mask 0 / out-of-tile) must not distort the per-chunk bin
    # classification: give them the pad sentinel
    t_norm = jnp.where(bp == 0.0, -100.0, t_norm)

    pad = (-cap) % chunk
    if pad:
        bx = jnp.pad(bx, ((0, 0), (0, pad)))
        by = jnp.pad(by, ((0, 0), (0, pad)))
        t_norm = jnp.pad(t_norm, ((0, 0), (0, pad)), constant_values=-100.0)
        bp = jnp.pad(bp, ((0, 0), (0, pad)))
    capp = cap + pad
    nch = capp // chunk
    t2 = t_norm.reshape(T * nch, chunk)

    # per-chunk base bin; all-pad chunks (t_last sentinel) classify as
    # blo=0/no-cross and contribute nothing (every bp is 0)
    live = t2 > -50.0
    t_first = jnp.min(jnp.where(live, t2, 1e30), axis=1)
    blo = jnp.clip(jnp.floor(jnp.where(t_first > 1e29, 0.0, t_first))
                   .astype(jnp.int32), 0, B - 1)
    t_last = jnp.max(jnp.where(live, t2, -100.0), axis=1)
    blast = jnp.clip(jnp.floor(t_last).astype(jnp.int32), 0, B - 1)
    blast = jnp.maximum(blast, blo)
    crosses = (blast == blo + 1).astype(jnp.int32)
    span2 = (blast > blo + 1).astype(jnp.int32)
    scalars = jnp.stack([blo, crosses, span2, blast], axis=1)

    kernel = functools.partial(_voxel_kernel, B=B, H=th, W=tw, HP=HP, WP=WP,
                               precision=precision, nch=nch)
    flat = lambda a: a.reshape(T * capp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, nch),
        in_specs=[pl.BlockSpec((chunk,),
                               lambda tt, i, blo: (tt * nch + i,))] * 4,
        out_specs=pl.BlockSpec(((B + 2) * HP, tw),
                               lambda tt, i, blo: (tt, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * (B + 2) * HP, tw), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(scalars, flat(bx), flat(by), flat(t_norm), flat(bp))
    return out.reshape(T, B + 2, HP, tw)[:, :B, :th, :]


def _voxel_core_fwd(xs, ys, t_norm, ps, cfg):
    out = _voxel_core(xs, ys, t_norm, ps, cfg)
    return out, (xs, ys, t_norm, ps)


def _voxel_core_bwd(cfg, res, g):
    B, H, W, HP, WP, chunk, precision, interpret = cfg
    xs, ys, t_norm, ps = res
    b0 = jnp.floor(t_norm)
    fb = (t_norm - b0).astype(jnp.float32)
    ib0 = jnp.clip(b0.astype(jnp.int32), -1, B)

    def tap_cot(ib):
        ok = (ib >= 0) & (ib < B)
        return jnp.where(
            ok, g[jnp.clip(ib, 0, B - 1), jnp.clip(ys, 0, H - 1),
                  jnp.clip(xs, 0, W - 1)], 0.0)

    g0 = tap_cot(ib0)        # cotangent at bin floor(t)
    g1 = tap_cot(ib0 + 1)    # cotangent at bin floor(t)+1
    g_ps = (1.0 - fb) * g0 + fb * g1
    g_tnorm = ps * (g1 - g0)
    return None, None, g_tnorm, g_ps


_voxel_core.defvjp(_voxel_core_fwd, _voxel_core_bwd)


# ---------------------------------------------------------------------------
# Event image: (H, W) accumulation, integer or bilinear taps
# ---------------------------------------------------------------------------

def _image_kernel(x_ref, y_ref, w_ref, out_ref, *, H, W, HP, WP, hilo):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[:]
    y = y_ref[:]
    w = w_ref[:]
    C = x.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (HP, C), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (C, WP), 1)
    A = (row_iota == y[None, :]).astype(jnp.bfloat16)
    Bx = (col_iota == x[:, None]).astype(jnp.bfloat16)
    if hilo:
        hi = w.astype(jnp.bfloat16)
        lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        Ah = A * hi[None, :]
        Al = A * lo[None, :]
        o = jax.lax.dot_general(Ah, Bx, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o + jax.lax.dot_general(Al, Bx, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    else:
        Aw = A * w.astype(jnp.bfloat16)[None, :]
        o = jax.lax.dot_general(Aw, Bx, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    out_ref[:, :] = out_ref[:, :] + o[:H, :W]


@functools.partial(jax.jit, static_argnames=("shape", "chunk", "precision",
                                             "interpret"))
def image_matmul(ix, iy, w, shape: Tuple[int, int],
                 chunk: int = DEFAULT_CHUNK, precision: str = "hilo",
                 interpret: Optional[bool] = None):
    """(H, W) integer scatter-add via one-hot matmul.

    Drop-in fast path for ``scatter_add_2d`` on TPU; out-of-range ids must
    carry weight 0 (callers mask first). Unsorted events are fine.
    """
    H, W = shape
    HP = _round_up(H, 8)
    WP = _round_up(W, 128)
    ix = jnp.asarray(ix).astype(jnp.int32)
    iy = jnp.asarray(iy).astype(jnp.int32)
    w = jnp.asarray(w, jnp.float32)
    # VMEM working-set guard (row one-hot grows with H): oversized shapes
    # fall back to the exact scatter instead of a Mosaic compile failure
    fitted = _fit_chunk(chunk, HP * W * 4, 6 * HP + 2 * WP)
    if fitted is None:
        from .scatter import scatter_add_2d
        _too_big_warning("image_matmul", shape, "exact XLA scatter")
        # impl pinned: with the global default set to 'pallas', impl=None
        # would route straight back here (infinite mutual recursion)
        return scatter_add_2d(ix, iy, w, shape, impl="xla")
    chunk = fitted
    n = ix.shape[0]
    if n == 0:
        # zero grid steps would skip the program_id(0)-gated zeroing
        return jnp.zeros((H, W), jnp.float32)
    pad = (-n) % chunk
    ix = jnp.pad(ix, (0, pad), constant_values=-1)
    iy = jnp.pad(iy, (0, pad), constant_values=-1)
    w = jnp.pad(w, (0, pad))
    nch = ix.shape[0] // chunk

    kernel = functools.partial(_image_kernel, H=H, W=W, HP=HP, WP=WP,
                               hilo=(precision == "hilo"))
    out = pl.pallas_call(
        kernel,
        grid=(nch,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,))] * 3,
        out_specs=pl.BlockSpec((H, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(ix, iy, w)
    return out


def _bilinear_kernel(x0_ref, x1_ref, y0_ref, dy_ref, w0_ref, w1_ref, out_ref,
                     *, K, H, W, HP, WP, hilo):
    """4-tap bilinear scatter of K weight channels sharing coordinates.

    Row pairs factorize the 4 taps into ONE matmul per channel:
      A = O(y0)*(1-dy) + O(y0+1)*dy            (HP, C) row factor, shared
      V_k = C(x0)*w_k(1-dx) + C(x0+1)*w_k dx   (C, WP) column factor
      out_k += A @ V_k
    The (K*HP, W) accumulator stays in VMEM across the whole event sweep.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x0 = x0_ref[:]
    x1 = x1_ref[:]
    y0 = y0_ref[:]
    dy = dy_ref[:]
    C = x0.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (HP, C), 0)
    colT_iota = jax.lax.broadcasted_iota(jnp.int32, (WP, C), 0)
    O0 = (row_iota == y0[None, :]).astype(jnp.bfloat16)
    O1 = (row_iota == (y0 + 1)[None, :]).astype(jnp.bfloat16)
    # Column one-hots built TRANSPOSED — (WP, C) — so per-event weights
    # broadcast along [None, :] (Mosaic rejects (C,) -> (C, 1) reshapes);
    # the matmul contracts dim 1 of both operands: out = A @ V^T.
    Ct0 = (colT_iota == x0[None, :]).astype(jnp.bfloat16)
    Ct1 = (colT_iota == x1[None, :]).astype(jnp.bfloat16)

    def dot_t(A, Vt):
        return jax.lax.dot_general(A, Vt, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    ay = 1.0 - dy
    if hilo:
        ah = ay.astype(jnp.bfloat16)
        bh = dy.astype(jnp.bfloat16)
        al = (ay - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bl = (dy - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        Ah = O0 * ah[None, :] + O1 * bh[None, :]
        Al = O0 * al[None, :] + O1 * bl[None, :]
    else:
        Ah = O0 * ay.astype(jnp.bfloat16)[None, :] \
            + O1 * dy.astype(jnp.bfloat16)[None, :]

    for k in range(K):
        w0 = w0_ref[0, k, :]
        w1 = w1_ref[0, k, :]
        off = k * HP
        if hilo:
            w0h = w0.astype(jnp.bfloat16)
            w1h = w1.astype(jnp.bfloat16)
            w0l = (w0 - w0h.astype(jnp.float32)).astype(jnp.bfloat16)
            w1l = (w1 - w1h.astype(jnp.float32)).astype(jnp.bfloat16)
            Vth = Ct0 * w0h[None, :] + Ct1 * w1h[None, :]
            o = dot_t(Ah, Vth)
            o = o + dot_t(Ah, Ct0 * w0l[None, :] + Ct1 * w1l[None, :])
            o = o + dot_t(Al, Vth)
        else:
            o = dot_t(Ah, Ct0 * w0.astype(jnp.bfloat16)[None, :]
                      + Ct1 * w1.astype(jnp.bfloat16)[None, :])
        out_ref[pl.ds(off, HP), :] = out_ref[pl.ds(off, HP), :] + o[:, :W]


# The bilinear kernel keeps 4 one-hot matrices + hilo temporaries in VMEM;
# chunk 4096 overflows the 16 MB scoped limit at 180x240, 2048 fits.
BILINEAR_CHUNK = 2048


@functools.partial(jax.jit, static_argnames=("shape", "chunk", "precision",
                                             "interpret"))
def bilinear_matmul(x, y, w, shape: Tuple[int, int],
                    mask=None, chunk: int = BILINEAR_CHUNK,
                    precision: str = "hilo",
                    interpret: Optional[bool] = None):
    """(H, W) or (K, H, W) 4-tap bilinear scatter-add, Pallas MXU kernel.

    The TPU-native hot path of the reference's ``interpolate_to_image``
    (image.py:102-115): float coords, K weight channels sharing coordinates
    (IWE: K=1; timestamp image: K=4; Jacobian stacks: K=D). Out-of-image
    taps are dropped. Differentiable in ``x``, ``y`` and ``w`` via a
    gather-based custom VJP (the adjoint of a bilinear scatter is a bilinear
    gather). Precision: 'hilo' ~1e-5 relative, 'bf16' ~2e-3.
    """
    H, W = shape
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    single = w.ndim == 1
    w2 = w[None, :] if single else w
    K = w2.shape[0]
    if mask is not None:
        w2 = w2 * jnp.asarray(mask, jnp.float32)[None, :]
    HP = _round_up(H, 8)
    WP = _round_up(W, 128)
    # VMEM-aware chunk; oversized sensors fall back to the exact scatter
    # (the one-hot formulation's cost grows with pixel count anyway)
    fitted = _fit_chunk(chunk, K * HP * W * 4, 4 * WP + 8 * HP)
    if fitted is None:
        from .scatter import bilinear_scatter
        _too_big_warning("bilinear_matmul", shape, "exact XLA scatter")
        out = jnp.stack([bilinear_scatter(x, y, w2[k], shape)
                         for k in range(K)])
        return out[0] if single else out
    if x.shape[0] == 0:
        # zero grid steps would skip the program_id(0)-gated zeroing
        out = jnp.zeros((K, H, W), jnp.float32)
        return out[0] if single else out
    out = _bilinear_core(x, y, w2,
                         (H, W, K, fitted, precision,
                          _resolve_interpret(interpret)))
    return out[0] if single else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bilinear_core(x, y, w, cfg):
    H, W, K, chunk, precision, interpret = cfg
    HP = _round_up(H, 8)
    WP = _round_up(W, 128)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    okx0 = (ix0 >= 0) & (ix0 < W)
    okx1 = (ix0 + 1 >= 0) & (ix0 + 1 < W)
    oky = (iy0 + 1 >= 0) & (iy0 < H)
    w0 = jnp.where((okx0 & oky)[None, :], w * (1 - dx)[None, :], 0.0)
    w1 = jnp.where((okx1 & oky)[None, :], w * dx[None, :], 0.0)
    ix1 = jnp.clip(ix0 + 1, 0, W - 1)
    ix0 = jnp.clip(ix0, 0, W - 1)

    n = x.shape[0]
    pad = (-n) % chunk

    def padded(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill)

    def padded_k(a):
        a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(K, -1, chunk).transpose(1, 0, 2)  # (nch, K, chunk)

    ix0c = padded(ix0)
    ix1c = padded(ix1)
    iy0c = padded(iy0, -10)
    dyc = padded(dy.astype(jnp.float32), 0.0)
    w0c = padded_k(w0)
    w1c = padded_k(w1)
    nch = ix0c.shape[0] // chunk

    kernel = functools.partial(_bilinear_kernel, K=K, H=H, W=W, HP=HP, WP=WP,
                               hilo=(precision == "hilo"))
    out = pl.pallas_call(
        kernel,
        grid=(nch,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,))] * 4
        + [pl.BlockSpec((1, K, chunk), lambda i: (i, 0, 0))] * 2,
        out_specs=pl.BlockSpec((K * HP, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K * HP, W), jnp.float32),
        interpret=interpret,
    )(ix0c, ix1c, iy0c, dyc, w0c, w1c)
    return out.reshape(K, HP, W)[:, :H, :]


def _bilinear_core_fwd(x, y, w, cfg):
    out = _bilinear_core(x, y, w, cfg)
    return out, (x, y, w)


def _bilinear_core_bwd(cfg, res, g):
    """Adjoint of the 4-tap scatter: bilinear gather of the cotangent image
    at each event's taps (exactly the scatter formulation's VJP)."""
    H, W, K, chunk, precision, interpret = cfg
    x, y, w = res
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    def tap(ox, oy):
        ix = ix0 + ox
        iy = iy0 + oy
        ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        v = g[:, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)]  # (K, N)
        return jnp.where(ok[None, :], v, 0.0)

    g00 = tap(0, 0)
    g01 = tap(1, 0)
    g10 = tap(0, 1)
    g11 = tap(1, 1)
    g_w = ((1 - dx) * (1 - dy))[None] * g00 + (dx * (1 - dy))[None] * g01 \
        + ((1 - dx) * dy)[None] * g10 + (dx * dy)[None] * g11
    g_x = jnp.sum(w * ((1 - dy)[None] * (g01 - g00) + dy[None] * (g11 - g10)),
                  axis=0)
    g_y = jnp.sum(w * ((1 - dx)[None] * (g10 - g00) + dx[None] * (g11 - g01)),
                  axis=0)
    return g_x, g_y, g_w


_bilinear_core.defvjp(_bilinear_core_fwd, _bilinear_core_bwd)


def scatter_add_flat_pallas(idx, w, num_buckets: int,
                            chunk: int = DEFAULT_CHUNK,
                            precision: str = "hilo"):
    """Flat scatter via the image kernel: buckets viewed as a 2-D grid."""
    W = 128
    H = _round_up(num_buckets, W) // W
    idx = jnp.asarray(idx, jnp.int32)
    ok = (idx >= 0) & (idx < num_buckets)
    idx = jnp.where(ok, idx, 0)
    w = jnp.where(ok, jnp.asarray(w, jnp.float32), 0.0)
    img = image_matmul(idx % W, idx // W, w, (H, W), chunk=chunk,
                       precision=precision)
    return img.reshape(-1)[:num_buckets]
