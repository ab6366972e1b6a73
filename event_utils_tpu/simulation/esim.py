"""ESIM-style event-camera simulator (TPU-native).

New capability with no reference counterpart (the reference assumes
pre-recorded files, README.md:16-27): generates realistic event streams
*with exact ground truth* (frames, dense flow, motion parameters) so the
whole pipeline — packagers (`data_formats/event_packagers.py`), loaders,
voxelization, contrast maximisation, training — can be exercised end to end
on sensor-like data even where no datasets are mounted.

Model (the standard simulator contract, after Rebecq et al.'s ESIM): per
pixel, the log intensity ``L = log(I + eps)`` is tracked against a reference
level ``L_ref``; whenever ``|L(t) - L_ref|`` crosses the contrast threshold
``C`` an event fires with the crossing's sign, the timestamp linearly
interpolated between the bracketing frames, and ``L_ref`` moves to the
crossed level. Supported sensor non-idealities: per-pixel threshold
mismatch (log-normal around ``c_pos``/``c_neg``), a refractory period,
additive log-intensity noise, and background activity — Poisson ON "leak"
events, random-polarity shot noise, and stuck-ON hot pixels (v2e-style,
independent of the crossing dynamics).

TPU-first design: frames are consumed by one ``lax.scan`` over frame pairs
inside ``jit``; every pixel emits into ``K`` static event slots per
interval (validity-masked — the same capacity-padding idiom the rest of the
framework uses), so the hot loop is pure vectorized VPU work with no
data-dependent shapes. Host code only compacts the padded blocks into a
sorted stream. Long sequences stream through in fixed-size frame chunks
(one compiled program, state carried across chunks, device memory bounded
by the chunk size).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ConfigurationError

Array = jax.Array


# ---------------------------------------------------------------------------
# Scene synthesis: smooth textures + parametric camera/scene motions
# ---------------------------------------------------------------------------

def smooth_texture(key: Array, shape: Tuple[int, int], octaves: int = 3,
                   contrast: float = 0.9) -> Array:
    """Multi-octave smooth random intensity texture in ``[1-contrast, 1]``.

    Sums bilinearly-upsampled random grids (period halving per octave) —
    cheap band-limited structure so simulated edges move sub-pixel-smoothly
    (hard noise would alias under `map_coordinates` sampling).
    """
    H, W = shape
    acc = jnp.zeros((H, W), jnp.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        key, sub = jax.random.split(key)
        gh = max(2, H // (2 ** (octaves - o + 1)))
        gw = max(2, W // (2 ** (octaves - o + 1)))
        grid = jax.random.uniform(sub, (gh, gw))
        acc = acc + amp * jax.image.resize(grid, (H, W), "bilinear")
        total += amp
        amp *= 0.5
    acc = acc / total
    lo, hi = acc.min(), acc.max()
    unit = (acc - lo) / jnp.maximum(hi - lo, 1e-6)
    return (1.0 - contrast) + contrast * unit


@dataclass
class Scene:
    """A renderable moving scene: intensity frames + ground-truth flow.

    ``render(t) -> (H, W)`` intensity in (0, 1];
    ``flow(t) -> (2, H, W)`` TRUE forward optic flow (u, v) in px/s — the
    image motion of scene features, the convention `contrast_max` recovers
    and `contrast_flow_loss` trains EVFlowNet to emit. NB
    `transforms.optic_flow.warp_events_flow` is reference-faithful and
    advects *backward*: motion-compensating these events requires passing
    ``-flow`` to it (see its docstring);
    ``params`` the motion ground truth in `models.warps` parameter layout.
    """
    render: Callable[[Array], Array]
    flow: Callable[[Array], Array]
    params: np.ndarray
    shape: Tuple[int, int]


def translating_scene(texture: Array, velocity: Tuple[float, float]) -> Scene:
    """Texture drifting at constant ``velocity = (vx, vy)`` px/s.

    ``I(x, y, t) = T(x - vx*t, y - vy*t)`` (wrapped), so the image motion —
    and the `linvel_warp` optimum `contrast_max` should recover — is exactly
    ``(vx, vy)`` everywhere.
    """
    texture = jnp.asarray(texture, jnp.float32)
    H, W = texture.shape
    vx, vy = float(velocity[0]), float(velocity[1])
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def render(t):
        return jax.scipy.ndimage.map_coordinates(
            texture, [yy - vy * t, xx - vx * t], order=1, mode="wrap")

    def flow(t):
        return jnp.stack([jnp.full((H, W), vx), jnp.full((H, W), vy)])

    return Scene(render, flow, np.array([vx, vy], np.float64), (H, W))


def rotating_scene(texture: Array, omega: float,
                   center: Optional[Tuple[float, float]] = None) -> Scene:
    """Texture rotating at ``omega`` rad/s about ``center = (cx, cy)``.

    Flow at (x, y) is ``(-omega*(y-cy), omega*(x-cx))`` — the
    `pure_rotation_warp` ground truth.
    """
    texture = jnp.asarray(texture, jnp.float32)
    H, W = texture.shape
    cx, cy = center if center is not None else ((W - 1) / 2.0, (H - 1) / 2.0)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def render(t):
        # Pixel (x, y) at time t shows the texture point that started at
        # R(-omega*t) (x - c): sample the initial texture there.
        a = -omega * t
        ca, sa = jnp.cos(a), jnp.sin(a)
        dx, dy = xx - cx, yy - cy
        return jax.scipy.ndimage.map_coordinates(
            texture, [cy + sa * dx + ca * dy, cx + ca * dx - sa * dy],
            order=1, mode="wrap")

    def flow(t):
        return jnp.stack([-omega * (yy - cy), omega * (xx - cx)])

    return Scene(render, flow, np.array([cx, cy, omega], np.float64), (H, W))


def affine_scene(texture: Array, divergence: float = 0.0, omega: float = 0.0,
                 center: Optional[Tuple[float, float]] = None) -> Scene:
    """Texture expanding at rate ``divergence`` (1/s) while rotating at
    ``omega`` (rad/s) about ``center`` — the motion field of the 4-DoF
    `models.warps.xyztheta_warp` (flow ``s·(x-c) + ω·J(x-c)``).

    ``params`` is the xyztheta ground truth about the image origin:
    ``(vx, vy, s, ω)`` with ``vx = -s·cx + ω·cy``, ``vy = -s·cy - ω·cx``.
    """
    texture = jnp.asarray(texture, jnp.float32)
    H, W = texture.shape
    cx, cy = center if center is not None else ((W - 1) / 2.0, (H - 1) / 2.0)
    s, w = float(divergence), float(omega)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def render(t):
        # Trajectories are exponential spirals x(t) = c + e^{st} R(wt)(p-c);
        # invert to sample the initial texture.
        scale = jnp.exp(-s * t)
        ca, sa = jnp.cos(w * t), jnp.sin(w * t)
        dx, dy = xx - cx, yy - cy
        return jax.scipy.ndimage.map_coordinates(
            texture, [cy + scale * (-sa * dx + ca * dy),
                      cx + scale * (ca * dx + sa * dy)],
            order=1, mode="wrap")

    def flow(t):
        dx, dy = xx - cx, yy - cy
        return jnp.stack([s * dx - w * dy, s * dy + w * dx])

    gt = np.array([-s * cx + w * cy, -s * cy - w * cx, s, w], np.float64)
    return Scene(render, flow, gt, (H, W))


# ---------------------------------------------------------------------------
# The simulator core
# ---------------------------------------------------------------------------

@dataclass
class SimulatorConfig:
    """Sensor model parameters (defaults are DAVIS-like)."""
    c_pos: float = 0.25          # positive contrast threshold (log units)
    c_neg: float = 0.25          # negative contrast threshold
    sigma_c: float = 0.0         # per-pixel threshold mismatch (log-normal σ)
    refractory: float = 0.0      # seconds a pixel is dead after an event
    noise_std: float = 0.0       # additive log-intensity noise per frame
    log_eps: float = 1e-3        # L = log(I + log_eps)
    max_events_per_pixel: int = 8  # K static slots per pixel per frame pair
    chunk: int = 64              # frame pairs per compiled scan
    # Background activity (spurious events independent of the signal):
    leak_rate_hz: float = 0.0    # per-pixel Poisson rate of ON leak events
    shot_rate_hz: float = 0.0    # per-pixel random-polarity shot noise rate
    hot_pixel_fraction: float = 0.0  # fraction of pixels that are "hot"
    hot_pixel_rate_hz: float = 100.0  # per-hot-pixel extra ON-leak rate
    max_noise_events_per_pixel: int = 4  # Kn noise slots per pixel/interval

    def has_noise_events(self) -> bool:
        return (self.leak_rate_hz > 0.0 or self.shot_rate_hz > 0.0
                or (self.hot_pixel_fraction > 0.0
                    and self.hot_pixel_rate_hz > 0.0))


@dataclass
class SimulatedEvents:
    """Compacted, time-sorted event stream + per-run statistics.

    ``stats['dropped']`` counts suppressed firing *attempts* (capacity
    overflow plus refractory gating); a refractory-blocked crossing retries
    every interval until its pixel wakes, so the count can exceed the
    number of distinct crossings lost.

    ``labels`` (only when background activity is enabled, else ``None``)
    tags each event 0 = genuine contrast crossing, 1 = noise (leak/shot/
    hot-pixel) — exact ground truth for scoring denoisers
    (:func:`ops.denoise.background_activity_filter`).
    """
    xs: np.ndarray
    ys: np.ndarray
    ts: np.ndarray
    ps: np.ndarray
    stats: Dict[str, int] = field(default_factory=dict)
    labels: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.ts)


def _threshold_maps(key: Optional[Array], shape, cfg: SimulatorConfig):
    cp = jnp.full(shape, cfg.c_pos, jnp.float32)
    cn = jnp.full(shape, cfg.c_neg, jnp.float32)
    if cfg.sigma_c > 0.0:
        if key is None:
            raise ConfigurationError(
                "sigma_c > 0 requires an explicit PRNG key")
        kp, kn = jax.random.split(key)
        cp = cp * jnp.exp(cfg.sigma_c * jax.random.normal(kp, shape))
        cn = cn * jnp.exp(cfg.sigma_c * jax.random.normal(kn, shape))
    # A threshold below ~1e-2 log units fires unphysically often and can
    # overflow any static K; clamp like real simulators do.
    return jnp.maximum(cp, 1e-2), jnp.maximum(cn, 1e-2)


def hot_pixel_map(key: Array, shape: Tuple[int, int],
                  cfg: SimulatorConfig) -> Array:
    """The ``(H, W)`` bool map of hot pixels for a given run ``key``.

    Deterministic per key — the same map :func:`simulate_events` /
    :func:`simulate_events_device` use internally, exposed so tests (and
    denoising evaluations against ``utils.event_util.remove_hot_pixels``)
    can recover the planted ground truth.
    """
    k_hot, _ = jax.random.split(_noise_events_key(key))
    return jax.random.bernoulli(k_hot, cfg.hot_pixel_fraction, shape)


def _noise_events_key(key: Array) -> Array:
    # fold_in (not a wider split) so the historical thresh/noise streams
    # stay bit-identical when noise events are disabled.
    return jax.random.fold_in(jnp.asarray(key), 0x6e73)


def _validate_noise_cfg(cfg: SimulatorConfig, key) -> None:
    if (cfg.leak_rate_hz < 0.0 or cfg.shot_rate_hz < 0.0
            or cfg.hot_pixel_rate_hz < 0.0
            or not 0.0 <= cfg.hot_pixel_fraction <= 1.0):
        raise ConfigurationError(
            "leak_rate_hz/shot_rate_hz/hot_pixel_rate_hz must be >= 0 and "
            "hot_pixel_fraction within [0, 1]")
    if cfg.has_noise_events() and key is None:
        raise ConfigurationError(
            "leak/hot-pixel noise events require an explicit PRNG key")


def _check_noise_capacity(cfg: SimulatorConfig, dt_max: float) -> None:
    """Fail loudly when the static noise-slot capacity cannot hold the
    configured background activity.

    Noise events draw ``min(Poisson(rate·dt), Kn)`` per pixel per frame
    interval; a λ near/above Kn silently tail-truncates the noise process.
    Keeping Kn identical between the host and device paths is what makes
    their streams bit-comparable (same PRNG draw shapes), so Kn is never
    auto-resized — the check demands an explicit config instead.
    """
    rate_max = cfg.leak_rate_hz + cfg.shot_rate_hz + (
        cfg.hot_pixel_rate_hz if cfg.hot_pixel_fraction > 0.0 else 0.0)
    lam = rate_max * float(dt_max)
    need = lam + 4.0 * np.sqrt(lam) + 1.0  # P(Poisson(λ) > need) ~ 3e-5
    if need > cfg.max_noise_events_per_pixel:
        raise ConfigurationError(
            f"max_noise_events_per_pixel={cfg.max_noise_events_per_pixel} "
            f"cannot hold the configured background activity (up to "
            f"λ={lam:.1f} noise events per pixel per frame interval): "
            f"raise it to >= {int(np.ceil(need))} or increase the frame "
            "rate")


def _noise_rate_maps(key: Array, shape, cfg: SimulatorConfig):
    """Per-pixel noise-event Poisson rate + ON-polarity probability.

    Background-activity model (v2e-style, independent of the crossing
    dynamics): every pixel leaks ON events at ``leak_rate_hz`` (the DVS
    reset-switch junction leak — ON-polarity by construction) and fires
    random-polarity shot noise at ``shot_rate_hz``; a random
    ``hot_pixel_fraction`` of pixels carries ``hot_pixel_rate_hz`` of
    EXTRA leak (hot pixels are the extreme-leak tail, so they read as
    stuck-ON — exactly what count-based denoisers like
    ``utils.event_util.remove_hot_pixels`` key on). The per-event ON
    probability of the mixture is ``(leak + hot + shot/2) / total``.
    """
    k_hot, k_slots = jax.random.split(_noise_events_key(key))
    hot = (jax.random.bernoulli(k_hot, cfg.hot_pixel_fraction, shape)
           .astype(jnp.float32) * cfg.hot_pixel_rate_hz
           if cfg.hot_pixel_fraction > 0.0 else jnp.zeros(shape, jnp.float32))
    rate = cfg.leak_rate_hz + cfg.shot_rate_hz + hot
    p_on = jnp.where(
        rate > 0.0,
        (cfg.leak_rate_hz + hot + 0.5 * cfg.shot_rate_hz)
        / jnp.maximum(rate, 1e-30),
        1.0)
    return rate, p_on, k_slots


@lru_cache(maxsize=None)
def _compiled_noise(Kn: int):
    """Jitted noise-event sampler: (interval indices, bounds) -> slots.

    Each frame interval draws ``n ~ min(Poisson(rate·dt), Kn)`` spurious
    events per pixel at uniform times inside the interval — the same
    static-slot/validity-mask idiom as the crossing scan, so shapes stay
    compile-time constant. Keys fold in the ABSOLUTE interval index, making
    the stream invariant to the host path's chunking.
    """

    @jax.jit
    def run(k_slots, idx, t0s, t1s, rate, p_on):
        def one(i, t0, t1):
            k = jax.random.fold_in(k_slots, i)
            k1, k2, k3 = jax.random.split(k, 3)
            dt = t1 - t0
            n = jnp.minimum(jax.random.poisson(k1, rate * dt), Kn)
            valid = jnp.arange(Kn)[None, None, :] < n[..., None]
            u = jax.random.uniform(k2, rate.shape + (Kn,))
            t = (t0 + u * dt).astype(jnp.float32)
            on = jax.random.uniform(k3, rate.shape + (Kn,)) < p_on[..., None]
            sign = jnp.where(on, 1, -1).astype(jnp.int8)
            return t, valid, sign

        return jax.vmap(one)(idx, t0s, t1s)

    return run


@lru_cache(maxsize=None)
def _compiled_scan(K: int, rho: float):
    """Jitted (state, frame-pair chunk) -> event-block scan, cached per
    (capacity, refractory) so repeated `simulate_events` calls reuse the
    executable."""

    def make_step(cp, cn):
        def step(state, inp):
            L_ref, t_last = state
            L0, L1, t0, t1 = inp                   # (H, W), (H, W), (), ()
            dL = L1 - L_ref
            sign = jnp.where(dL >= 0, 1.0, -1.0)
            C = jnp.where(dL >= 0, cp, cn)
            n = jnp.floor(jnp.abs(dL) / C).astype(jnp.int32)
            overflow = jnp.maximum(n - K, 0)
            n = jnp.minimum(n, K)
            j = jnp.arange(1, K + 1, dtype=jnp.float32)        # (K,)
            levels = (L_ref[..., None]
                      + (sign * C)[..., None] * j)             # (H, W, K)
            denom = (L1 - L0)[..., None]
            frac = jnp.where(jnp.abs(denom) < 1e-12, 1.0,
                             (levels - L0[..., None]) / jnp.where(
                                 jnp.abs(denom) < 1e-12, 1.0, denom))
            t_ev = t0 + jnp.clip(frac, 0.0, 1.0) * (t1 - t0)   # (H, W, K)
            valid = j <= n[..., None].astype(jnp.float32)
            if rho > 0.0:
                # Sequential refractory gate along the (small, static) K
                # axis: an event is kept only if it trails the previous
                # *kept* event at its pixel by >= rho. Unrolled — K is a
                # compile-time constant.
                kept_cols = []
                prev_t = t_last
                for k in range(K):
                    keep_k = valid[..., k] & (t_ev[..., k] >= prev_t + rho)
                    kept_cols.append(keep_k)
                    prev_t = jnp.where(keep_k, t_ev[..., k], prev_t)
                kept = jnp.stack(kept_cols, axis=-1)
                new_t_last = prev_t
            else:
                kept = valid
                new_t_last = jnp.where(
                    n > 0,
                    jnp.max(jnp.where(kept, t_ev, -jnp.inf), axis=-1),
                    t_last)
            n_kept = kept.sum(axis=-1).astype(jnp.float32)
            # L_ref advances over *kept* crossings only: a refractory-
            # dropped crossing leaves the reference level behind, so the
            # pixel re-fires once it wakes up ("pixel is dead" reading).
            new_L_ref = L_ref + sign * C * n_kept
            dropped = (valid & ~kept).sum() + overflow.sum()
            return ((new_L_ref, new_t_last),
                    (t_ev, kept, sign.astype(jnp.int8), dropped))
        return step

    @jax.jit
    def run_chunk(L_ref, t_last, logI, stamps, cp, cn):
        """logI: (F, H, W) chunk incl. both endpoints; stamps: (F,)."""
        inp = (logI[:-1], logI[1:], stamps[:-1], stamps[1:])
        (L_ref, t_last), out = jax.lax.scan(make_step(cp, cn),
                                            (L_ref, t_last), inp)
        return L_ref, t_last, out

    return run_chunk


def simulate_events(frames, frame_ts, cfg: Optional[SimulatorConfig] = None,
                    key: Optional[Array] = None) -> SimulatedEvents:
    """Run the sensor model over intensity ``frames (F, H, W)`` in (0, 1].

    Returns the compacted time-sorted stream. Noise (threshold mismatch,
    log-intensity noise) is deterministic per ``key``; the per-frame noise
    is keyed on the absolute frame index, so chunk boundaries see identical
    noise for the shared frame. Frame pairs stream through one compiled
    ``lax.scan`` in chunks of ``cfg.chunk`` (the last chunk is padded with
    zero-length intervals, which emit nothing); frames transfer to the
    device one chunk at a time, so *device* memory is bounded by the chunk
    size. The host-side ``frames`` stack itself is the caller's to bound
    (it scales with F·H·W).

    Timestamps: the scan runs in float32 *relative* time (``frame_ts -
    frame_ts[0]``) and the float64 origin is added back on the host, so
    epoch-style stamps survive at full precision.
    """
    cfg = cfg or SimulatorConfig()
    frames = np.asarray(frames, np.float32)
    frame_ts = np.asarray(frame_ts, np.float64)
    if frames.ndim != 3 or frames.shape[0] != len(frame_ts):
        raise ConfigurationError(
            f"frames {frames.shape} / frame_ts {frame_ts.shape} mismatch")
    if frames.shape[0] < 2:
        raise ConfigurationError("need at least two frames to simulate")
    if np.any(np.diff(frame_ts) <= 0):
        raise ConfigurationError("frame_ts must be strictly increasing")
    F, H, W = frames.shape

    noise_key = thresh_key = None
    if key is not None:
        thresh_key, noise_key = jax.random.split(jnp.asarray(key))
    if cfg.noise_std > 0.0 and noise_key is None:
        raise ConfigurationError("noise_std > 0 requires an explicit PRNG key")
    _validate_noise_cfg(cfg, key)
    cp, cn = _threshold_maps(thresh_key, (H, W), cfg)
    noise_rate = None
    if cfg.has_noise_events():
        _check_noise_capacity(cfg, np.diff(frame_ts).max())
        noise_rate, noise_p_on, k_slots = _noise_rate_maps(key, (H, W), cfg)
        noise_run = _compiled_noise(int(cfg.max_noise_events_per_pixel))

    def log_block(block, first_index):
        """Log-transform (+ per-frame-indexed noise) one frame chunk on
        device; noise is a pure function of the absolute frame index so the
        frame shared by consecutive chunks gets identical noise."""
        logI = jnp.log(jnp.asarray(block) + cfg.log_eps)
        if cfg.noise_std > 0.0:
            idx = first_index + jnp.arange(block.shape[0])
            keys = jax.vmap(lambda i: jax.random.fold_in(noise_key, i))(idx)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (H, W)))(keys)
            logI = logI + cfg.noise_std * noise
        return logI

    run_chunk = _compiled_scan(int(cfg.max_events_per_pixel),
                               float(cfg.refractory))
    L_ref = log_block(frames[:1], 0)[0]
    t_last = jnp.full((H, W), -jnp.inf, jnp.float32)

    xx, yy = np.meshgrid(np.arange(W, dtype=np.int32),
                         np.arange(H, dtype=np.int32))
    blocks = []
    dropped_total = 0
    noise_total = 0
    chunk = max(1, int(cfg.chunk))
    # Relative float32 time inside the scan; float64 origin restored below.
    t_origin = frame_ts[0]
    rel_ts = (frame_ts - t_origin).astype(np.float32)
    for start in range(0, F - 1, chunk):
        stop = min(start + chunk, F - 1)
        fr = log_block(frames[start:stop + 1], start)
        st = jnp.asarray(rel_ts[start:stop + 1])
        pad = chunk - (stop - start)
        if pad:
            # Zero-length tail intervals: repeat the last frame/stamp.
            fr = jnp.concatenate([fr, jnp.repeat(fr[-1:], pad, 0)])
            st = jnp.concatenate([st, jnp.repeat(st[-1:], pad)])
        L_ref, t_last, (t_ev, kept, sign, dropped) = run_chunk(
            L_ref, t_last, fr, st, cp, cn)
        real = stop - start
        t_ev = np.asarray(t_ev)[:real]   # (real, H, W, K)
        kept = np.asarray(kept)[:real]
        sign = np.asarray(sign)[:real]   # (real, H, W)
        # Padded tail steps can shadow-fire while catching the state up to
        # the repeated last frame; the [:real] crops exclude them from both
        # the stream and the drop count.
        dropped_total += int(np.asarray(dropped)[:real].sum())
        # One vectorized nonzero over the whole chunk (a per-step Python
        # loop re-scans the (H, W, K) block twice per frame pair).
        si, iy, ix, _ = np.nonzero(kept)
        if len(si):
            blocks.append((xx[iy, ix], yy[iy, ix], t_ev[kept],
                           sign[si, iy, ix].astype(np.float32), 0))
        if noise_rate is not None:
            idx = jnp.arange(start, start + chunk)
            n_t, n_valid, n_sign = noise_run(k_slots, idx, st[:-1], st[1:],
                                             noise_rate, noise_p_on)
            n_t = np.asarray(n_t)[:real]
            n_valid = np.asarray(n_valid)[:real]
            n_sign = np.asarray(n_sign)[:real]
            _, niy, nix, _ = np.nonzero(n_valid)
            if len(niy):
                blocks.append((xx[niy, nix], yy[niy, nix], n_t[n_valid],
                               n_sign[n_valid].astype(np.float32), 1))
                noise_total += int(n_valid.sum())

    if not blocks:
        empty = np.array([], np.float32)
        return SimulatedEvents(empty, empty, empty.astype(np.float64), empty,
                               {"num_events": 0, "dropped": dropped_total,
                                "num_pos": 0, "num_neg": 0, "num_noise": 0},
                               labels=(np.array([], np.int8)
                                       if noise_rate is not None else None))
    xs = np.concatenate([b[0] for b in blocks]).astype(np.float32)
    ys = np.concatenate([b[1] for b in blocks]).astype(np.float32)
    ts = np.concatenate([b[2] for b in blocks]).astype(np.float64) + t_origin
    ps = np.concatenate([b[3] for b in blocks])
    order = np.argsort(ts, kind="stable")
    labels = None
    if noise_rate is not None:
        labels = np.concatenate(
            [np.full(len(b[0]), b[4], np.int8) for b in blocks])[order]
    stats = {"num_events": len(ts), "dropped": dropped_total,
             "num_pos": int((ps > 0).sum()), "num_neg": int((ps < 0).sum()),
             "num_noise": noise_total}
    return SimulatedEvents(xs[order], ys[order], ts[order], ps[order], stats,
                           labels=labels)


def simulate_events_device(frames, frame_ts, capacity: int,
                           cfg: Optional[SimulatorConfig] = None,
                           key: Optional[Array] = None,
                           dt_max: Optional[float] = None,
                           return_overflow: bool = False):
    """Fully on-device simulation into ONE capacity-padded event batch.

    Same sensor model as :func:`simulate_events`, but the compaction stays
    on device: the scan's padded (F-1, H, W, K) blocks are flattened and
    sorted by (validity, time), and the first ``capacity`` slots come back
    as ``(events (capacity, 4), mask (capacity,))`` — exactly the padded
    contract every masked kernel and trainer here consumes. Jittable end
    to end, so training loops can generate fresh supervised data *inside*
    the step with zero host round-trips.

    Overflow semantics: when more than ``capacity`` events fire, the sort
    by (validity, time) keeps the EARLIEST ``capacity`` events — a temporal
    tail cut, NOT a uniform subsample. With ``return_overflow`` a third
    output reports the exact number of events dropped by the cut (0 =
    nothing truncated, even when the mask is exactly full); measured cmax
    accuracy is flat under uniform subsampling but a missing tail shortens
    the effective window.

    ``dt_max`` (the largest frame interval, a static float) is required
    when background activity is enabled and ``frame_ts`` is traced: the
    noise-slot capacity check cannot read a traced dt and refuses to run
    blind rather than silently clipping the noise process.

    Device memory scales with ``(F-1)*H*W*K`` — size the frame window
    accordingly (a 32-frame 64x64 window at K=4 is ~0.5M slots).
    """
    cfg = cfg or SimulatorConfig()
    frames = jnp.asarray(frames, jnp.float32)
    frame_ts = jnp.asarray(frame_ts, jnp.float32)
    if frames.ndim != 3 or frames.shape[0] != frame_ts.shape[0]:
        raise ConfigurationError(
            f"frames {frames.shape} / frame_ts {frame_ts.shape} mismatch")
    if frames.shape[0] < 2:
        raise ConfigurationError("need at least two frames to simulate")
    F, H, W = frames.shape

    thresh_key = noise_key = None
    if key is not None:
        thresh_key, noise_key = jax.random.split(jnp.asarray(key))
    if cfg.noise_std > 0.0 and noise_key is None:
        raise ConfigurationError("noise_std > 0 requires an explicit PRNG key")
    _validate_noise_cfg(cfg, key)
    cp, cn = _threshold_maps(thresh_key, (H, W), cfg)
    run_chunk = _compiled_scan(int(cfg.max_events_per_pixel),
                               float(cfg.refractory))
    logI = jnp.log(frames + cfg.log_eps)
    if cfg.noise_std > 0.0:
        # per-frame-index noise, same scheme as simulate_events
        keys = jax.vmap(lambda i: jax.random.fold_in(noise_key, i))(
            jnp.arange(F))
        noise = jax.vmap(lambda k: jax.random.normal(k, (H, W)))(keys)
        logI = logI + cfg.noise_std * noise
    L_ref = logI[0]
    t_last = jnp.full((H, W), -jnp.inf, jnp.float32)
    _, _, (t_ev, kept, sign, _) = run_chunk(L_ref, t_last, logI, frame_ts,
                                            cp, cn)
    # flatten (F-1, H, W, K) -> event slots; invalid slots sort to the tail
    steps = F - 1
    K = int(cfg.max_events_per_pixel)
    xx = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None],
        (steps, H, W, K)).reshape(-1)
    yy = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[None, :, None, None],
        (steps, H, W, K)).reshape(-1)
    pp = jnp.broadcast_to(sign[..., None].astype(jnp.float32),
                          (steps, H, W, K)).reshape(-1)
    tt = t_ev.reshape(-1)
    valid = kept.reshape(-1)
    if cfg.has_noise_events():
        if dt_max is not None:
            _check_noise_capacity(cfg, float(dt_max))
        elif not isinstance(frame_ts, jax.core.Tracer):
            _check_noise_capacity(cfg, jnp.diff(frame_ts).max())
        else:
            # Traced stamps (jit/vmap callers): the overflow check cannot
            # read dt — demand it explicitly rather than silently clipping
            # the noise process at Kn per pixel per interval.
            raise ConfigurationError(
                "simulate_events_device with background activity under "
                "tracing: pass dt_max= (the largest frame interval, a "
                "static float) so the noise-slot capacity can be checked")
        rate, p_on, k_slots = _noise_rate_maps(key, (H, W), cfg)
        Kn = int(cfg.max_noise_events_per_pixel)
        n_t, n_valid, n_sign = _compiled_noise(Kn)(
            k_slots, jnp.arange(steps), frame_ts[:-1], frame_ts[1:],
            rate, p_on)
        xx = jnp.concatenate([xx, jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.float32)[None, None, :, None],
            (steps, H, W, Kn)).reshape(-1)])
        yy = jnp.concatenate([yy, jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.float32)[None, :, None, None],
            (steps, H, W, Kn)).reshape(-1)])
        pp = jnp.concatenate([pp, n_sign.astype(jnp.float32).reshape(-1)])
        tt = jnp.concatenate([tt, n_t.reshape(-1)])
        valid = jnp.concatenate([valid, n_valid.reshape(-1)])
    n_valid_total = valid.sum().astype(jnp.int32)  # pre-truncation
    order = jnp.argsort(jnp.where(valid, tt, jnp.inf),
                        stable=True)[:capacity]
    pad_out = capacity - order.shape[0]  # static: slot count < capacity
    mask = valid[order].astype(jnp.float32)
    # pad slots: zero coords/polarity but REPEAT the last valid timestamp,
    # keeping the batch time-sorted end to end (the voxel_matmul kernel
    # requires sorted stamps pads included — same contract as the native
    # loaders' padded batches)
    t_sel = tt[order]
    t_pad = jnp.max(jnp.where(mask != 0, t_sel, -jnp.inf))
    t_pad = jnp.where(jnp.isfinite(t_pad), t_pad, 0.0)
    t_col = jnp.where(mask != 0, t_sel, t_pad)
    ev = jnp.stack([xx[order] * mask, yy[order] * mask, t_col,
                    pp[order] * mask], axis=-1)
    if pad_out > 0:
        # fewer total slots than capacity: honour the fixed-shape contract
        pad_row = jnp.stack([jnp.float32(0.0), jnp.float32(0.0),
                             t_pad, jnp.float32(0.0)])
        ev = jnp.concatenate(
            [ev, jnp.broadcast_to(pad_row, (pad_out, 4))])
        mask = jnp.concatenate([mask, jnp.zeros((pad_out,), jnp.float32)])
    if return_overflow:
        return ev, mask, jnp.maximum(n_valid_total - capacity, 0)
    return ev, mask


def simulate_scene(scene: Scene, duration: float, fps: float,
                   cfg: Optional[SimulatorConfig] = None,
                   key: Optional[Array] = None):
    """Render ``scene`` at ``fps`` for ``duration`` seconds and simulate.

    Returns ``(events, frames, frame_ts, flows)`` — frames/flows are the
    ground-truth artifacts to package alongside the stream (flow per frame,
    px/s). Rendering is one vmapped batch.
    """
    if duration <= 0 or fps <= 0:
        raise ConfigurationError("duration and fps must be positive")
    cfg = cfg or SimulatorConfig()
    n_frames = max(2, int(round(duration * fps)) + 1)
    frame_ts = np.linspace(0.0, duration, n_frames)
    # Render in chunk-sized vmapped batches: keeps device memory bounded by
    # the chunk (matching simulate_events' own chunked consumption) instead
    # of materializing the full (F, H, W) + (F, 2, H, W) stacks on device.
    chunk = max(1, int(cfg.chunk))
    render_c = jax.jit(jax.vmap(scene.render))
    flow_c = jax.jit(jax.vmap(scene.flow))
    frames_l, flows_l = [], []
    for s in range(0, n_frames, chunk):
        t_batch = jnp.asarray(frame_ts[s:s + chunk], jnp.float32)
        if len(t_batch) < chunk:  # pad to one compiled shape, crop on host
            t_batch = jnp.pad(t_batch, (0, chunk - len(t_batch)))
        m = min(chunk, n_frames - s)
        frames_l.append(np.asarray(render_c(t_batch))[:m])
        flows_l.append(np.asarray(flow_c(t_batch))[:m])
    frames = np.concatenate(frames_l)
    flows = np.concatenate(flows_l)
    events = simulate_events(frames, frame_ts, cfg, key)
    return events, frames, frame_ts, flows
