"""Training-in-the-loop: device simulation feeding the trainer directly.

The file-based path (``cli.simulate --num_sequences`` -> ``train_flow``)
writes H5 recordings and streams them back — right for reproducible
datasets, but the host compaction and disk round-trip bound its rate. This
module closes the loop ON DEVICE: every training step renders a fresh
random translating scene, runs the ESIM sensor model
(:func:`simulation.esim.simulate_events_device`), voxelizes, and takes an
optimizer step — one jitted program per stage, zero intermediate files,
zero host round-trips for data (the only transfers are logged scalars).

No reference counterpart (the reference has no training or simulation
code); this is the "training-in-the-loop at scale" promise of
``simulation/esim.py`` made concrete.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..simulation.esim import (SimulatorConfig, simulate_events_device,
                               smooth_texture)

Array = jax.Array


def _render_translating(texture: Array, v: Array, t: Array) -> Array:
    """Jit/vmap-friendly translating-scene render (traced velocity —
    `translating_scene` closes over Python floats, this can't)."""
    H, W = texture.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return jax.scipy.ndimage.map_coordinates(
        texture, [yy - v[1] * t, xx - v[0] * t], order=1, mode="wrap")


def _render_similarity(texture: Array, v: Array, omega: Array, s: Array,
                       t: Array, age: Array | float = 0.0) -> Array:
    """Similarity-motion render (traced params): translation ``v`` px/s +
    rotation ``omega`` rad/s + divergence ``s`` 1/s about the sensor
    center — the xyztheta motion family. Reduces to
    :func:`_render_translating` at ``omega = s = 0``.

    ``age`` shifts the ROTATION/SCALE clock only (angle ``omega (t+age)``,
    scale ``e^{s (t+age)}``) while translation stays on ``t``: the
    texture is aged — rotated/rescaled as a long-running recording's
    would be — without advecting the field center by ``v * age`` px
    (aging the full composed motion inflated training-field magnitudes
    ~|v| age |omega, s| — measured +4 px/s AEE on the r5 stage-6 file
    eval). The instantaneous field is ``v + (omega J + s)(p - c - v t)``
    regardless of ``age``."""
    H, W = texture.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # map the pixel back to its texture coordinate at t=0: undo the
    # translation, then the rotation, then the exponential scaling
    x0 = xx - cx - v[0] * t
    y0 = yy - cy - v[1] * t
    t_rs = t + age
    c, sn = jnp.cos(omega * t_rs), jnp.sin(omega * t_rs)
    xr = c * x0 + sn * y0
    yr = -sn * x0 + c * y0
    f = jnp.exp(-s * t_rs)
    return jax.scipy.ndimage.map_coordinates(
        texture, [cy + yr * f, cx + xr * f], order=1, mode="wrap")


@partial(jax.jit, static_argnames=("batch_size", "sensor_size", "capacity",
                                   "num_frames", "octaves", "omega_max",
                                   "s_max", "return_saturation", "burn_in",
                                   "fresh_prob", "age_max"))
def simulate_flow_batch(key: Array, batch_size: int,
                        sensor_size: Tuple[int, int], capacity: int,
                        v_max: float = 40.0, window_t: float = 0.1,
                        num_frames: int = 9, octaves: int = 3,
                        c_pos: float = 0.15, c_neg: float = 0.15,
                        omega_max: float = 0.0, s_max: float = 0.0,
                        return_saturation: bool = False,
                        burn_in: int = 0, fresh_prob: float = 0.0,
                        age_max: float = 0.0):
    """One fresh supervised flow batch, generated entirely on device.

    Per element: random smooth texture + uniform random velocity in
    ``[-v_max, v_max]^2`` px/s, ``num_frames`` rendered frames over
    ``window_t`` seconds, ESIM simulation into a capacity-padded batch.

    Returns ``(events (B, capacity, 4), mask (B, capacity), gt)`` —
    ``events``/``mask`` in the exact padded contract
    ``FlowTrainer.train_batch`` consumes. With the default pure-translation
    family, ``gt`` is the ``(B, 2)`` uniform ground-truth velocity (px/s)
    and the RNG stream is bit-for-bit the historical one. With
    ``omega_max`` (rad/s) / ``s_max`` (1/s) nonzero, scenes carry
    per-element rotation/divergence about the sensor center and ``gt`` is
    the DENSE ``(B, 2, H, W)`` velocity field at t=0:
    ``v + omega x r + s r`` — spatially-varying supervision the uniform
    family can never provide.

    ``burn_in`` (N extra windows): simulate ``(burn_in+1) * window_t``
    seconds of the scene but mask everything before the LAST window, so
    training sees STEADY-STATE sensor statistics instead of fresh-sensor
    warm-up. MEASURED (r4): a freshly-initialized ESIM sensor emits ~half
    the events of a steady-state window with a strong temporal ramp
    (first/last-bin mass 234/947 on the probe scene vs uniform ~1200 in
    steady state); a net trained only on fresh windows overshoots flow
    magnitude ~1.7x on every continuous recording window past the first
    (``infer_flow --eval_gt``). Size ``capacity`` for the TOTAL simulated
    duration — the returned mask keeps only the final window's events
    (``gt`` is evaluated at the kept window's start — see the GT
    paragraph below).

    ``fresh_prob`` (needs ``burn_in`` >= 1): MIXED-regime training — each
    batch element independently keeps the FIRST (fresh-sensor) window with
    this probability instead of the last (steady-state) one. MEASURED (r4):
    a steady-only diet (stage 4) regressed the recording's fresh first
    window 61 -> 103 px/s while a fresh-only diet (stage 2) overshoots
    every steady window ~1.7x — single-regime diets trade one regime for
    the other; mixing trains both in one set of weights. ``fresh_prob=0``
    keeps the historical RNG stream bit-for-bit.

    ``age_max`` (seconds): per-element SCENE-AGE jitter — the rotation/
    scale clock shifts by ``age ~ U[0, age_max]`` (event timestamps and
    the translation clock unchanged; see :func:`_render_similarity`).
    A similarity scene's texture scales by ``e^{s*age}`` and a continuous
    recording's windows run to ages the fresh-scene diet never shows
    (MEASURED r5: the seed-91 eval recording's per-window AEE climbs
    25 -> 49 px/s over 2 s of divergence-driven texture drift at
    ``s = 0.35``). Aging only the rotation/scale clock keeps field
    magnitudes bounded — aging the full composed motion advected the
    field center by ``v*age`` and REGRESSED the file eval 33.2 -> 37.0
    px/s (r5 stage 6). Costs nothing (same frame count). Default 0 keeps
    the RNG stream and rendering bit-for-bit.

    GT correctness under composition (r5 fix): with translation composed,
    the similarity field's instantaneous center ADVECTS — the true field
    at time t is ``v + (omega J + s)(p - c - v t)``, NOT the t = 0 field.
    ``gt`` is therefore evaluated at the KEPT window's start time
    (``kept_window * window_t`` on the event clock; ``age`` shifts only
    the rotation/scale clock and does not enter the advection); the old
    t = 0 supervision carried
    ~|v| * t * |(omega, s)| ~ 10 px/s of systematic label noise on
    steady-state windows at the family caps.

    With ``return_saturation``, a fourth ``(B,)`` bool output flags
    elements whose event stream genuinely overflowed ``capacity`` (events
    tail-cut in time — with ``burn_in`` that cut lands in the LAST,
    trained window, so saturated elements matter more); an exactly-full
    untruncated stream is NOT flagged.
    """
    H, W = sensor_size
    cfg = SimulatorConfig(c_pos=c_pos, c_neg=c_neg)
    n_total = burn_in * (num_frames - 1) + num_frames
    fts = jnp.linspace(0.0, (burn_in + 1) * window_t, n_total)
    similarity = bool(omega_max or s_max)

    def one(k):
        if similarity:
            k_tex, k_vel, k_rot, k_sim = jax.random.split(k, 4)
            ws = jax.random.uniform(k_rot, (2,), minval=-1.0, maxval=1.0) \
                * jnp.asarray([omega_max, s_max], jnp.float32)
        else:
            k_tex, k_vel, k_sim = jax.random.split(k, 3)
            ws = jnp.zeros(2, jnp.float32)
        tex = smooth_texture(k_tex, (H, W), octaves=octaves)
        v = jax.random.uniform(k_vel, (2,), minval=-v_max, maxval=v_max)
        # scene-age jitter (fold_in keys: the age_max=0 / fresh_prob=0
        # streams stay bit-for-bit the historical ones)
        age = jnp.float32(0.0)
        if age_max:
            age = jax.random.uniform(jax.random.fold_in(k, 23),
                                     maxval=age_max)
        fresh = jnp.asarray(False)
        if burn_in and fresh_prob:
            fresh = jax.random.uniform(jax.random.fold_in(k, 17)) < fresh_prob
        frames = jax.vmap(
            lambda t: _render_similarity(tex, v, ws[0], ws[1], t,
                                         age=age))(fts)
        ev, mask, overflow = simulate_events_device(
            frames, fts, capacity, cfg, key=k_sim, return_overflow=True)
        kept_t0 = jnp.float32(0.0)    # kept window's start (event clock)
        if burn_in:
            in_steady = ev[:, 2] >= burn_in * window_t
            if fresh_prob:
                # mixed diet: this element keeps the fresh first window
                # with prob fresh_prob, else the steady last window
                keep = jnp.where(fresh, ev[:, 2] < window_t, in_steady)
                kept_t0 = jnp.where(fresh, 0.0, burn_in * window_t)
            else:
                # steady-state training: drop the warm-up windows' events
                keep = in_steady
                kept_t0 = jnp.float32(burn_in * window_t)
            mask = mask * keep.astype(mask.dtype)
        if not similarity:
            gt = v
        else:
            # TRUE dense field of the composed similarity motion at the
            # kept window's start: the instantaneous center is the sensor
            # center advected by the translation,
            # u(p, t) = v + (omega J + s)(p - c - v t). ``age`` shifts
            # only the rotation/scale clock (see _render_similarity), so
            # it does NOT enter the advection.
            t_ref = kept_t0
            cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
            yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) - cy,
                                  jnp.arange(W, dtype=jnp.float32) - cx,
                                  indexing="ij")
            rx = xx - v[0] * t_ref
            ry = yy - v[1] * t_ref
            gt = jnp.stack([v[0] - ws[0] * ry + ws[1] * rx,
                            v[1] + ws[0] * rx + ws[1] * ry])
        if return_saturation:
            return ev, mask, gt, overflow > 0
        return ev, mask, gt

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


@partial(jax.jit, static_argnames=("batch_size", "sensor_size", "capacity",
                                   "seq_len", "sim_steps_per_window",
                                   "num_bins", "combined", "octaves",
                                   "omega_max", "s_max",
                                   "return_saturation"))
def simulate_recon_batch(key: Array, batch_size: int,
                         sensor_size: Tuple[int, int], capacity: int,
                         seq_len: int, v_max: float = 40.0,
                         window_t: float = 0.05,
                         sim_steps_per_window: int = 4, num_bins: int = 5,
                         combined: bool = False, octaves: int = 3,
                         c_pos: float = 0.15, c_neg: float = 0.15,
                         omega_max: float = 0.0, s_max: float = 0.0,
                         return_saturation: bool = False):
    """One fresh supervised E2VID sequence batch, generated on device.

    Per element: random smooth texture + uniform random velocity, a
    ``seq_len * sim_steps_per_window + 1``-frame render over
    ``seq_len * window_t`` seconds, one ESIM pass (sensor state threads
    across the whole sequence), then each ``window_t`` slice is voxelized
    against its own validity mask — the windowing the ``between_frames``
    dataset path produces, without the files.

    ``omega_max`` (rad/s) / ``s_max`` (1/s) widen the motion family from
    pure translation to similarity motion (per-element uniform rotation /
    divergence rates about the sensor center); 0 (default) keeps the
    translating-scene behavior bit-for-bit.

    Returns ``(voxels (T, B, C, H, W), frames (T, B, 1, H, W))`` — exactly
    the :meth:`ReconstructionTrainer.train_sequence` contract; ``frames[w]``
    is the rendered frame at window w's END (the dataset pairing).
    ``capacity`` bounds events per SEQUENCE (all ``seq_len`` windows).
    With ``return_saturation``, a third ``(B,)`` bool output flags elements
    whose scene genuinely OVERFLOWED ``capacity`` — their event stream was
    TAIL-CUT in time (late windows under-populated vs the full-window
    frame targets; see ``simulate_events_device``), so trainers should
    warn and the capacity should be raised. An exactly-full untruncated
    stream is not flagged.
    """
    from ..representations.voxel_grid import (events_to_neg_pos_voxel,
                                              events_to_voxel)

    H, W = sensor_size
    cfg = SimulatorConfig(c_pos=c_pos, c_neg=c_neg)
    spw = sim_steps_per_window
    F = seq_len * spw + 1
    fts = jnp.linspace(0.0, seq_len * window_t, F)
    bounds = fts[::spw]                       # (seq_len + 1,) window edges
    target_idx = jnp.arange(1, seq_len + 1) * spw

    similarity = bool(omega_max or s_max)

    def one(k):
        # the extra split only happens when the motion family widens, so
        # the default scene stream (and any --eval_seed pinned batch)
        # stays bit-for-bit identical to the translation-only builds
        if similarity:
            k_tex, k_vel, k_rot, k_sim = jax.random.split(k, 4)
            ws = jax.random.uniform(k_rot, (2,), minval=-1.0, maxval=1.0) \
                * jnp.asarray([omega_max, s_max], jnp.float32)
        else:
            k_tex, k_vel, k_sim = jax.random.split(k, 3)
            ws = jnp.zeros(2, jnp.float32)
        tex = smooth_texture(k_tex, (H, W), octaves=octaves)
        v = jax.random.uniform(k_vel, (2,), minval=-v_max, maxval=v_max)
        frames = jax.vmap(
            lambda t: _render_similarity(tex, v, ws[0], ws[1], t))(fts)
        ev, mask, overflow = simulate_events_device(
            frames, fts, capacity, cfg, key=k_sim, return_overflow=True)
        xs, ys, ts, ps = ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3]

        def win(w):
            m = (mask > 0) & (ts > bounds[w]) & (ts <= bounds[w + 1])
            if combined:
                return events_to_voxel(xs, ys, ts, ps, num_bins,
                                       sensor_size=(H, W), mask=m)
            vp, vn = events_to_neg_pos_voxel(xs, ys, ts, ps, num_bins,
                                             sensor_size=(H, W), mask=m)
            return jnp.concatenate([vp, vn], 0)

        voxels = jax.vmap(win)(jnp.arange(seq_len))   # (T, C, H, W)
        sat = overflow > 0  # exact: a full-but-untruncated mask is NOT sat
        return voxels, frames[target_idx][:, None], sat   # + (T, 1, H, W)

    keys = jax.random.split(key, batch_size)
    voxels, targets, sat = jax.vmap(one)(keys)
    out = (voxels.transpose(1, 0, 2, 3, 4),
           targets.transpose(1, 0, 2, 3, 4))
    return out + (sat,) if return_saturation else out


def train_reconstruction_in_the_loop(trainer, steps: int,
                                     batch_size: int = 4, seq_len: int = 6,
                                     capacity: int = 65536,
                                     v_max: float = 40.0,
                                     window_t: float = 0.05,
                                     sim_steps_per_window: int = 4,
                                     omega_max: float = 0.0,
                                     s_max: float = 0.0,
                                     carry_segments: int = 1,
                                     seed: int = 0,
                                     eval_seed: Optional[int] = None,
                                     log_every: int = 20,
                                     eval_every: int = 100,
                                     ckpt_dir: Optional[str] = None,
                                     ckpt_every: int = 500, log_fn=print,
                                     on_eval=None):
    """Drive ``ReconstructionTrainer`` on device-simulated sequences.

    The E2VID twin of :func:`train_flow_in_the_loop`: every step simulates
    ``batch_size`` fresh scenes into truncated-BPTT sequences and takes one
    optimizer step (async dispatch). Every ``eval_every`` steps the net is
    scored on a held-out simulated batch: PSNR (dB) / SSIM of the
    reconstructions vs the exact rendered frames.

    Returns ``(losses, psnr_curve)`` with ``psnr_curve`` a list of
    ``(step, psnr_db, ssim, psnr_steady_db, ssim_steady)`` tuples — the
    last two scored only over the back half of the sequence (and past the
    trainer's burn-in), where the GRU state has history.

    ``eval_seed`` pins the held-out batch independently of the training
    scene stream: resumed stages with a fresh ``seed`` (so scenes don't
    replay) keep a comparable curve by passing the first stage's seed as
    ``eval_seed``.

    ``on_eval(losses, psnr_curve)``, if given, is called after every eval
    point — callers persist partial curves so interrupted runs keep them.

    ``carry_segments`` > 1 trains the long-horizon regime: each generated
    scene runs ``carry_segments * seq_len`` windows and is consumed as
    ``carry_segments`` consecutive optimizer steps, the first from zero
    GRU state (with the trainer's burn-in), the rest warm-started from
    the previous segment's final state on the SAME continuing scene (no
    burn-in). BPTT stays truncated at ``seq_len``, so memory is
    unchanged, but the net learns to operate on state with up to
    ``carry_segments * seq_len * window_t`` seconds of history —
    without this, reconstruction quality decays ~0.35 dB/window beyond
    the trained unroll length (measured: ``reconstruct --eval_gt`` on a
    20-window recording peaks at window ~9 then slides 24.8 -> 20.7 dB).
    ``capacity`` bounds events per full scene — scale it by
    ``carry_segments``. The held-out eval batch spans the full
    ``carry_segments * seq_len`` windows, so its steady-state column
    scores the long-horizon back half (NOT comparable with curves from
    ``carry_segments=1`` stages).
    """
    import time

    import numpy as np

    from ..utils.metrics import psnr, ssim

    H, W = trainer.sensor_size
    carry_segments = max(int(carry_segments), 1)

    def _gen(k):
        return simulate_recon_batch(
            k, batch_size, (H, W), capacity, seq_len * carry_segments,
            v_max=v_max,
            window_t=window_t, sim_steps_per_window=sim_steps_per_window,
            num_bins=trainer.num_bins, combined=trainer.combined_channels,
            omega_max=omega_max, s_max=s_max, return_saturation=True)

    mesh = getattr(trainer, "mesh", None)
    if mesh is not None:
        # Sharded generation: (T, B, ...) outputs split on the batch axis,
        # matching ReconstructionTrainer's (seq, batch) sharding.
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.size:
            raise ValueError(f"batch_size {batch_size} must divide the "
                             f"mesh size {mesh.size}")
        ssh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
        bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
        gen = jax.jit(_gen, out_shardings=(ssh, ssh, bsh))
    else:
        gen = _gen

    key = jax.random.PRNGKey(seed)
    key, k_eval = jax.random.split(key)
    if eval_seed is not None:
        _, k_eval = jax.random.split(jax.random.PRNGKey(eval_seed))
    if eval_every:
        eval_voxels, eval_frames, _ = gen(k_eval)
        eval_frames_np = np.asarray(eval_frames)

    def eval_metrics():
        imgs, _ = trainer.reconstruct(eval_voxels)
        imgs = np.asarray(imgs)
        T = imgs.shape[0]
        per_t_p = np.empty(T)
        per_t_s = np.empty(T)
        for t in range(T):
            per_t_p[t] = np.mean([float(psnr(imgs[t, b, 0],
                                             eval_frames_np[t, b, 0]))
                                  for b in range(imgs.shape[1])])
            per_t_s[t] = np.mean([float(ssim(imgs[t, b, 0],
                                             eval_frames_np[t, b, 0]))
                                  for b in range(imgs.shape[1])])
        # steady state: windows where the GRU state has history (past the
        # trained burn-in, at least the back half) — the regime a
        # long-running reconstruction actually operates in
        t0 = max(int(getattr(trainer, "burn_in", 0)), T // 2)
        return (float(per_t_p.mean()), float(per_t_s.mean()),
                float(per_t_p[t0:].mean()), float(per_t_s[t0:].mean()))

    losses, psnr_curve = [], []
    pending = []
    n_sat = jnp.zeros((), jnp.int32)
    n_elems = 0
    sat_warned = False
    t0 = time.perf_counter()
    for i in range(steps):
        seg = i % carry_segments
        if seg == 0:
            key, k = jax.random.split(key)
            voxels, frames, sat = gen(k)
            n_sat = n_sat + sat.sum()
            n_elems += batch_size
        lo, hi = seg * seq_len, (seg + 1) * seq_len
        pending.append(trainer.train_sequence_async(
            voxels[lo:hi], frames[lo:hi],
            state0=None if seg == 0 else trainer.final_state))
        if log_every and (i + 1) % log_every == 0:
            losses.extend(float(x) for x in pending)
            pending = []
            sps = (i + 1) / (time.perf_counter() - t0)
            log_fn(f"step {trainer.step}: loss {losses[-1]:.5f} "
                   f"({sps:.2f} steps/s)")
            if not sat_warned and int(n_sat) > 0:
                sat_warned = True
                log_fn(f"WARNING: {int(n_sat)}/{n_elems} simulated scenes "
                       f"overflowed the {capacity}-event capacity — their "
                       "streams are TAIL-CUT in time (late windows under-"
                       "populated vs full-window targets); raise capacity")
        if eval_every and (i + 1) % eval_every == 0:
            p, s, p_ss, s_ss = eval_metrics()
            psnr_curve.append((trainer.step, p, s, p_ss, s_ss))
            log_fn(f"step {trainer.step}: held-out PSNR {p:.2f} dB, "
                   f"SSIM {s:.3f} (steady-state {p_ss:.2f} dB / "
                   f"{s_ss:.3f})")
            if on_eval is not None:
                on_eval(losses, psnr_curve)
        if ckpt_dir and (i + 1) % ckpt_every == 0:
            trainer.save_checkpoint(ckpt_dir)
    losses.extend(float(x) for x in pending)
    if ckpt_dir:
        trainer.save_checkpoint(ckpt_dir)
    return losses, psnr_curve


def train_flow_in_the_loop(trainer, steps: int, batch_size: int = 8,
                           capacity: int = 16384, v_max: float = 40.0,
                           window_t: float = 0.1, num_frames: int = 9,
                           omega_max: float = 0.0, s_max: float = 0.0,
                           burn_in: int = 0, fresh_prob: float = 0.0,
                           age_max: float = 0.0, seed: int = 0,
                           eval_seed: Optional[int] = None,
                           log_every: int = 20,
                           eval_every: int = 100, ckpt_dir: Optional[str] = None,
                           ckpt_every: int = 500, log_fn=print,
                           on_eval=None):
    """Drive ``FlowTrainer`` on device-simulated batches (no files).

    Each step: ``simulate_flow_batch`` -> on-device voxelize -> one
    optimizer step, dispatched asynchronously (losses sync only at log
    points). Every ``eval_every`` steps the current net is scored on a
    held-out simulated batch: AEE (px/s) of the predicted dense flow vs
    the scene's uniform GT velocity.

    Returns ``(losses, aee_curve)`` where ``aee_curve`` is a list of
    ``(step, aee)`` pairs. ``on_eval(losses, aee_curve)``, if given, is
    called after every eval point (partial-curve persistence).

    ``fresh_prob`` mixes fresh-sensor windows into a ``burn_in`` diet and
    ``age_max`` adds scene-age jitter (see :func:`simulate_flow_batch`).
    The held-out eval batch is ALWAYS drawn with ``fresh_prob=0`` and
    ``age_max=0`` (pure steady-state, age-0 scenes), so widened-diet AEE
    curves stay comparable with steady-only stages.
    """
    import time

    from ..representations.voxel_grid import events_to_neg_pos_voxel

    H, W = trainer.sensor_size
    num_bins, combined = trainer.num_bins, trainer.combined_channels

    def _voxelize(events, mask):
        def one(ev, m):
            xs, ys, ts, ps = ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3]
            if combined:
                from ..representations.voxel_grid import events_to_voxel
                return events_to_voxel(xs, ys, ts, ps, num_bins,
                                       sensor_size=(H, W), mask=m)
            vp, vn = events_to_neg_pos_voxel(xs, ys, ts, ps, num_bins,
                                             sensor_size=(H, W), mask=m)
            return jnp.concatenate([vp, vn], 0)

        return jax.vmap(one)(events, mask)

    def _gen(k, fp=fresh_prob, am=age_max):
        return simulate_flow_batch(k, batch_size, (H, W), capacity,
                                   v_max=v_max, window_t=window_t,
                                   num_frames=num_frames,
                                   omega_max=omega_max, s_max=s_max,
                                   burn_in=burn_in, fresh_prob=fp,
                                   age_max=am,
                                   return_saturation=True)

    def _gen_eval(k):
        return _gen(k, fp=0.0, am=0.0)  # pinned steady-state, age-0

    mesh = getattr(trainer, "mesh", None)
    if mesh is not None:
        # Sharded in-the-loop: annotate the batch axis and let the SPMD
        # partitioner split the per-element simulate/voxelize pipeline
        # across the mesh — each device renders + simulates its own batch
        # shard; only the train step's gradient psum crosses ICI.
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.size:
            raise ValueError(f"batch_size {batch_size} must divide the "
                             f"mesh size {mesh.size}")
        bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
        gen = jax.jit(_gen, out_shardings=(bsh, bsh, bsh, bsh))
        gen_eval = jax.jit(_gen_eval, out_shardings=(bsh, bsh, bsh, bsh))
        voxelize = jax.jit(_voxelize, in_shardings=(bsh, bsh),
                           out_shardings=bsh)
    else:
        gen = jax.jit(_gen)
        gen_eval = jax.jit(_gen_eval)
        voxelize = jax.jit(_voxelize)

    @jax.jit
    def aee_of(params, voxel, gt_v):
        flow = trainer.model.apply(params, voxel)  # (B, 2, H, W) px/s
        err = jnp.linalg.norm(flow - dense_gt(gt_v), axis=1)
        return jnp.mean(err)

    key = jax.random.PRNGKey(seed)
    key, k_eval = jax.random.split(key)
    if eval_seed is not None:
        _, k_eval = jax.random.split(jax.random.PRNGKey(eval_seed))
    if eval_every:
        eval_ev, eval_mask, eval_gt, _ = gen_eval(k_eval)
        eval_voxel = voxelize(eval_ev, eval_mask)

    def dense_gt(gt_v):
        # uniform family: (B, 2) broadcast dense; similarity family:
        # already the (B, 2, H, W) field
        if gt_v.ndim == 2:
            return jnp.broadcast_to(gt_v[:, :, None, None],
                                    (gt_v.shape[0], 2, H, W))
        return gt_v

    losses, aee_curve = [], []
    pending = []
    n_events = jnp.zeros((), jnp.float32)
    n_sat = jnp.zeros((), jnp.int32)
    n_elems = 0
    sat_warned = False
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        ev, mask, gt_v, sat = gen(k)
        voxel = voxelize(ev, mask)
        pending.append(trainer.train_batch_async(voxel, ev, mask,
                                                 dense_gt(gt_v)))
        n_events = n_events + mask.sum()
        n_sat = n_sat + sat.sum()
        n_elems += batch_size
        if log_every and (i + 1) % log_every == 0:
            losses.extend(float(x) for x in pending)
            pending = []
            rate = float(n_events) / (time.perf_counter() - t0) / 1e6
            log_fn(f"step {trainer.step}: loss {losses[-1]:.5f}, "
                   f"{rate:.2f} Mev/s simulated+trained")
            if not sat_warned and int(n_sat) > 0:
                sat_warned = True
                log_fn(f"WARNING: {int(n_sat)}/{n_elems} simulated scenes "
                       f"overflowed the {capacity}-event capacity — their "
                       "streams are TAIL-CUT in time (late voxel bins "
                       "under-populated vs full-window GT); raise capacity")
        if eval_every and (i + 1) % eval_every == 0:
            aee = float(aee_of(trainer.params, eval_voxel, eval_gt))
            aee_curve.append((trainer.step, aee))
            log_fn(f"step {trainer.step}: held-out AEE {aee:.2f} px/s "
                   f"(zero-flow baseline {float(jnp.mean(jnp.linalg.norm(eval_gt, axis=1))):.2f})")
            if on_eval is not None:
                on_eval(losses, aee_curve)
        if ckpt_dir and (i + 1) % ckpt_every == 0:
            trainer.save_checkpoint(ckpt_dir)
    losses.extend(float(x) for x in pending)
    if ckpt_dir:
        trainer.save_checkpoint(ckpt_dir)
    return losses, aee_curve
