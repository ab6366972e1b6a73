"""Model-family + training-loop tests (tiny shapes, CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import make_events

SENSOR = (32, 32)
BINS = 3


def _voxel_batch(rng, batch=2):
    from event_utils_tpu.representations import events_to_neg_pos_voxel
    vox = []
    evs = []
    masks = []
    for _ in range(batch):
        xs, ys, ts, ps = make_events(rng, n=512, sensor=SENSOR)
        vp, vn = events_to_neg_pos_voxel(xs, ys, ts, ps, BINS,
                                         sensor_size=SENSOR)
        vox.append(jnp.concatenate([vp, vn], 0))
        evs.append(np.stack([xs, ys, ts, ps], 1).astype(np.float32))
        masks.append(np.ones(512, np.float32))
    return (jnp.stack(vox), jnp.asarray(np.stack(evs)),
            jnp.asarray(np.stack(masks)))


def test_evflownet_forward(rng):
    from event_utils_tpu.models.networks import EVFlowNet
    model = EVFlowNet()
    vox, _, _ = _voxel_batch(rng)
    params = model.init(jax.random.PRNGKey(0), vox)
    flow = model.apply(params, vox)
    assert flow.shape == (2, 2) + SENSOR
    assert np.isfinite(np.asarray(flow)).all()


def test_e2vid_recurrent_forward(rng):
    from event_utils_tpu.models.networks import E2VID
    model = E2VID()
    vox, _, _ = _voxel_batch(rng)
    params = model.init(jax.random.PRNGKey(0), vox, None)
    img1, state = model.apply(params, vox, None)
    img2, state2 = model.apply(params, vox, state)
    assert img1.shape == (2, 1) + SENSOR
    assert float(jnp.min(img1)) >= 0 and float(jnp.max(img1)) <= 1
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_e2vid_multilevel_recurrence(rng):
    """recurrent_levels=depth + res blocks: state is a tuple (one hidden
    per level), threading it changes the output at EVERY level's scale,
    and the default config's parameter tree is untouched (existing
    checkpoints must keep restoring)."""
    from event_utils_tpu.models.networks import E2VID
    vox, _, _ = _voxel_batch(rng)

    model = E2VID(recurrent_levels=3, num_res_blocks=2)
    params = model.init(jax.random.PRNGKey(0), vox, None)
    img1, state = model.apply(params, vox, None)
    assert isinstance(state, tuple) and len(state) == 3
    # deepest-first spatial halving: level i hidden at 1/2^(i+1) resolution
    assert [s.shape[1] for s in state] == [SENSOR[0] // 2, SENSOR[0] // 4,
                                           SENSOR[0] // 8]
    img2, _ = model.apply(params, vox, state)
    assert img1.shape == (2, 1) + SENSOR
    assert not np.allclose(np.asarray(img1), np.asarray(img2))

    # perturbing ONLY the shallowest hidden changes the output (fine-scale
    # state genuinely feeds the reconstruction)
    bumped = (state[0] + 1.0,) + state[1:]
    img3, _ = model.apply(params, vox, bumped)
    assert not np.allclose(np.asarray(img2), np.asarray(img3))

    # default tree unchanged: bottleneck-GRU names the historical modules
    legacy = E2VID().init(jax.random.PRNGKey(0), vox, None)
    names = set(legacy["params"].keys())
    assert {"_Encoder_0", "ConvGRU_0", "Conv_0", "_Decoder_0"} <= names
    assert not any(n.startswith("_ResBlock") for n in names)

    from event_utils_tpu.errors import ConfigurationError
    with pytest.raises(ConfigurationError):
        E2VID(recurrent_levels=4).init(jax.random.PRNGKey(0), vox, None)


@pytest.mark.slow
def test_reconstruction_trainer_burn_in_and_model_sidecar(rng, tmp_path):
    """burn_in drops early-window losses (loss becomes insensitive to a
    corrupted first target); model.json records non-default architectures
    and read_model_config rebuilds a restorable trainer."""
    from event_utils_tpu.training import ReconstructionTrainer
    from event_utils_tpu.training.checkpointing import read_model_config

    kwargs = dict(sensor_size=SENSOR, num_bins=BINS, learning_rate=1e-3,
                  model_kwargs={"recurrent_levels": 2, "num_res_blocks": 1})
    T = 3
    voxels = np.stack([np.asarray(_voxel_batch(rng)[0]) for _ in range(T)])
    frames = np.clip(voxels.sum(axis=2, keepdims=True) * 0.2 + 0.5, 0, 1)
    bad = frames.copy()
    bad[0] = 1.0 - bad[0]  # corrupt only the burn-in window's target

    tr = ReconstructionTrainer(burn_in=1, **kwargs)
    # host snapshots: the train step donates params/opt_state buffers
    p0 = jax.tree.map(np.asarray, tr.params)
    o0 = jax.tree.map(np.asarray, tr.opt_state)
    restore = lambda t: (jax.tree.map(jnp.asarray, p0),
                         jax.tree.map(jnp.asarray, o0))
    l_clean = tr.train_sequence(voxels, frames)
    tr.params, tr.opt_state = restore(tr)
    tr.step = 0
    l_bad = tr.train_sequence(voxels, bad)
    np.testing.assert_allclose(l_clean, l_bad, rtol=1e-6)

    tr_no = ReconstructionTrainer(burn_in=0, **kwargs)
    tr_no.params, tr_no.opt_state = restore(tr_no)
    assert abs(tr_no.train_sequence(voxels, bad) - l_bad) > 1e-3

    from event_utils_tpu.errors import ConfigurationError
    with pytest.raises(ConfigurationError):
        ReconstructionTrainer(burn_in=T, **kwargs).train_sequence(
            voxels, frames)

    ckpt = str(tmp_path / "ck")
    tr.save_checkpoint(ckpt)
    saved = read_model_config(ckpt)
    assert saved == {"recurrent_levels": 2, "num_res_blocks": 1}
    tr2 = ReconstructionTrainer(model_kwargs=saved, **{
        k: v for k, v in kwargs.items() if k != "model_kwargs"})
    assert tr2.restore_checkpoint(ckpt) == tr.step
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), tr2.params, tr.params)


@pytest.mark.slow
def test_contrast_flow_loss_grad(rng):
    from event_utils_tpu.models.networks import contrast_flow_loss
    _, events, mask = _voxel_batch(rng)
    flow = jnp.zeros((2, 2) + SENSOR)
    loss, g = jax.value_and_grad(
        lambda f: contrast_flow_loss(f, events, mask, SENSOR))(flow)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_flow_trainer_descends(rng, tmp_path):
    from event_utils_tpu.training import FlowTrainer
    trainer = FlowTrainer(sensor_size=SENSOR, num_bins=BINS,
                          learning_rate=1e-3)
    vox, events, mask = _voxel_batch(rng, batch=4)
    losses = [trainer.train_batch(vox, events, mask) for _ in range(12)]
    assert losses[-1] < losses[0], f"no descent: {losses}"

    # checkpoint roundtrip
    ckpt = str(tmp_path / "ckpt")
    trainer.save_checkpoint(ckpt)
    p_before = jax.tree.map(np.asarray, trainer.params)
    trainer.train_batch(vox, events, mask)
    step = trainer.restore_checkpoint(ckpt)
    assert step == 12
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        trainer.params, p_before)


@pytest.mark.slow
def test_flow_trainer_sharded(rng):
    from event_utils_tpu.parallel import make_mesh
    from event_utils_tpu.training import FlowTrainer
    mesh = make_mesh(8, axis_name="batch")
    trainer = FlowTrainer(sensor_size=SENSOR, num_bins=BINS, mesh=mesh)
    vox, events, mask = _voxel_batch(rng, batch=8)
    loss = trainer.train_batch(vox, events, mask)
    assert np.isfinite(loss)
    # replicated-vs-sharded equivalence
    solo = FlowTrainer(sensor_size=SENSOR, num_bins=BINS)
    loss_solo = solo.train_batch(vox, events, mask)
    np.testing.assert_allclose(loss, loss_solo, rtol=1e-4)


@pytest.mark.slow
def test_reconstruction_trainer_descends(rng):
    from event_utils_tpu.training import ReconstructionTrainer
    trainer = ReconstructionTrainer(sensor_size=SENSOR, num_bins=BINS,
                                    learning_rate=2e-3)
    T, Bt = 3, 2
    voxels = np.stack([np.asarray(_voxel_batch(rng)[0]) for _ in range(T)])
    # target: smoothed polarity sum as a stand-in intensity
    frames = np.clip(voxels.sum(axis=2, keepdims=True) * 0.2 + 0.5, 0, 1)
    losses = [trainer.train_sequence(voxels, frames) for _ in range(30)]
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), f"no descent: {losses}"
    preds, state = trainer.reconstruct(voxels)
    assert preds.shape == (T, Bt, 1) + SENSOR
    assert state is not None


@pytest.mark.slow
def test_perceptual_distance_properties(rng):
    """Random-feature perceptual loss: zero at identity, positive and
    differentiable for different images, larger for structural change than
    for constant offset (perceptual behavior L1 lacks)."""
    import jax
    import jax.numpy as jnp
    from event_utils_tpu.models.networks import (perceptual_distance,
                                                 reconstruction_loss)

    img = jnp.asarray(rng.uniform(0, 1, (2, 1, 32, 32)), jnp.float32)
    assert float(perceptual_distance(img, img)) == 0.0
    shuffled = img[:, :, ::-1, :]
    d_struct = float(perceptual_distance(img, shuffled))
    assert d_struct > 0
    g = jax.grad(lambda p: perceptual_distance(p, shuffled))(img)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0
    # composes into the training loss
    l0 = float(reconstruction_loss(img, shuffled))
    l1 = float(reconstruction_loss(img, shuffled, lpips_weight=1.0))
    assert l1 > l0


def test_contrast_flow_loss_empty_window_finite(rng):
    """A window whose mask is all zero (quiet t_seconds interval) must give
    a finite loss, not t_last=-inf -> NaN warp (review r2)."""
    import jax.numpy as jnp

    from event_utils_tpu.models.networks import contrast_flow_loss

    B, N, H, W = 2, 64, 16, 24
    ev = rng.uniform(0, 1, (B, N, 4)).astype(np.float32)
    ev[..., 0] *= W - 1
    ev[..., 1] *= H - 1
    mask = np.ones((B, N), np.float32)
    mask[1] = 0.0  # second window entirely empty
    flow = np.zeros((B, 2, H, W), np.float32)
    loss = float(contrast_flow_loss(jnp.asarray(flow), jnp.asarray(ev),
                                    jnp.asarray(mask), (H, W)))
    assert np.isfinite(loss)


@pytest.mark.slow
def test_flow_trainer_combined_channels_fit(rng, tmp_path):
    """fit() voxelizes with the trainer's own num_bins/combined_channels:
    combined_channels=True used to crash with a param-shape mismatch, and
    the final checkpoint save used to collide with the in-loop save of the
    same step (orbax StepAlreadyExistsError)."""
    from event_utils_tpu.training import FlowTrainer

    B, cap = 2, 512
    H, W = SENSOR

    def loader():
        for _ in range(4):
            ev = np.zeros((B, cap, 4), np.float32)
            ev[..., 0] = rng.uniform(0, W - 1, (B, cap))
            ev[..., 1] = rng.uniform(0, H - 1, (B, cap))
            ev[..., 2] = np.sort(rng.uniform(0, 0.1, (B, cap)), axis=-1)
            ev[..., 3] = rng.choice([-1.0, 1.0], (B, cap))
            yield {"events": ev, "events_mask": np.ones((B, cap), np.float32)}

    trainer = FlowTrainer(sensor_size=SENSOR, num_bins=3,
                          combined_channels=True, learning_rate=1e-3)
    ckpt = str(tmp_path / "cc_ckpt")
    # ckpt_every=4 makes the in-loop save land on the same step as the
    # final save — must be a no-op, not an orbax error
    losses = trainer.fit(loader(), epochs=1, log_every=2, ckpt_dir=ckpt,
                         ckpt_every=4)
    assert len(losses) == 4 and all(np.isfinite(losses))
    assert trainer.restore_checkpoint(ckpt) == 4


@pytest.mark.slow
def test_contrast_flow_loss_sign_convention():
    """The loss must be minimized by the TRUE forward flow, not its
    negation (pre-fix, loss(-gt) beat loss(+gt): EVFlowNet trained to emit
    negated fields)."""
    import jax
    import jax.numpy as jnp
    from event_utils_tpu.models.networks import contrast_flow_loss
    from event_utils_tpu.simulation.esim import (SimulatorConfig,
                                                 simulate_scene,
                                                 smooth_texture,
                                                 translating_scene)

    key = jax.random.PRNGKey(4)
    tex = smooth_texture(key, (48, 48), octaves=4)
    sc = translating_scene(tex, (30.0, -20.0))
    ev, _, _, flows = simulate_scene(sc, 0.4, 120.0,
                                     SimulatorConfig(c_pos=0.15, c_neg=0.15))
    n = len(ev)
    events = np.stack([ev.xs, ev.ys, ev.ts.astype(np.float32), ev.ps],
                      -1)[None]
    mask = np.ones((1, n), np.float32)
    gt = jnp.asarray(flows[0][None], jnp.float32)  # (1, 2, H, W)

    def loss(f):
        return float(contrast_flow_loss(f, jnp.asarray(events), mask,
                                        (48, 48), smoothness_weight=0.0))

    l_gt, l_zero, l_neg = loss(gt), loss(jnp.zeros_like(gt)), loss(-gt)
    assert l_gt < l_zero < l_neg, (l_gt, l_zero, l_neg)


def test_evflownet_rejects_indivisible_input():
    import jax
    import jax.numpy as jnp
    from event_utils_tpu.errors import ConfigurationError
    from event_utils_tpu.models.networks import EVFlowNet
    model = EVFlowNet()
    with pytest.raises(ConfigurationError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 44, 44)))


def test_psnr_ssim_properties(rng):
    from event_utils_tpu.utils.metrics import psnr, ssim
    img = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    assert float(psnr(img, img)) > 100.0      # identical -> huge PSNR
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    blank = np.zeros_like(img)
    assert float(psnr(img, noisy)) > float(psnr(img, blank))
    assert 0.0 < float(ssim(img, noisy)) < 0.99
    assert float(ssim(img, noisy)) > float(ssim(img, 1 - img))
    # batched shape
    batch = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    assert np.asarray(ssim(batch, batch)).shape == (3,)
    assert np.asarray(psnr(batch, batch)).shape == (3,)


def test_average_endpoint_error(rng):
    from event_utils_tpu.utils.metrics import average_endpoint_error
    gt = np.zeros((2, 8, 8), np.float32)
    gt[0] = 3.0
    gt[1] = 4.0
    assert abs(float(average_endpoint_error(np.zeros_like(gt), gt)) - 5.0) < 1e-6
    assert float(average_endpoint_error(gt, gt)) == 0.0


@pytest.mark.slow
def test_simulate_flow_batch_contract():
    """Device-generated supervised batch: padded contract, sorted valid
    times, events consistent with the planted velocity's sign."""
    from event_utils_tpu.training import simulate_flow_batch

    ev, mask, gt = simulate_flow_batch(
        jax.random.PRNGKey(0), 2, (24, 32), 2048, v_max=30.0,
        window_t=0.12, num_frames=7)
    assert ev.shape == (2, 2048, 4) and mask.shape == (2, 2048)
    assert gt.shape == (2, 2)
    m = np.asarray(mask) != 0
    assert m.sum(axis=1).min() > 20  # every scene fired events
    for b in range(2):
        t = np.asarray(ev[b, :, 2])[m[b]]
        assert np.all(np.diff(t) >= 0)  # valid events time-sorted
        x = np.asarray(ev[b, :, 0])[m[b]]
        y = np.asarray(ev[b, :, 1])[m[b]]
        assert x.min() >= 0 and x.max() < 32
        assert y.min() >= 0 and y.max() < 24
    assert np.all(np.abs(np.asarray(gt)) <= 30.0)


@pytest.mark.slow
def test_train_flow_in_the_loop_descends(tmp_path):
    """Zero-file training loop: losses finite and decreasing on average,
    AEE curve recorded, checkpoint written."""
    from event_utils_tpu.training import FlowTrainer, train_flow_in_the_loop

    trainer = FlowTrainer(sensor_size=(16, 16), num_bins=2,
                          learning_rate=2e-3)
    eval_calls = []
    losses, aee = train_flow_in_the_loop(
        trainer, steps=12, batch_size=2, capacity=1024, v_max=20.0,
        window_t=0.1, num_frames=5, log_every=6, eval_every=6,
        ckpt_dir=str(tmp_path / "ck"), ckpt_every=12, log_fn=lambda s: None,
        on_eval=lambda ls, cv: eval_calls.append(len(cv)))
    assert len(losses) == 12 and np.all(np.isfinite(losses))
    assert len(aee) == 2 and all(np.isfinite(a) for _, a in aee)
    # partial-curve persistence hook fires after every eval point
    assert eval_calls == [1, 2]
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    assert (tmp_path / "ck").exists()


def test_simulate_recon_batch_contract():
    """Device-generated E2VID sequence batch: trainer contract shapes,
    frames in [0, 1] and actually moving, every window fires events."""
    from event_utils_tpu.training import simulate_recon_batch

    vox, frm = simulate_recon_batch(
        jax.random.PRNGKey(1), 2, (24, 32), 2048, 3, v_max=25.0,
        window_t=0.08, num_bins=2)
    assert vox.shape == (3, 2, 4, 24, 32)
    assert frm.shape == (3, 2, 1, 24, 32)
    v = np.asarray(vox)
    f = np.asarray(frm)
    assert np.isfinite(v).all()
    assert f.min() >= 0.0 and f.max() <= 1.0 + 1e-6
    assert (np.abs(v).sum(axis=(1, 2, 3, 4)) > 0).all()
    assert not np.allclose(f[0], f[-1])


@pytest.mark.slow
def test_train_reconstruction_in_the_loop_descends(tmp_path):
    """Zero-file E2VID loop: losses descend, PSNR/SSIM curve recorded,
    checkpoint written."""
    from event_utils_tpu.training import (ReconstructionTrainer,
                                          train_reconstruction_in_the_loop)

    trainer = ReconstructionTrainer(sensor_size=(16, 16), num_bins=2,
                                    learning_rate=2e-3)
    losses, curve = train_reconstruction_in_the_loop(
        trainer, steps=10, batch_size=2, seq_len=2, capacity=1024,
        v_max=20.0, window_t=0.08, log_every=5, eval_every=5,
        ckpt_dir=str(tmp_path / "ck"), ckpt_every=10, log_fn=lambda s: None)
    assert len(losses) == 10 and np.all(np.isfinite(losses))
    assert len(curve) == 2
    assert all(np.isfinite(p) and np.isfinite(s) and np.isfinite(p_ss)
               and np.isfinite(s_ss) for _, p, s, p_ss, s_ss in curve)
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert (tmp_path / "ck").exists()


@pytest.mark.slow
def test_simulate_recon_batch_similarity_motion():
    """omega_max/s_max widen the motion family; defaults preserve the
    translation-only RNG stream bit-for-bit (pinned eval batches across
    builds depend on this)."""
    from event_utils_tpu.training import simulate_recon_batch

    vox_a, frm_a = simulate_recon_batch(
        jax.random.PRNGKey(3), 1, (24, 32), 1024, 2, v_max=15.0,
        window_t=0.08, num_bins=2)
    vox_b, frm_b = simulate_recon_batch(
        jax.random.PRNGKey(3), 1, (24, 32), 1024, 2, v_max=15.0,
        window_t=0.08, num_bins=2, omega_max=0.0, s_max=0.0)
    assert np.array_equal(np.asarray(vox_a), np.asarray(vox_b))

    vox_r, frm_r = simulate_recon_batch(
        jax.random.PRNGKey(3), 1, (24, 32), 1024, 2, v_max=0.0,
        window_t=0.08, num_bins=2, omega_max=8.0)
    v = np.asarray(vox_r)
    f = np.asarray(frm_r)
    assert np.isfinite(v).all()
    # pure rotation still moves the scene (fires events, frames change)
    assert np.abs(v).sum() > 0
    assert not np.allclose(f[0], f[-1])


@pytest.mark.slow
def test_simulate_flow_batch_similarity_dense_gt():
    """Nonzero omega_max/s_max: dense (B, 2, H, W) similarity-field GT,
    spatially varying; defaults keep the (B, 2) uniform contract and the
    historical RNG stream."""
    from event_utils_tpu.training import simulate_flow_batch

    ev_a, m_a, gt_a = simulate_flow_batch(
        jax.random.PRNGKey(0), 2, (24, 32), 2048, v_max=30.0,
        window_t=0.12, num_frames=7)
    ev_b, m_b, gt_b = simulate_flow_batch(
        jax.random.PRNGKey(0), 2, (24, 32), 2048, v_max=30.0,
        window_t=0.12, num_frames=7, omega_max=0.0, s_max=0.0)
    assert gt_a.shape == (2, 2)
    assert np.array_equal(np.asarray(ev_a), np.asarray(ev_b))

    _, _, gt = simulate_flow_batch(
        jax.random.PRNGKey(1), 2, (24, 32), 2048, v_max=10.0,
        window_t=0.12, num_frames=7, omega_max=5.0, s_max=0.5)
    gt = np.asarray(gt)
    assert gt.shape == (2, 2, 24, 32)
    assert np.isfinite(gt).all()
    assert gt.std(axis=(2, 3)).max() > 0.1  # genuinely spatially varying


@pytest.mark.slow
def test_simulate_flow_batch_burn_in_steady_state():
    """burn_in=1: every valid event lies in the LAST window
    [window_t, 2*window_t) and the temporal event-mass ramp of a fresh
    sensor (first bin starved) is gone; GT keeps its contract. MEASURED
    motivation: fresh-sensor-trained nets overshoot flow ~1.7x on
    continuous recordings (see simulate_flow_batch docstring)."""
    from event_utils_tpu.training import simulate_flow_batch

    wt = 0.12
    ev, mask, gt = simulate_flow_batch(
        jax.random.PRNGKey(2), 2, (32, 32), 8192, v_max=25.0,
        window_t=wt, num_frames=7, omega_max=4.0, s_max=0.4, burn_in=1)
    ev, mask = np.asarray(ev), np.asarray(mask)
    assert np.asarray(gt).shape == (2, 2, 32, 32)
    fresh_first, steady_first = [], []
    for b in range(2):
        t = ev[b, :, 2][mask[b] > 0]
        assert t.size > 100
        assert t.min() >= wt - 1e-6 and t.max() <= 2 * wt + 1e-6
        h, _ = np.histogram((t - wt) / wt, bins=5, range=(0, 1))
        steady_first.append(h[0] / max(h.mean(), 1))
    ev0, mask0, _ = simulate_flow_batch(
        jax.random.PRNGKey(2), 2, (32, 32), 8192, v_max=25.0,
        window_t=wt, num_frames=7, omega_max=4.0, s_max=0.4)
    ev0, mask0 = np.asarray(ev0), np.asarray(mask0)
    for b in range(2):
        t = ev0[b, :, 2][mask0[b] > 0]
        h, _ = np.histogram(t / wt, bins=5, range=(0, 1))
        fresh_first.append(h[0] / max(h.mean(), 1))
    # fresh sensor: first-bin mass well below average; steady state: not
    assert np.mean(fresh_first) < 0.75
    assert np.mean(steady_first) > 0.8


@pytest.mark.slow
def test_sharded_in_the_loop_training():
    """In-the-loop training with a mesh: scene simulation + voxelize run
    sharded over the batch axis (virtual 8-device mesh), losses finite."""
    from jax.sharding import Mesh
    from event_utils_tpu.training import (FlowTrainer,
                                          ReconstructionTrainer,
                                          train_flow_in_the_loop,
                                          train_reconstruction_in_the_loop)

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    mesh = Mesh(np.array(devs), ("data",))

    tr = FlowTrainer(sensor_size=(16, 16), num_bins=2, learning_rate=2e-3,
                     mesh=mesh, supervised_weight=1.0)
    losses, aee = train_flow_in_the_loop(
        tr, steps=4, batch_size=len(devs), capacity=512, v_max=15.0,
        window_t=0.1, num_frames=5, log_every=2, eval_every=4,
        log_fn=lambda s: None)
    assert len(losses) == 4 and np.all(np.isfinite(losses))
    assert len(aee) == 1 and np.isfinite(aee[0][1])

    tr2 = ReconstructionTrainer(sensor_size=(16, 16), num_bins=2,
                                learning_rate=2e-3, mesh=mesh)
    l2, c2 = train_reconstruction_in_the_loop(
        tr2, steps=4, batch_size=len(devs), seq_len=2, capacity=1024,
        v_max=15.0, window_t=0.08, log_every=2, eval_every=4,
        log_fn=lambda s: None)
    assert len(l2) == 4 and np.all(np.isfinite(l2))
    assert len(c2) == 1 and np.isfinite(c2[0][1])

    with pytest.raises(ValueError):
        train_flow_in_the_loop(tr, steps=1, batch_size=len(devs) + 1,
                               capacity=512, log_fn=lambda s: None)


@pytest.mark.slow
def test_params_npz_roundtrip(rng, tmp_path):
    """save_params_npz/load_params_npz: weights + step survive the flat-npz
    round trip for both trainer families; mismatched architectures are a
    DataFormatError (the npz embeds model_kwargs as a sidecar entry)."""
    from event_utils_tpu.errors import DataFormatError
    from event_utils_tpu.training import FlowTrainer, ReconstructionTrainer
    from event_utils_tpu.training.checkpointing import (load_params_npz,
                                                        save_params_npz)

    tr = FlowTrainer(sensor_size=SENSOR, num_bins=BINS, learning_rate=1e-3)
    vox, events, mask = _voxel_batch(rng, batch=2)
    for _ in range(3):
        tr.train_batch(vox, events, mask)
    path = str(tmp_path / "flow.npz")
    save_params_npz(tr, path)
    p_saved = jax.tree.map(np.asarray, tr.params)
    tr.train_batch(vox, events, mask)  # diverge from the snapshot
    tr2 = FlowTrainer(sensor_size=SENSOR, num_bins=BINS, learning_rate=1e-3)
    assert load_params_npz(tr2, path) == 3
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), b), tr2.params, p_saved)

    kwargs = dict(sensor_size=SENSOR, num_bins=BINS, learning_rate=1e-3)
    rt = ReconstructionTrainer(
        model_kwargs={"recurrent_levels": 2}, **kwargs)
    rpath = str(tmp_path / "recon.npz")
    save_params_npz(rt, rpath)
    rt2 = ReconstructionTrainer(
        model_kwargs={"recurrent_levels": 2}, **kwargs)
    assert load_params_npz(rt2, rpath) == 0
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), rt2.params, rt.params)

    with pytest.raises(DataFormatError):
        load_params_npz(ReconstructionTrainer(**kwargs), rpath)


@pytest.mark.slow
def test_reconstruction_trainer_ema_and_mse(rng, tmp_path):
    """The PSNR-targeted fine-tune levers: ``mse_weight`` changes the loss
    (and still descends), ``ema_decay`` maintains a weight average that
    lags the raw params, is what ``reconstruct``/``save_params_npz`` use,
    and is re-seeded from loaded weights on ``load_params_npz``."""
    from event_utils_tpu.training import ReconstructionTrainer
    from event_utils_tpu.training.checkpointing import (load_params_npz,
                                                        save_params_npz)

    kwargs = dict(sensor_size=SENSOR, num_bins=BINS, learning_rate=1e-3)
    T = 3
    voxels = np.stack([np.asarray(_voxel_batch(rng)[0]) for _ in range(T)])
    frames = np.clip(voxels.sum(axis=2, keepdims=True) * 0.2 + 0.5, 0, 1)

    tr = ReconstructionTrainer(mse_weight=4.0, ema_decay=0.9, **kwargs)
    l_mse = tr.train_sequence(voxels, frames)
    tr_plain = ReconstructionTrainer(**kwargs)
    l_plain = tr_plain.train_sequence(voxels, frames)
    assert l_mse > l_plain  # same init (seed 0): MSE term adds loss mass

    # EMA lags the raw params (decay 0.9 over a few steps) but is not the
    # init either; reconstruct() must consume it.
    for _ in range(3):
        tr.train_sequence(voxels, frames)
    diff = jax.tree.map(
        lambda e, p: float(np.max(np.abs(np.asarray(e) - np.asarray(p)))),
        tr.ema_params, tr.params)
    assert max(jax.tree.leaves(diff)) > 1e-6
    assert tr.inference_params is tr.ema_params

    # Snapshot saves the EMA; loading re-seeds the EMA from the file.
    path = str(tmp_path / "ema.npz")
    save_params_npz(tr, path)
    ema_saved = jax.tree.map(np.asarray, tr.ema_params)
    tr2 = ReconstructionTrainer(mse_weight=4.0, ema_decay=0.9, **kwargs)
    load_params_npz(tr2, path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), b), tr2.params, ema_saved)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), b), tr2.ema_params, ema_saved)

    # reconstruct() runs on the EMA: perturbing the raw params must not
    # change its output.
    out1, _ = tr2.reconstruct(voxels)
    tr2.params = jax.tree.map(lambda p: p + 1.0, tr2.params)
    out2, _ = tr2.reconstruct(voxels)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_reconstruction_state_carry(rng):
    """State-carry training (long-horizon regime): a warm segment started
    from the previous segment's final_state must match training one long
    sequence in its forward statistics — specifically, the warm segment's
    loss equals the back half of a double-length cold sequence's per-window
    losses (same params, no optimizer coupling), and no burn-in is applied
    on warm segments."""
    from event_utils_tpu.training.reconstruction import ReconstructionTrainer

    kwargs = dict(sensor_size=SENSOR, num_bins=BINS, learning_rate=1e-3,
                  model_kwargs={"recurrent_levels": 2})
    T = 3
    voxels = np.stack([np.asarray(_voxel_batch(rng)[0]) for _ in range(2 * T)])
    frames = np.clip(voxels.sum(axis=2, keepdims=True) * 0.2 + 0.5, 0, 1)

    tr = ReconstructionTrainer(burn_in=1, **kwargs)
    p0 = jax.tree.map(np.asarray, tr.params)
    o0 = jax.tree.map(np.asarray, tr.opt_state)

    # reference: per-window losses of the full 2T unroll at the init params
    def scan_losses(vox, frm, state):
        losses = []
        for t in range(vox.shape[0]):
            pred, state = tr.model.apply(
                jax.tree.map(jnp.asarray, p0), vox[t], state)
            from event_utils_tpu.models.networks import reconstruction_loss
            losses.append(float(reconstruction_loss(pred, frm[t])))
        return losses, state

    ref_losses, _ = scan_losses(jnp.asarray(voxels), jnp.asarray(frames),
                                None)

    # segment 1 (cold, burn_in=1): mean of windows 1..T-1
    l1 = tr.train_sequence(voxels[:T], frames[:T])
    np.testing.assert_allclose(l1, np.mean(ref_losses[1:T]), rtol=1e-4)
    assert tr.final_state is not None

    # segment 2 (warm): loss mean over ALL T windows (no burn-in), at the
    # post-step-1 params — recompute the reference at those params
    p1 = jax.tree.map(np.asarray, tr.params)
    state_c = jax.tree.map(np.asarray, tr.final_state)

    def scan_losses_at(params, vox, frm, state):
        from event_utils_tpu.models.networks import reconstruction_loss
        losses = []
        state = jax.tree.map(jnp.asarray, state)
        params = jax.tree.map(jnp.asarray, params)
        for t in range(vox.shape[0]):
            pred, state = tr.model.apply(params, vox[t], state)
            losses.append(float(reconstruction_loss(pred, frm[t])))
        return losses

    # final_state after a cold step must equal the forward scan's state at
    # the PRE-step params (the step's own forward pass)
    _, ref_state = scan_losses(jnp.asarray(voxels[:T]),
                               jnp.asarray(frames[:T]), None)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        state_c, ref_state)

    ref2 = scan_losses_at(p1, jnp.asarray(voxels[T:]), jnp.asarray(frames[T:]),
                          state_c)
    l2 = tr.train_sequence(voxels[T:], frames[T:], state0=tr.final_state)
    np.testing.assert_allclose(l2, np.mean(ref2), rtol=1e-4)
    assert tr.step == 2


@pytest.mark.slow
def test_in_the_loop_carry_segments_runs(rng):
    """carry_segments>1 drives warm segments through the loop on the CPU
    backend; losses stay finite and the curve has the long eval."""
    from event_utils_tpu.training.in_the_loop import (
        train_reconstruction_in_the_loop)
    from event_utils_tpu.training.reconstruction import ReconstructionTrainer

    tr = ReconstructionTrainer(sensor_size=(32, 32), num_bins=3,
                               learning_rate=1e-3, burn_in=1)
    losses, curve = train_reconstruction_in_the_loop(
        tr, steps=4, batch_size=1, seq_len=2, capacity=4096,
        carry_segments=2, window_t=0.02, eval_every=4, log_every=2,
        log_fn=lambda *a: None)
    assert len(losses) == 4 and np.isfinite(losses).all()
    assert tr.step == 4
    assert len(curve) == 1


def test_simulate_flow_batch_gt_matches_render_advected_center():
    """The similarity family's TRUE field has an ADVECTED center:
    u(p, t) = v + (omega J + s)(p - c - v t). Verify via the optical-flow
    constraint that backward-warping the render by the corrected field
    explains frame motion at an aged window far better than the stale
    t = 0 field (r5 fix: old steady-window supervision carried ~10 px/s
    of systematic label noise)."""
    import jax
    import jax.numpy as jnp

    from event_utils_tpu.simulation.esim import smooth_texture
    from event_utils_tpu.training.in_the_loop import _render_similarity

    H = W = 64
    tex = smooth_texture(jax.random.PRNGKey(1), (H, W), octaves=3)
    v = jnp.asarray([24.0, -15.0])
    om, s = 4.0, 0.35
    t_ref, dt = 1.3, 1e-3
    r0 = _render_similarity(tex, v, om, s, jnp.float32(t_ref))
    r1 = _render_similarity(tex, v, om, s, jnp.float32(t_ref + dt))
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) - cy,
                          jnp.arange(W, dtype=jnp.float32) - cx,
                          indexing="ij")
    rx = xx - v[0] * t_ref
    ry = yy - v[1] * t_ref
    u = v[0] - om * ry + s * rx
    w = v[1] + om * rx + s * ry

    def residual(uu, ww):
        samp = jax.scipy.ndimage.map_coordinates(
            r1, [yy + cy + ww * dt, xx + cx + uu * dt], order=1,
            mode="wrap")
        return float(jnp.abs(samp - r0)[8:-8, 8:-8].mean())

    err_corrected = residual(u, w)
    err_stale = residual(v[0] - om * yy + s * xx, v[1] + om * xx + s * yy)
    assert err_corrected < 0.35 * err_stale, (err_corrected, err_stale)


@pytest.mark.slow  # three full sims; the gt-matches and contract tests keep fast coverage
def test_simulate_flow_batch_age_and_mix_defaults_bitwise():
    """age_max=0 / fresh_prob=0 must keep the historical RNG stream
    bit-for-bit (fold_in keys only when the features are on)."""
    import jax
    import jax.numpy as jnp

    from event_utils_tpu.training.in_the_loop import simulate_flow_batch

    k = jax.random.PRNGKey(5)
    kw = dict(batch_size=2, sensor_size=(32, 32), capacity=4096,
              omega_max=6.0, s_max=0.6, burn_in=1, return_saturation=True)
    a = simulate_flow_batch(k, **kw)
    b = simulate_flow_batch(k, age_max=0.0, fresh_prob=0.0, **kw)
    assert all(bool(jnp.allclose(x, y)) for x, y in zip(a, b))
    # widened diet produces valid, differently-masked batches
    c = simulate_flow_batch(k, age_max=1.5, fresh_prob=0.5, **kw)
    assert float(c[1].sum()) > 0
    assert not bool(jnp.allclose(a[1], c[1]))
