"""E2VID reconstruction training: recurrent voxel-to-intensity supervision.

Complements ``FlowTrainer``: the E2VID model is recurrent, so training runs
over *sequences* of voxel grids with ConvGRU state threaded through and the
loss summed over the unrolled window (truncated BPTT). Supervision comes
from the time-synchronized frames the dataset layer already loads
(``between_frames`` windowing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ReconstructionTrainer:
    """Supervised E2VID trainer over (sequence, batch, C, H, W) voxel
    sequences and (sequence, batch, 1, H, W) target frames."""

    def __init__(self, sensor_size=(64, 64), num_bins: int = 5,
                 combined_channels: bool = False,
                 learning_rate: float = 1e-4, mesh: Optional[Mesh] = None,
                 lpips_weight: float = 0.0, seed: int = 0,
                 model_kwargs: Optional[dict] = None, burn_in: int = 0,
                 mse_weight: float = 0.0, ema_decay: float = 0.0):
        """``model_kwargs`` are forwarded to :class:`models.networks.E2VID`
        (e.g. ``recurrent_levels``, ``num_res_blocks``, ``base_features``)
        and recorded in the checkpoint's ``model.json`` sidecar so inference
        can rebuild the matching parameter tree. ``burn_in`` drops the loss
        of the first N windows of every training sequence (the GRU state is
        still threaded through them) — the net is scored only where its
        state has history, matching how a long-running reconstruction is
        actually used. ``ema_decay`` > 0 maintains an exponential moving
        average of the weights updated inside the train step;
        :meth:`reconstruct` (and therefore evals and the committable
        snapshot) then uses the EMA — the standard late-training variance
        killer."""
        from ..models.networks import E2VID, reconstruction_loss

        self.sensor_size = tuple(sensor_size)
        self.model_kwargs = dict(model_kwargs or {})
        self.burn_in = int(burn_in)
        self.model = E2VID(**self.model_kwargs)
        self.num_bins = num_bins
        self.combined_channels = combined_channels
        channels = num_bins if combined_channels else 2 * num_bins
        dummy = jnp.zeros((1, channels) + self.sensor_size, jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy, None)
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.ema_decay = float(ema_decay)
        self.ema_params = (jax.tree.map(jnp.copy, self.params)
                           if self.ema_decay else None)
        self.step = 0

        def zero_state(params, vox0):
            # zero init state, shaped abstractly (eval_shape traces without
            # executing — no throwaway forward pass)
            _, state_sd = jax.eval_shape(
                lambda p, v: self.model.apply(p, v, None), params, vox0)
            return jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), state_sd)

        def seq_loss(params, voxels, frames, state0, burn_in):
            def scan_fn(state, inp):
                vox, frame = inp
                pred, state = self.model.apply(params, vox, state)
                return state, reconstruction_loss(pred, frame,
                                                  lpips_weight=lpips_weight,
                                                  mse_weight=mse_weight)

            state_f, losses = jax.lax.scan(scan_fn, state0, (voxels, frames))
            if burn_in:
                if burn_in >= voxels.shape[0]:
                    from ..errors import ConfigurationError
                    raise ConfigurationError(
                        f"burn_in={burn_in} must be < seq_len="
                        f"{voxels.shape[0]} (no supervised windows left)")
                losses = losses[burn_in:]
            return jnp.mean(losses), state_f

        def make_train_step(burn_in, warm):
            """``warm=False``: zero initial GRU state, ``burn_in`` applied.
            ``warm=True``: the caller passes the previous segment's final
            state (same continuing scene) — no burn-in, the state already
            has history. BPTT stays truncated at the segment boundary
            (the carried state is a constant to this step's gradient)."""

            def train_step(params, opt_state, ema, voxels, frames, state0):
                if not warm:
                    state0 = zero_state(params, voxels[0])
                (loss, state_f), grads = jax.value_and_grad(
                    seq_loss, has_aux=True)(
                        params, voxels, frames, state0,
                        0 if warm else burn_in)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if self.ema_decay:
                    d = self.ema_decay
                    ema = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p,
                                       ema, params)
                return (params, opt_state, ema, loss,
                        jax.lax.stop_gradient(state_f))

            return train_step

        if mesh is not None:
            axis = mesh.axis_names[0]
            batch_sh = NamedSharding(mesh, P(None, axis))  # (seq, batch, ...)
            state_sh = NamedSharding(mesh, P(axis))        # (batch, ...)
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            if self.ema_params is not None:
                self.ema_params = jax.device_put(self.ema_params, repl)

            def jit_step(warm):
                return jax.jit(
                    make_train_step(self.burn_in, warm),
                    in_shardings=(repl, repl, repl, batch_sh, batch_sh,
                                  state_sh if warm else None),
                    out_shardings=(repl, repl, repl, repl, state_sh),
                    donate_argnums=(0, 1, 2) + ((5,) if warm else ()))
        else:
            def jit_step(warm):
                return jax.jit(
                    make_train_step(self.burn_in, warm),
                    donate_argnums=(0, 1, 2) + ((5,) if warm else ()))

        self._train_step = jit_step(warm=False)
        self._jit_step = jit_step
        self._train_step_warm = None  # compiled on first warm call
        #: final ConvGRU state of the last train step (stop-gradient,
        #: batch-leading pytree) — pass back as ``state0`` to continue the
        #: same scenes in the next segment (truncated-BPTT state carry)
        self.final_state = None

    def train_sequence_async(self, voxels, frames, state0=None):
        """One truncated-BPTT step; returns the loss as a device scalar
        WITHOUT synchronizing (convert with float() at log points so the
        host keeps dispatching ahead of the device).

        ``state0``: optional initial ConvGRU state — the previous
        segment's :attr:`final_state` when ``voxels`` continues the same
        scenes (no burn-in is applied then; the state already has
        history). Default starts from zero state with the configured
        ``burn_in``. Either way :attr:`final_state` is refreshed.

        @param voxels ``(T, B, C, H, W)`` voxel-grid sequence
        @param frames ``(T, B, 1, H, W)`` target frames in [0, 1]
        """
        if state0 is None:
            step_fn, extra = self._train_step, (0,)
        else:
            if self._train_step_warm is None:
                self._train_step_warm = self._jit_step(warm=True)
            step_fn, extra = self._train_step_warm, (state0,)
        (self.params, self.opt_state, self.ema_params, loss,
         self.final_state) = step_fn(
            self.params, self.opt_state, self.ema_params,
            jnp.asarray(voxels, jnp.float32),
            jnp.asarray(frames, jnp.float32), *extra)
        self.step += 1
        return loss

    def train_sequence(self, voxels, frames, state0=None) -> float:
        """Synchronous :meth:`train_sequence_async` (returns a float)."""
        return float(self.train_sequence_async(voxels, frames, state0))

    @property
    def inference_params(self):
        """The deliverable weights: the EMA when enabled, else the raw
        params — what evals, snapshots and inference consume."""
        return (self.ema_params if self.ema_params is not None
                else self.params)

    def reconstruct(self, voxels, state=None):
        """Run inference over a ``(T, B, C, H, W)`` sequence; returns
        ``(images (T, B, 1, H, W), final_state)``. Uses the EMA weights
        when ``ema_decay`` is enabled."""
        voxels = jnp.asarray(voxels, jnp.float32)
        params = self.inference_params

        def scan_fn(state, vox):
            pred, state = self.model.apply(params, vox, state)
            return state, pred

        if state is None:
            _, state_sd = jax.eval_shape(
                lambda p, v: self.model.apply(p, v, None),
                params, voxels[0])
            state = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), state_sd)
        state, preds = jax.lax.scan(scan_fn, state, voxels)
        return preds, state

    # checkpointing mirrors FlowTrainer (shared plumbing)
    def save_checkpoint(self, ckpt_dir: str):
        from .checkpointing import save_trainer_checkpoint
        save_trainer_checkpoint(self, ckpt_dir)

    def restore_checkpoint(self, ckpt_dir: str, step: Optional[int] = None):
        from .checkpointing import restore_trainer_checkpoint
        return restore_trainer_checkpoint(self, ckpt_dir, step)
