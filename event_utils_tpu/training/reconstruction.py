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

        def seq_loss(params, voxels, frames):
            def scan_fn(state, inp):
                vox, frame = inp
                pred, state = self.model.apply(params, vox, state)
                return state, reconstruction_loss(pred, frame,
                                                  lpips_weight=lpips_weight,
                                                  mse_weight=mse_weight)

            # zero init state, shaped abstractly (eval_shape traces without
            # executing — no throwaway forward pass)
            _, state_sd = jax.eval_shape(
                lambda p, v: self.model.apply(p, v, None), params, voxels[0])
            state0 = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), state_sd)
            _, losses = jax.lax.scan(scan_fn, state0, (voxels, frames))
            if self.burn_in:
                if self.burn_in >= voxels.shape[0]:
                    from ..errors import ConfigurationError
                    raise ConfigurationError(
                        f"burn_in={self.burn_in} must be < seq_len="
                        f"{voxels.shape[0]} (no supervised windows left)")
                losses = losses[self.burn_in:]
            return jnp.mean(losses)

        def train_step(params, opt_state, ema, voxels, frames):
            loss, grads = jax.value_and_grad(seq_loss)(params, voxels, frames)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.ema_decay:
                d = self.ema_decay
                ema = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p,
                                   ema, params)
            return params, opt_state, ema, loss

        if mesh is not None:
            axis = mesh.axis_names[0]
            batch_sh = NamedSharding(mesh, P(None, axis))  # (seq, batch, ...)
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            if self.ema_params is not None:
                self.ema_params = jax.device_put(self.ema_params, repl)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, repl, batch_sh, batch_sh),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1, 2))
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    def train_sequence_async(self, voxels, frames):
        """One truncated-BPTT step; returns the loss as a device scalar
        WITHOUT synchronizing (convert with float() at log points so the
        host keeps dispatching ahead of the device).

        @param voxels ``(T, B, C, H, W)`` voxel-grid sequence
        @param frames ``(T, B, 1, H, W)`` target frames in [0, 1]
        """
        self.params, self.opt_state, self.ema_params, loss = \
            self._train_step(
                self.params, self.opt_state, self.ema_params,
                jnp.asarray(voxels, jnp.float32),
                jnp.asarray(frames, jnp.float32))
        self.step += 1
        return loss

    def train_sequence(self, voxels, frames) -> float:
        """Synchronous :meth:`train_sequence_async` (returns a float)."""
        return float(self.train_sequence_async(voxels, frames))

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
