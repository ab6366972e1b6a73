"""Training runtime: sharded train step, checkpointing, the training loop.

New framework territory (the reference has no training code, SURVEY.md §5.4):
a compact but production-shaped training stack —

- ``TrainState``-style pytree (params / opt_state / step) with optax,
- batch-data-parallel sharding over a device mesh (the right decomposition
  for these convnets: parameters replicate, the batch axis splits; TP/PP
  have no workload here and are deliberately absent — see SURVEY.md §5.7),
- one jitted ``train_step`` with donated state,
- orbax checkpoint save/restore for elastic resume,
- a loop driving the streaming loaders with device prefetch.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


class FlowTrainer:
    """Self-supervised EV-FlowNet trainer over padded event/voxel batches.

    @param sensor_size (H, W) — must be divisible by 2^depth (pad with
        ``utils.util.CropParameters`` otherwise)
    @param mesh Optional ``jax.sharding.Mesh``; when given, batches shard on
        the leading axis and parameters replicate (pure DP: psum-free —
        XLA inserts the gradient all-reduce from the sharding annotations).
    """

    def __init__(self, sensor_size=(64, 64), num_bins: int = 5,
                 combined_channels: bool = False, learning_rate: float = 1e-4,
                 mesh: Optional[Mesh] = None, seed: int = 0,
                 smoothness_weight: float = 0.5,
                 supervised_weight: float = 0.0):
        from ..models.networks import EVFlowNet, contrast_flow_loss

        self.sensor_size = tuple(sensor_size)
        self.model = EVFlowNet()
        self.mesh = mesh
        self.num_bins = num_bins
        self.combined_channels = combined_channels
        self.supervised_weight = float(supervised_weight)
        channels = num_bins if combined_channels else 2 * num_bins
        dummy = jnp.zeros((1, channels) + self.sensor_size, jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.step = 0

        H, W = self.sensor_size
        sup_w = self.supervised_weight

        def loss_fn(params, voxel, events, mask, gt_flow):
            flow = self.model.apply(params, voxel)
            loss = contrast_flow_loss(flow, events, mask, (H, W),
                                      smoothness_weight=smoothness_weight)
            if sup_w:
                # sim-supervised term: AEE vs the (B, 2, H, W) ground-truth
                # field — available when training on simulated scenes
                loss = loss + sup_w * jnp.mean(
                    jnp.linalg.norm(flow - gt_flow, axis=1))
            return loss

        def train_step(params, opt_state, voxel, events, mask, gt_flow):
            loss, grads = jax.value_and_grad(loss_fn)(params, voxel, events,
                                                      mask, gt_flow)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if mesh is not None:
            axis = mesh.axis_names[0]
            batch_sharding = NamedSharding(mesh, P(axis))
            repl = NamedSharding(mesh, P())
            self._batch_sharding = batch_sharding
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, batch_sharding, batch_sharding,
                              batch_sharding, batch_sharding),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1))
        else:
            self._batch_sharding = None
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def _place(self, arr):
        arr = jnp.asarray(arr, jnp.float32)
        if self._batch_sharding is not None:
            arr = jax.device_put(arr, self._batch_sharding)
        return arr

    def train_batch_async(self, voxel, events, mask, gt_flow=None):
        """One optimization step on a (B, C, H, W) voxel batch + its raw
        padded events. Returns the loss as a device scalar WITHOUT
        synchronizing — convert with float() only when you need the value,
        so the host keeps dispatching ahead of the device.

        ``gt_flow`` (B, 2, H, W) feeds the sim-supervised term when the
        trainer was built with ``supervised_weight > 0`` (ignored — and
        optional — otherwise)."""
        if gt_flow is None:
            if self.supervised_weight:
                raise ValueError("trainer has supervised_weight > 0; "
                                 "train_batch needs gt_flow")
            B = jnp.shape(voxel)[0]
            gt_flow = jnp.zeros((B, 2) + self.sensor_size, jnp.float32)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, self._place(voxel),
            self._place(events), self._place(mask), self._place(gt_flow))
        self.step += 1
        return loss

    def train_batch(self, voxel, events, mask, gt_flow=None) -> float:
        """Synchronous `train_batch_async` (returns the loss float)."""
        return float(self.train_batch_async(voxel, events, mask, gt_flow))

    def predict(self, voxel):
        return self.model.apply(self.params, self._place(voxel))

    # ------------------------------------------------------------------
    # Checkpointing (orbax)
    # ------------------------------------------------------------------

    def save_checkpoint(self, ckpt_dir: str):
        """Save params/opt_state/step with orbax (atomic, resumable;
        same-step re-save is a no-op)."""
        from .checkpointing import save_trainer_checkpoint
        save_trainer_checkpoint(self, ckpt_dir)

    def restore_checkpoint(self, ckpt_dir: str, step: Optional[int] = None):
        from .checkpointing import restore_trainer_checkpoint
        return restore_trainer_checkpoint(self, ckpt_dir, step)

    # ------------------------------------------------------------------
    def fit(self, loader, epochs: int = 1,
            log_every: int = 10, ckpt_dir: Optional[str] = None,
            ckpt_every: int = 500, prefetch_depth: int = 2,
            log_fn: Callable[[str], None] = print):
        """Drive a streaming loader (``NativeWindowedLoader`` /
        ``EventDataLoader`` batches with ``events``+``events_mask``) for
        ``epochs`` passes, voxelizing on device with the trainer's own
        ``num_bins``/``combined_channels`` (the model's input width was
        fixed at construction), logging Mev/s throughput.

        The loop stays async: device losses are converted to floats only
        at log points, so a train step's D2H never blocks the next batch's
        dispatch.
        """
        import time

        from ..data_loaders.prefetch import device_prefetch
        from ..representations.voxel_grid import (events_to_neg_pos_voxel,
                                                  events_to_voxel)

        H, W = self.sensor_size
        num_bins, combined = self.num_bins, self.combined_channels
        # The native loaders rotate 4 host buffers (2 queued + 1 yielded +
        # 1 being filled): deeper prefetch would hand a queued buffer back
        # to the filler while its H2D copy may still be in flight.
        prefetch_depth = min(prefetch_depth, 2)

        @jax.jit
        def voxelize(events, mask):
            def one(ev, m):
                xs, ys, ts, ps = ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3]
                if combined:
                    return events_to_voxel(xs, ys, ts, ps, num_bins,
                                           sensor_size=(H, W), mask=m)
                vp, vn = events_to_neg_pos_voxel(xs, ys, ts, ps, num_bins,
                                                 sensor_size=(H, W), mask=m)
                return jnp.concatenate([vp, vn], 0)

            return jax.vmap(one)(events, mask)

        losses = []
        for epoch in range(epochs):
            t0 = time.perf_counter()
            n_events_dev = jnp.zeros((), jnp.float32)  # lazy device count
            pending = []  # device loss scalars awaiting a log point
            for i, batch in enumerate(
                    device_prefetch(loader, prefetch_depth=prefetch_depth)):
                events = jnp.asarray(batch["events"], jnp.float32)
                mask = jnp.asarray(batch["events_mask"], jnp.float32)
                voxel = voxelize(events, mask)
                pending.append(self.train_batch_async(voxel, events, mask))
                n_events_dev = n_events_dev + mask.sum()
                if log_every and (i + 1) % log_every == 0:
                    losses.extend(float(x) for x in pending)
                    pending = []
                    rate = float(n_events_dev) / (
                        time.perf_counter() - t0) / 1e6
                    log_fn(f"epoch {epoch} step {self.step}: "
                           f"loss {losses[-1]:.5f}, {rate:.1f} Mev/s "
                           "ingested")
                if ckpt_dir and self.step % ckpt_every == 0:
                    self.save_checkpoint(ckpt_dir)
            losses.extend(float(x) for x in pending)
        if ckpt_dir:
            self.save_checkpoint(ckpt_dir)
        return losses
