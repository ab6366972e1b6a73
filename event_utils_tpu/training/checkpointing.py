"""Shared orbax checkpoint plumbing for the trainers.

One implementation of the save/restore contract both ``FlowTrainer`` and
``ReconstructionTrainer`` use: atomic StandardSave of
``{params, opt_state}`` keyed by step, same-step re-save as a no-op, and a
clear error when restoring from an empty directory.
"""

from __future__ import annotations

import os
from typing import Optional

from ..errors import DataNotFoundError


def save_trainer_checkpoint(trainer, ckpt_dir: str) -> None:
    """Save ``trainer.{params, opt_state}`` at ``trainer.step``.

    Saving a step that already exists is a no-op (orbax raises
    StepAlreadyExistsError otherwise — e.g. a final save landing on a step
    an in-loop cadence already wrote).

    Non-default model architectures (``trainer.model_kwargs``) are recorded
    once in a ``model.json`` sidecar so inference CLIs / resumed stages can
    rebuild the matching parameter tree (see :func:`read_model_config`)."""
    import orbax.checkpoint as ocp

    kwargs = getattr(trainer, "model_kwargs", None)
    if kwargs:
        import json

        os.makedirs(os.path.abspath(ckpt_dir), exist_ok=True)
        path = os.path.join(os.path.abspath(ckpt_dir), "model.json")
        if not os.path.exists(path):
            with open(path, "w") as f:
                json.dump({"model_kwargs": kwargs}, f)
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        if trainer.step in mngr.all_steps():
            return
        mngr.save(trainer.step, args=ocp.args.StandardSave(
            {"params": trainer.params, "opt_state": trainer.opt_state}))
        mngr.wait_until_finished()


def read_model_config(ckpt_dir: str) -> dict:
    """Model kwargs recorded by :func:`save_trainer_checkpoint` (``{}`` for
    default-architecture checkpoints, which write no sidecar)."""
    import json

    path = os.path.join(os.path.abspath(ckpt_dir), "model.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return dict(json.load(f).get("model_kwargs", {}))


def restore_trainer_checkpoint(trainer, ckpt_dir: str,
                               step: Optional[int] = None) -> int:
    """Restore into ``trainer.{params, opt_state, step}``; returns the
    restored step."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        if step is None:
            step = mngr.latest_step()
            if step is None:
                raise DataNotFoundError(
                    f"no checkpoints under {ckpt_dir}")
        restored = mngr.restore(step, args=ocp.args.StandardRestore(
            {"params": trainer.params, "opt_state": trainer.opt_state}))
    trainer.params = restored["params"]
    trainer.opt_state = restored["opt_state"]
    trainer.step = step
    return step
