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
    an in-loop cadence already wrote)."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        if trainer.step in mngr.all_steps():
            return
        mngr.save(trainer.step, args=ocp.args.StandardSave(
            {"params": trainer.params, "opt_state": trainer.opt_state}))
        mngr.wait_until_finished()


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
