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


def save_params_npz(trainer, path: str) -> None:
    """Dump ``trainer.params`` (weights only, no optimizer state) as one
    flat ``.npz`` keyed by tree path, plus ``__step__`` and a
    ``__model_json__`` sidecar entry.

    Rationale: the orbax directory is a bulk artifact (gitignored, lost on
    container resets); a production run's *final weights* are small enough
    to commit, which is what makes a multi-session training schedule
    actually resumable in this environment."""
    import json

    import jax
    import numpy as np

    # The deliverable weights: the EMA when the trainer maintains one
    # (it is what evals/inference use), else the raw params.
    params = getattr(trainer, "inference_params", trainer.params)
    leaves_with_paths, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(leaf)
              for kp, leaf in leaves_with_paths}
    arrays["__step__"] = np.asarray(int(trainer.step), np.int64)
    arrays["__model_json__"] = np.frombuffer(
        json.dumps(getattr(trainer, "model_kwargs", {}) or {})
        .encode(), np.uint8)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def read_model_json_npz(path: str) -> dict:
    """Read a :func:`save_params_npz` snapshot's ``__model_json__``
    architecture sidecar (``{}`` for snapshots that predate it). The
    format is owned here — every CLI that needs the snapshot's
    architecture goes through this helper."""
    import json

    import numpy as np

    with np.load(path) as z:
        if "__model_json__" not in z:
            return {}
        return json.loads(bytes(z["__model_json__"]).decode())


def load_params_npz(trainer, path: str) -> int:
    """Restore weights saved by :func:`save_params_npz` into
    ``trainer.params`` (optimizer state is re-initialized — use the orbax
    checkpoint when bitwise resume matters). Returns the saved step."""
    import json

    import jax
    import numpy as np

    from ..errors import DataFormatError

    z = np.load(path)
    saved_kwargs = json.loads(bytes(z["__model_json__"]).decode())
    have = dict(getattr(trainer, "model_kwargs", {}) or {})
    if saved_kwargs != have:
        raise DataFormatError(
            f"params file was saved for model_kwargs={saved_kwargs}, "
            f"trainer has {have}")
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        trainer.params)
    new_leaves = []
    for kp, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(kp)
        if key not in z:
            raise DataFormatError(f"params file missing leaf {key}")
        arr = z[key]
        if arr.shape != leaf.shape:
            raise DataFormatError(
                f"leaf {key}: saved shape {arr.shape} != trainer "
                f"{leaf.shape}")
        new_leaves.append(arr.astype(leaf.dtype))
    trainer.params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if hasattr(trainer, "tx"):
        trainer.opt_state = trainer.tx.init(trainer.params)
    if getattr(trainer, "ema_params", None) is not None:
        # Re-seed the EMA from the loaded weights — the construction-time
        # copy tracks the *random init*, which would poison every eval
        # until the decay horizon washes it out.
        trainer.ema_params = jax.tree.map(np.copy, trainer.params)
    trainer.step = int(z["__step__"])
    return trainer.step


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
    if getattr(trainer, "ema_params", None) is not None:
        import jax
        import numpy as np
        trainer.ema_params = jax.tree.map(np.copy, trainer.params)
    trainer.step = step
    return step
