"""Training runtime: sharded train steps, orbax checkpointing, loops."""

from .loop import FlowTrainer  # noqa: F401
