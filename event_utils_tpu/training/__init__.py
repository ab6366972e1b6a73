"""Training runtime: sharded train steps, orbax checkpointing, loops."""

from .loop import FlowTrainer  # noqa: F401
from .reconstruction import ReconstructionTrainer  # noqa: F401
