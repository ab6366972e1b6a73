"""Training runtime: sharded train steps, orbax checkpointing, loops."""

from .in_the_loop import (simulate_flow_batch,  # noqa: F401
                          simulate_recon_batch,
                          train_flow_in_the_loop,
                          train_reconstruction_in_the_loop)
from .loop import FlowTrainer  # noqa: F401
from .reconstruction import ReconstructionTrainer  # noqa: F401
