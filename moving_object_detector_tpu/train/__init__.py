"""Training: the flow network's supervised/self-supervised training loop.

The reference ships frozen Caffe weights (dockerfile:108-111) with no
training story; here the flow net is trainable in-framework (SURVEY.md §7
step 7: architecture parity + retuned weights), with dp+tp sharding over a
device mesh and orbax checkpointing.
"""

from .flow_trainer import (
    FlowTrainState,
    create_train_state,
    flow_loss,
    make_sharded_train_step,
    synthetic_flow_batch,
    train_step,
)

__all__ = [
    "FlowTrainState",
    "create_train_state",
    "flow_loss",
    "make_sharded_train_step",
    "synthetic_flow_batch",
    "train_step",
]
