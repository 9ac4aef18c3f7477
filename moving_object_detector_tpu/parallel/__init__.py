"""Multi-chip scaling: meshes, shardings, and the data-parallel pipeline.

The reference's "distribution" story is 4 docker containers on one ROS
master (SURVEY.md §2.4); here scaling is a jax.sharding Mesh: camera streams
/ frame batches are data-parallel across chips, flow-net training shards
batch (dp) and conv channels (tp), and XLA inserts the ICI collectives.
"""

from .mesh import (
    create_mesh,
    flow_param_sharding,
    make_pipeline_mesh,
    shard_batch,
)
from .spatial import compute_disparity_spatial, flow_forward_spatial

__all__ = [
    "create_mesh",
    "flow_param_sharding",
    "make_pipeline_mesh",
    "shard_batch",
    "compute_disparity_spatial",
    "flow_forward_spatial",
]
