"""Mesh construction and sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs
and params, let XLA insert collectives.

* ``data`` axis: camera streams / frame batches — the production scaling
  dimension (BASELINE.json configs[4]: batched camera streams on v5e-8).
  Pure data parallelism: no cross-shard communication in the detection
  pipeline's forward path; gradients all-reduce over ICI during flow-net
  training.
* ``model`` axis: tensor parallelism for the flow network's convolutions —
  kernels shard on output channels, activations stay replicated within a
  data shard; XLA inserts the all-gathers/reduce-scatters where layers
  consume differently-sharded operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """A (data, model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def make_pipeline_mesh(n_devices: int | None = None) -> Mesh:
    """Pure data-parallel mesh for the detection pipeline (streams axis)."""
    return create_mesh(n_devices, model_parallel=1)


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of (B, ...) arrays with the batch dim over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def _conv_kernel_spec(path: tuple, leaf) -> P:
    """Sharding rule for flow-net params: shard conv kernels and biases on
    the output-channel axis over 'model' when cleanly divisible."""
    names = [getattr(p, "key", str(p)) for p in path]
    is_kernel = names and names[-1] == "kernel"
    is_bias = names and names[-1] == "bias"
    if hasattr(leaf, "shape") and leaf.ndim >= 1:
        out_ch = leaf.shape[-1]
        if (is_kernel or is_bias) and out_ch % 2 == 0 and out_ch > 2:
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def flow_param_sharding(mesh: Mesh, params):
    """NamedSharding tree for PWC-Net params: tensor-parallel output-channel
    sharding over the 'model' axis (replicated where indivisible)."""
    def to_sharding(path, leaf):
        return NamedSharding(mesh, _conv_kernel_spec(path, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)
