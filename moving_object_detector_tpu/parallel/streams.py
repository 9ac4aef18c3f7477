"""Batched multi-camera pipelines: data parallelism over streams.

The production scaling story (BASELINE.json configs[4]: batched camera
streams on v5e-8; SURVEY.md §2.4 last row): the fused frame program is
vmapped over a stream axis and the batch is placed over the mesh's ``data``
axis, so N cameras run as one SPMD program — the pipeline's forward path has
no cross-stream communication, so scaling is embarrassingly parallel over
ICI with zero collectives.

Also useful single-chip: a batch of streams amortizes kernel launch and
dispatch overheads for maximum pairs/sec throughput.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..pipeline import PipelineState, detect_step
from ..types import StereoModel


def create_stream_states(config: PipelineConfig, n_streams: int):
    """A batch of fresh PipelineStates (leading stream axis)."""
    return jax.vmap(lambda _: PipelineState.create(config))(
        jnp.arange(n_streams)
    )


@partial(jax.jit, static_argnames=("config", "flow_model"))
def detect_step_batched(
    flow_params,
    states,
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    ts: jnp.ndarray,
    stereo: StereoModel,
    config: PipelineConfig,
    flow_model=None,
    flow_overrides: jnp.ndarray | None = None,
    disparity_overrides=None,
):
    """vmapped detect_step over a leading stream axis.

    Args mirror detect_step with a leading N dimension on states/images/
    timestamps (flow params and stereo calibration are shared across
    streams; per-stream calibration would vmap over stereo too). The
    optional overrides carry externally computed per-stream perception
    results — e.g. the spatially sharded SGM/flow kernels
    (parallel/spatial.py detect_step_streams_spatial)."""

    def one(state, left, right, t, flow_override, disparity_override):
        return detect_step(
            flow_params,
            state,
            left,
            right,
            t,
            stereo,
            config,
            flow_model=flow_model,
            flow_override=flow_override,
            disparity_override=disparity_override,
        )

    # None can't pass through vmap: pin absent overrides as broadcast None
    # via in_axes.
    in_axes = (
        0, 0, 0, 0,
        None if flow_overrides is None else 0,
        None if disparity_overrides is None else 0,
    )
    return jax.vmap(one, in_axes=in_axes)(
        states, lefts, rights, ts, flow_overrides, disparity_overrides
    )


def shard_streams(mesh: Mesh, *arrays):
    """Place leading-stream-axis arrays over the mesh's 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(
        jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), a)
        for a in arrays
    )
    return out if len(out) > 1 else out[0]
