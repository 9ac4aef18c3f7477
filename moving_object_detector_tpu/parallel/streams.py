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
def detect_step_streams_scan(
    flow_params,
    states,
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    ts: jnp.ndarray,
    stereo: StereoModel,
    config: PipelineConfig,
    flow_model=None,
):
    """Sequential multi-stream stepping: lax.map over the stream axis.

    The SUPPORTED single-chip multi-stream entry point. Each stream's
    frame program runs unbatched inside one compiled scan, so the Pallas
    kernels keep their single-stream lowering (no SMEM-scalar batching,
    no vmap degradation) and aggregate throughput is ~N x the
    single-stream frame time — serialization, not parallelism, which on
    one chip is the honest ceiling anyway (the vmapped form measured
    0.5-6x SLOWER than this and its XLA-kernel variant crashed the TPU
    worker; BENCH_MATRIX r4). Multi-chip scaling instead shards streams
    one-per-chip (parallel/spatial.py detect_step_streams_spatial).

    Args mirror detect_step_batched (leading N axis on states/images/ts;
    shared flow params + calibration).
    """

    def one(xs):
        state, left, right, t = xs
        return detect_step(
            flow_params, state, left, right, t, stereo, config,
            flow_model=flow_model,
        )

    return jax.lax.map(one, (states, lefts, rights, ts))


@partial(
    jax.jit, static_argnames=("config", "flow_model", "unsafe_vmap_on_tpu")
)
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
    unsafe_vmap_on_tpu: bool = False,
):
    """vmapped detect_step over a leading stream axis.

    Args mirror detect_step with a leading N dimension on states/images/
    timestamps (flow params and stereo calibration are shared across
    streams; per-stream calibration would vmap over stereo too). The
    optional overrides carry externally computed per-stream perception
    results — e.g. the spatially sharded SGM/flow kernels
    (parallel/spatial.py detect_step_streams_spatial).

    GUARDED on accelerators: the vmapped pipeline is single-chip DEAD
    (BENCH_MATRIX r4: vmapped Pallas 483 ms/frame; the XLA-kernel
    variant crashed the TPU worker), so calling this with a non-CPU
    default backend raises unless ``unsafe_vmap_on_tpu=True``. Use
    detect_step_streams_scan (single chip) or
    detect_step_streams_spatial (multi-chip) instead. CPU use (tests,
    virtual-mesh dryruns, multihost CPU processes) is unaffected."""
    import dataclasses

    if jax.default_backend() != "cpu" and not unsafe_vmap_on_tpu:
        raise RuntimeError(
            "detect_step_batched (vmapped pipeline) is disabled on "
            f"accelerator backend {jax.default_backend()!r}: it measured "
            "483 ms/frame with Pallas kernels and crashed the TPU worker "
            "with XLA kernels (BENCH_MATRIX r4). Use "
            "detect_step_streams_scan for single-chip multi-stream, "
            "detect_step_streams_spatial for multi-chip, or pass "
            "unsafe_vmap_on_tpu=True to override."
        )

    # Pin every Pallas kernel to its XLA oracle form under vmap: (a) the
    # Pallas CC kernel's traced SMEM scalars (cc_scan_span /
    # neighbor_distance) don't lower when vmap batches them to (N, 1)
    # blocks, and (b) vmapped Pallas stages measured SLOWER than XLA
    # from the start (PLAN_NEXT "known dead ends": single-chip
    # --streams 2 at 62.2 vs 73.3 pairs/s) and have since become
    # pathological (2026-08-21: 483 ms/frame). Multi-chip shards streams
    # one-per-chip instead (detect_step_streams_spatial), where the
    # kernels run unbatched — this vmapped form is the single-chip
    # fallback only.
    repl = {}
    if config.clusterer.cc_backend == "auto":
        repl["clusterer"] = dataclasses.replace(
            config.clusterer, cc_backend="xla"
        )
    if config.sgm.backend == "auto":
        repl["sgm"] = dataclasses.replace(config.sgm, backend="xla")
    if config.scene_flow.gather_backend == "auto":
        repl["scene_flow"] = dataclasses.replace(
            config.scene_flow, gather_backend="xla"
        )
    if config.flownet.corr_backend == "auto":
        repl["flownet"] = dataclasses.replace(
            config.flownet, corr_backend="xla"
        )
    if repl:
        config = dataclasses.replace(config, **repl)

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
