"""Runtime-tunable parameters: the dynamic_reconfigure analog.

The reference exposes nine runtime tunables via dynamic_reconfigure
(SURVEY.md §5 config tiers): the constructor's dynamic_flow_diff /
max_color_velocity (SceneFlowConstructor.cfg:8-9), the clusterer's
cluster_size / depth_diff / dynamic_speed / neighbor_distance
(Clusterer.cfg:8-11), and the tracker's covariance_trace_limit /
correction_count_limit / object_radius (MovingObjectTracker.cfg:8-10).

Here the *hot* scalars ride through the jitted pipeline as traced array
leaves of a Tunables pytree, so retuning any of them between frames never
triggers a recompile — including ``neighbor_distance``: the clustering
kernels build their stencil at the static radius ``ClustererConfig.
neighbor_distance`` (the compile-time maximum) and gate each offset by the
traced radius, so any runtime value in [0, config radius] applies without
a recompile (values above the static radius clamp; raising the maximum is
a config change and recompiles, like any shape change).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .config import PipelineConfig


@struct.dataclass
class Tunables:
    """Hot-reloadable scalars (all 0-d f32/i32 arrays, traced under jit)."""

    dynamic_flow_diff: jnp.ndarray  # px (SceneFlowConstructor.cfg:8)
    dynamic_disparity_rate: jnp.ndarray  # px/s, 0 = off (SceneFlowConfig)
    max_color_velocity: jnp.ndarray  # m/s, visualization scaling (cfg:9)
    cluster_size: jnp.ndarray  # px (Clusterer.cfg:8)
    depth_diff: jnp.ndarray  # m (Clusterer.cfg:9)
    dynamic_speed: jnp.ndarray  # m/s (Clusterer.cfg:10)
    neighbor_distance: jnp.ndarray  # px, <= config radius (Clusterer.cfg:11)
    covariance_trace_limit: jnp.ndarray  # (MovingObjectTracker.cfg:8)
    correction_count_limit: jnp.ndarray  # (cfg:9)
    object_radius: jnp.ndarray  # m (cfg:10)

    @classmethod
    def from_config(cls, config: PipelineConfig) -> "Tunables":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(
            dynamic_flow_diff=f32(config.scene_flow.dynamic_flow_diff),
            dynamic_disparity_rate=f32(config.scene_flow.dynamic_disparity_rate),
            max_color_velocity=f32(config.scene_flow.max_color_velocity),
            cluster_size=jnp.asarray(config.clusterer.cluster_size, jnp.int32),
            depth_diff=f32(config.clusterer.depth_diff),
            dynamic_speed=f32(config.clusterer.dynamic_speed),
            neighbor_distance=jnp.asarray(
                config.clusterer.neighbor_distance, jnp.int32
            ),
            covariance_trace_limit=f32(config.tracker.covariance_trace_limit),
            correction_count_limit=jnp.asarray(
                config.tracker.correction_count_limit, jnp.int32
            ),
            object_radius=f32(config.tracker.object_radius),
        )

    def replace_values(self, **kw) -> "Tunables":
        """Return a copy with the given scalars updated (host-side retune
        between frames — the jitted step is reused unchanged)."""
        conv = {
            k: jnp.asarray(
                v, jnp.int32 if k in (
                    "cluster_size", "correction_count_limit",
                    "neighbor_distance",
                )
                else jnp.float32,
            )
            for k, v in kw.items()
        }
        return self.replace(**conv)
