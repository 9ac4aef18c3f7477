"""Depth-gated connected-component labeling on organized clouds.

The TPU-native replacement for the reference clusterer's sequential two-pass
union-find (scene_flow_clusterer/src/clusterer_nodelet.cpp:56-83 raster scan,
lookup_table.h:10-33 path-halving union-find, integrateConnectedClusters
:253-267): an iterative min-label propagation with pointer jumping. Each
sweep takes the minimum label over the *direct* edge set, then compresses
label chains by gathering label-of-label; the loop converges to the same
partition as union-find (labels differ — parity is at the partition level,
SURVEY.md §7 hard part (c)).

Edge semantics preserved from comparePoints (clusterer_nodelet.cpp:186-219)
and the scan window (:70-79): pixels p and q are adjacent iff

* both are dynamic,
* |z_p - z_q| <= depth_diff (depthDiff, clusterer_nodelet.h:83-86),
* q - p = (du, dv) with du, dv in [-k, 0] (or the reverse), i.e. the offset's
  components share a sign. Mixed-sign diagonals (e.g. up-right) are NOT
  edges in the reference and are not here either.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _edge_offsets(k: int):
    """Sign-consistent offsets within the (k+1)^2 window, excluding (0,0).

    The symmetric closure of the reference's upper-left scan window
    (clusterer_nodelet.cpp:70-79).
    """
    offsets = []
    for dv in range(-k, k + 1):
        for du in range(-k, k + 1):
            if du == 0 and dv == 0:
                continue
            if du * dv >= 0:  # both <= 0 or both >= 0 (axes included)
                offsets.append((dv, du))
    return tuple(offsets)


def _shift2d(x: jnp.ndarray, dv: int, du: int, fill):
    """out[v, u] = x[v + dv, u + du] where in bounds, else ``fill``."""
    h, w = x.shape
    pv, pu = abs(dv), abs(du)
    padded = jnp.pad(x, ((pv, pv), (pu, pu)), constant_values=fill)
    return padded[pv + dv : pv + dv + h, pu + du : pu + du + w]


@partial(jax.jit, static_argnames=("neighbor_distance", "max_iters"))
def connected_components(
    dynamic: jnp.ndarray,
    depth: jnp.ndarray,
    depth_diff: jnp.ndarray,
    neighbor_distance: int = 4,
    max_iters: int = 64,
) -> jnp.ndarray:
    """Label connected components of the dynamic-pixel graph.

    Args:
      dynamic: (H, W) bool mask (calculateDynamicMap semantics,
        clusterer_nodelet.cpp:40-54).
      depth: (H, W) f32 z values (NaN allowed on non-dynamic pixels).
      depth_diff: scalar gate on |dz| between adjacent pixels.
      neighbor_distance: window radius k (cfg default 4).
      max_iters: safety bound on propagation sweeps.

    Returns:
      (H, W) int32 labels: the minimum flat pixel index of the component for
      dynamic pixels, H*W for background.
    """
    h, w = dynamic.shape
    n = h * w
    sentinel = jnp.int32(n)
    flat_idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    init = jnp.where(dynamic, flat_idx, sentinel)

    # z with +inf on invalid so |dz| gates to False against any neighbor.
    z = jnp.where(dynamic & jnp.isfinite(depth), depth, jnp.inf)

    offsets = _edge_offsets(neighbor_distance)

    # Precompute per-offset edge masks once; reused every sweep.
    edge_masks = []
    for dv, du in offsets:
        nz = _shift2d(z, dv, du, jnp.inf)
        ndyn = _shift2d(dynamic, dv, du, False)
        ok = dynamic & ndyn & (jnp.abs(z - nz) <= depth_diff)
        edge_masks.append(ok)
    edge_masks = jnp.stack(edge_masks)  # (E, H, W)

    def sweep(label):
        best = label
        for i, (dv, du) in enumerate(offsets):
            neigh = _shift2d(label, dv, du, sentinel)
            best = jnp.minimum(best, jnp.where(edge_masks[i], neigh, sentinel))
        return best

    def compress(label):
        # Pointer jumping: label <- label[label]; sentinel maps to itself.
        flat = label.reshape(-1)
        lookup = jnp.concatenate([flat, jnp.array([sentinel], jnp.int32)])
        return lookup[flat].reshape(h, w)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        label, _, it = state
        new = sweep(label)
        new = compress(compress(new))
        return new, jnp.any(new != label), it + 1

    label, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return label
