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


def connected_components(
    dynamic: jnp.ndarray,
    depth: jnp.ndarray,
    depth_diff: jnp.ndarray,
    neighbor_distance: int | jnp.ndarray = 4,
    max_iters: int = 64,
    stencil_radius: int | None = None,
) -> jnp.ndarray:
    """Label connected components of the dynamic-pixel graph.

    Args:
      dynamic: (H, W) bool mask (calculateDynamicMap semantics,
        clusterer_nodelet.cpp:40-54).
      depth: (H, W) f32 z values (NaN allowed on non-dynamic pixels).
      depth_diff: scalar gate on |dz| between adjacent pixels.
      neighbor_distance: window radius k (cfg default 4). May be a TRACED
        int32 scalar (dynamic_reconfigure retune without recompiling,
        Clusterer.cfg:11): the stencil is built at the static
        ``stencil_radius`` and each offset is gated by the traced radius
        (Chebyshev distance test), which reproduces exactly the radius-k
        edge set for any k <= stencil_radius. Values above clamp.
      max_iters: safety bound on propagation sweeps.
      stencil_radius: static compile-time maximum radius. Defaults to
        ``neighbor_distance`` when that is a plain int.

    Returns:
      (H, W) int32 labels: the minimum flat pixel index of the component for
      dynamic pixels, H*W for background.
    """
    # Resolved OUTSIDE the jitted core: under jit even a plain-int caller
    # argument arrives as a tracer, so the int-vs-traced distinction must
    # be made here.
    if stencil_radius is None:
        if not isinstance(neighbor_distance, int):
            raise TypeError(
                "traced neighbor_distance requires a static stencil_radius"
            )
        stencil_radius = neighbor_distance
    return _connected_components_jit(
        dynamic, depth, depth_diff, neighbor_distance,
        max_iters=max_iters, stencil_radius=stencil_radius,
    )


@partial(jax.jit, static_argnames=("stencil_radius", "max_iters"))
def _connected_components_jit(
    dynamic, depth, depth_diff, neighbor_distance,
    *, max_iters, stencil_radius,
):
    h, w = dynamic.shape
    n = h * w
    sentinel = jnp.int32(n)
    flat_idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    init = jnp.where(dynamic, flat_idx, sentinel)

    nd = jnp.clip(
        jnp.asarray(neighbor_distance, jnp.int32), 0, stencil_radius
    )

    # z with +inf on invalid so |dz| gates to False against any neighbor.
    z = jnp.where(dynamic & jnp.isfinite(depth), depth, jnp.inf)

    offsets = _edge_offsets(stencil_radius)

    # Precompute per-offset edge masks once; reused every sweep. The
    # Chebyshev gate (a scalar compare per offset, constant-folded when
    # nd is static) restricts the static stencil to the traced radius.
    edge_masks = []
    for dv, du in offsets:
        nz = _shift2d(z, dv, du, jnp.inf)
        ndyn = _shift2d(dynamic, dv, du, False)
        in_radius = jnp.int32(max(abs(dv), abs(du))) <= nd
        ok = dynamic & ndyn & (jnp.abs(z - nz) <= depth_diff) & in_radius
        edge_masks.append(ok)
    # Radius 0: no edges at all — every dynamic pixel is its own
    # component, the sweep is the identity.
    edge_masks = (
        jnp.stack(edge_masks) if edge_masks else None
    )  # (E, H, W)

    def sweep(label):
        if edge_masks is None:
            return label
        best = label
        for i, (dv, du) in enumerate(offsets):
            neigh = _shift2d(label, dv, du, sentinel)
            best = jnp.minimum(best, jnp.where(edge_masks[i], neigh, sentinel))
        return best

    # Long-range propagation: segmented min-scans along rows and columns
    # over the *direct-adjacency* edges ((0,±1) and (±1,0), which are a
    # subset of the window's edge set). A scan carries the component's
    # minimum label across an entire contiguous run in one O(log) pass —
    # the gather-free replacement for union-find path compression (pointer
    # jumping costs two 467k-element gathers per iteration, ~6 ms each on
    # TPU). Window-gap and diagonal edges still merge via the exact sweep;
    # iterating both to a fixed point yields the exact partition.
    adj_h = dynamic & _shift2d(dynamic, 0, -1, False) & (
        jnp.abs(z - _shift2d(z, 0, -1, jnp.inf)) <= depth_diff
    ) & (nd >= 1)
    adj_v = dynamic & _shift2d(dynamic, -1, 0, False) & (
        jnp.abs(z - _shift2d(z, -1, 0, jnp.inf)) <= depth_diff
    ) & (nd >= 1)

    def seg_min_scan(label, barrier, axis, reverse):
        # Classical segmented-scan operator (Blelloch): a segment-start flag
        # on the later operand blocks the carry; flags accumulate with OR.
        def op(a, b):
            am, ab = a
            bm, bb = b
            return jnp.where(bb, bm, jnp.minimum(am, bm)), ab | bb

        if reverse:
            label = jnp.flip(label, axis)
            barrier = jnp.flip(barrier, axis)
        m, _ = jax.lax.associative_scan(op, (label, barrier), axis=axis)
        return jnp.flip(m, axis) if reverse else m

    def propagate(label):
        # Rows, both directions. barrier = no edge to the previous pixel in
        # scan order.
        bar_l = ~adj_h  # no edge to the left neighbor
        label = seg_min_scan(label, bar_l, axis=1, reverse=False)
        bar_r = ~_shift2d(adj_h, 0, 1, False)  # no edge to the right
        label = seg_min_scan(label, bar_r, axis=1, reverse=True)
        bar_u = ~adj_v
        label = seg_min_scan(label, bar_u, axis=0, reverse=False)
        bar_d = ~_shift2d(adj_v, 1, 0, False)
        label = seg_min_scan(label, bar_d, axis=0, reverse=True)
        return jnp.where(dynamic, label, sentinel)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        label, _, it = state
        new = propagate(sweep(label))
        return new, jnp.any(new != label), it + 1

    label, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return label
