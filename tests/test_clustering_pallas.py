"""Pallas whole-image CC kernel vs the XLA oracle (interpret mode).

Partition-level equality (SURVEY.md §7 hard part (c)): both implement
min-flat-index labeling, so labels must match EXACTLY, not just up to
renumbering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moving_object_detector_tpu.ops.clustering import connected_components
from moving_object_detector_tpu.ops.clustering_pallas import (
    connected_components_pallas,
)


def _random_scene(key, h, w, p_dyn=0.3, n_planes=3):
    k1, k2 = jax.random.split(key)
    dynamic = jax.random.uniform(k1, (h, w)) < p_dyn
    depth = jnp.round(jax.random.uniform(k2, (h, w)) * n_planes) * 1.0 + 2.0
    return dynamic, depth


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_pallas_matches_xla_random(seed):
    h, w = 40, 150
    dynamic, depth = _random_scene(jax.random.PRNGKey(seed), h, w)
    ref = connected_components(dynamic, depth, jnp.float32(0.15), 2, 64)
    out = connected_components_pallas(
        dynamic, depth, jnp.float32(0.15), 2, 64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cc_pallas_blocks_and_depth_gate():
    h, w = 32, 140
    dynamic = np.zeros((h, w), bool)
    depth = np.full((h, w), np.nan, np.float32)
    # Two blocks adjacent in pixels but split by depth.
    dynamic[5:15, 10:30] = True
    depth[5:15, 10:30] = 2.0
    dynamic[5:15, 30:50] = True
    depth[5:15, 30:50] = 3.0
    # A far-away block.
    dynamic[20:30, 100:120] = True
    depth[20:30, 100:120] = 2.0
    ref = connected_components(
        jnp.asarray(dynamic), jnp.asarray(depth), jnp.float32(0.15), 4, 64
    )
    out = connected_components_pallas(
        jnp.asarray(dynamic), jnp.asarray(depth), jnp.float32(0.15), 4, 64,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    labels = np.unique(np.asarray(out))
    assert len(labels) == 4  # 3 components + background


def test_cc_pallas_window_jumps_gaps():
    """neighbor_distance=4 merges pixels up to 4 apart (diagonal window)."""
    h, w = 24, 130
    dynamic = np.zeros((h, w), bool)
    depth = np.full((h, w), np.nan, np.float32)
    dynamic[10, 10:20] = True
    dynamic[10, 23:33] = True  # 3-px gap: inside the k=4 window
    dynamic[10, 40:50] = True  # 7-px gap: outside
    depth[dynamic] = 5.0
    out = connected_components_pallas(
        jnp.asarray(dynamic), jnp.asarray(depth), jnp.float32(0.15), 4, 64,
        interpret=True,
    )
    o = np.asarray(out)
    assert o[10, 10] == o[10, 25]
    assert o[10, 10] != o[10, 45]


def test_cc_pallas_return_iters():
    h, w = 40, 150
    dynamic, depth = _random_scene(jax.random.PRNGKey(0), h, w)
    labels, iters = connected_components_pallas(
        dynamic, depth, jnp.float32(0.15), 2, 64, interpret=True,
        return_iters=True,
    )
    ref = connected_components(dynamic, depth, jnp.float32(0.15), 2, 64)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref))
    n = int(iters)
    assert 1 <= n < 64, n


@pytest.mark.parametrize("span", [8, 32])
def test_cc_pallas_capped_span_same_partition(span):
    """max_span caps the per-iteration doubling reach; components WIDER
    than the cap (here a full-width snake) must still converge to the
    exact oracle labeling via extra fixpoint iterations."""
    h, w = 40, 150
    dynamic = np.zeros((h, w), bool)
    depth = np.full((h, w), np.nan, np.float32)
    # Full-width zig-zag snake (wider than any tested span).
    dynamic[4:8, :] = True
    depth[4:8, :] = 2.0
    dynamic[8:20, 140:148] = True
    depth[8:20, 140:148] = 2.0
    dynamic[18:22, 5:148] = True
    depth[18:22, 5:148] = 2.0
    # Plus random confetti.
    dyn2, dep2 = _random_scene(jax.random.PRNGKey(3), h, w)
    dynamic = dynamic | (np.asarray(dyn2) & (np.arange(h)[:, None] > 24))
    depth = np.where(np.isnan(depth), np.asarray(dep2), depth)
    ref = connected_components(
        jnp.asarray(dynamic), jnp.asarray(depth), jnp.float32(0.15), 2, 64
    )
    out, iters = connected_components_pallas(
        jnp.asarray(dynamic), jnp.asarray(depth), jnp.float32(0.15), 2, 64,
        interpret=True, max_span=span, return_iters=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert int(iters) <= 64


def test_cluster_stats_kernel_matches_unrolled():
    """cluster_stats_pallas == the unrolled masked-pass form on random
    labels/points/roots, including empty root slots (sentinel n)."""
    from moving_object_detector_tpu.ops.cluster_stats_pallas import (
        cluster_stats_pallas,
    )

    h, w, cap = 36, 150, 8
    n = h * w
    rng = np.random.default_rng(7)
    # A handful of components: labels are min-flat-index style values.
    comp_roots = np.sort(rng.choice(n, 5, replace=False)).astype(np.int32)
    lab = np.full((h, w), n, np.int32)
    flat = lab.reshape(-1)
    assign = rng.integers(0, 6, n)  # 5 = background
    for i, r in enumerate(comp_roots):
        flat[assign == i] = r
        flat[r] = r  # root pixel belongs to its component
    pts = rng.normal(0, 3, (h, w, 3)).astype(np.float32)
    # Select 3 real roots + sentinel padding in the remaining slots.
    roots = np.full((cap,), n, np.int32)
    roots[:3] = comp_roots[:3]

    cid, mins, maxs, csize = cluster_stats_pallas(
        jnp.asarray(lab), jnp.asarray(pts), jnp.asarray(roots),
        interpret=True,
    )

    flat_pts = pts.reshape(n, 3)
    cid_ref = np.full((n,), cap, np.int32)
    for c in range(cap):
        cid_ref[(roots[c] < n) & (flat == roots[c])] = c
    np.testing.assert_array_equal(np.asarray(cid).reshape(-1), cid_ref)
    for c in range(cap):
        m = cid_ref == c
        if m.any():
            np.testing.assert_array_equal(
                np.asarray(mins)[c], flat_pts[m].min(axis=0))
            np.testing.assert_array_equal(
                np.asarray(maxs)[c], flat_pts[m].max(axis=0))
        else:
            assert np.all(np.isinf(np.asarray(mins)[c]))
            assert np.all(np.isinf(np.asarray(maxs)[c]))
        assert int(np.asarray(csize)[c]) == int(m.sum())


def test_cluster_scene_flow_pallas_matches_xla_end_to_end():
    """Full cluster_scene_flow: the pallas backend (CC kernel + fused
    stats kernel) must be BITWISE equal to the XLA oracle backend on a
    busy multi-cluster scene."""
    import dataclasses

    from moving_object_detector_tpu.clusterer import cluster_scene_flow
    from moving_object_detector_tpu.config import ClustererConfig
    from moving_object_detector_tpu.types import SceneFlowCloud

    h, w = 48, 160
    rng = np.random.default_rng(3)
    pts = rng.uniform(-4, 4, (h, w, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(4, 20, (h, w))
    vel = np.zeros((h, w, 3), np.float32)
    for cy, cx, r in ((12, 30, 8), (30, 90, 11), (20, 140, 6)):
        yy, xx = np.mgrid[0:h, 0:w]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        vel[m] = rng.uniform(0.5, 2.0, 3).astype(np.float32)
        pts[m, 2] = 8.0 + 0.01 * rng.standard_normal(m.sum())
    # Some NaN (invalid) velocity pixels -> static, as in the pipeline.
    vel[rng.uniform(size=(h, w)) < 0.05] = np.nan
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))

    base = ClustererConfig(cluster_size=6, max_objects=8)
    obj_x, lab_x = cluster_scene_flow(
        cloud, dataclasses.replace(base, cc_backend="xla"))
    obj_p, lab_p = cluster_scene_flow(
        cloud, dataclasses.replace(base, cc_backend="pallas_interpret"))
    np.testing.assert_array_equal(np.asarray(lab_x), np.asarray(lab_p))
    for lx, lp in zip(jax.tree_util.tree_leaves(obj_x),
                      jax.tree_util.tree_leaves(obj_p)):
        np.testing.assert_array_equal(np.asarray(lx), np.asarray(lp))
