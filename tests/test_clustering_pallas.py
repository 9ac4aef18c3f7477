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
