"""Fused per-cluster statistics kernel for the clusterer's post-CC stage.

After connected components, the clusterer needs, for each of the ``cap``
selected roots (clusterer_nodelet.cpp:147-184 cluster2MovingObject +
:292-322 clusters image):

* the compact-id image (pixel -> 0..cap-1, cap = background),
* the AABB min/max over each cluster's points (pcl::getMinMax3D role),
* the member count (removeSmallClusters re-check / median position).

The XLA form in clusterer.py unrolls ``cap`` masked passes over the
467k-pixel label image (~0.9 ms) plus ``cap`` masked min/max/sum
reductions over the point planes (~0.3 ms) — every pass re-streams the
planes from HBM. Here the label image and the three point planes are
VMEM-resident and ONE kernel does all of it: a fori_loop over clusters,
each iteration one vector compare + select + seven on-core reductions.

Exact same results as the unrolled XLA path (min/max/sum are
order-insensitive, cid claims are disjoint by construction), asserted by
tests/test_clustering_pallas.py::test_cluster_stats_*.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(
    lab_ref, x_ref, y_ref, z_ref, roots_ref,
    cid_ref, mins_ref, maxs_ref, size_ref,
    *, hp, wp, cap, sentinel,
):
    labels = lab_ref[...]
    x = x_ref[...]
    y = y_ref[...]
    z = z_ref[...]
    inf = jnp.float32(jnp.inf)

    def body(c, cid):
        root = roots_ref[c]
        # Invalid slots hold the background sentinel; without the guard
        # they would claim every background pixel (clusterer.py keeps the
        # same (roots[c] < n) gate on its unrolled passes).
        ok = root < sentinel
        mask = (labels == root) & ok
        cid = jnp.where(mask, c, cid)
        mins_ref[c, 0] = jnp.min(jnp.where(mask, x, inf))
        mins_ref[c, 1] = jnp.min(jnp.where(mask, y, inf))
        mins_ref[c, 2] = jnp.min(jnp.where(mask, z, inf))
        maxs_ref[c, 0] = jnp.max(jnp.where(mask, x, -inf))
        maxs_ref[c, 1] = jnp.max(jnp.where(mask, y, -inf))
        maxs_ref[c, 2] = jnp.max(jnp.where(mask, z, -inf))
        size_ref[c] = jnp.sum(mask.astype(jnp.int32))
        return cid

    cid0 = jnp.full((hp, wp), jnp.int32(cap))
    cid_ref[...] = jax.lax.fori_loop(0, cap, body, cid0)


@partial(jax.jit, static_argnames=("interpret",))
def cluster_stats_pallas(
    labels: jnp.ndarray,
    points: jnp.ndarray,
    roots: jnp.ndarray,
    interpret: bool = False,
):
    """Compact ids + AABBs + sizes for ``cap`` cluster roots in one pass.

    Args:
      labels: (h, w) int32 CC labels (min flat pixel index per component,
        h*w for background) — connected_components[_pallas] output.
      points: (h, w, 3) f32 organized cloud.
      roots: (cap,) int32 selected root labels, h*w in unused slots.

    Returns:
      cid: (h, w) int32 in [0, cap], cap = background/unselected.
      mins, maxs: (cap, 3) f32 AABB corners (+inf/-inf for empty slots).
      csize: (cap,) int32 member counts (0 for empty slots).
    """
    h, w = labels.shape
    cap = int(roots.shape[0])
    n = h * w
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    lab = jnp.pad(
        labels, ((0, hp - h), (0, wp - w)), constant_values=jnp.int32(n)
    )
    planes = [
        jnp.pad(points[..., i], ((0, hp - h), (0, wp - w)))
        for i in range(3)
    ]

    cid, mins, maxs, csize = pl.pallas_call(
        partial(_stats_kernel, hp=hp, wp=wp, cap=cap, sentinel=n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((cap,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(lab, *planes, roots.astype(jnp.int32))
    return cid[:h, :w], mins, maxs, csize
