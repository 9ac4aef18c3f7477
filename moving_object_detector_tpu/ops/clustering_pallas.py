"""Single-kernel Pallas TPU connected components for the clusterer.

The XLA implementation (ops/clustering.py) pays ~3 ms per relaxation
iteration at KITTI resolution: four ``lax.associative_scan`` segmented
min-scans (~0.65 ms each, HBM-bound) plus a 48-offset neighbor sweep. But
a (376, 1242) int32 label image is only ~2 MB — the WHOLE problem fits in
VMEM. This kernel runs the entire iterate-to-fixpoint loop on-core:

* neighbor sweep: 48 sign-consistent window offsets as VMEM rolls with
  edge masking, recomputing the depth-gated edge condition from the
  resident z / dynamic planes (cheaper than storing 48 masks);
* long-range propagation: segmented min-scans along rows and columns in
  both directions via log-step distance doubling (11 roll+select steps
  per direction) over the direct-adjacency barriers;
* convergence: one `jnp.any` reduction per iteration feeding a
  `lax.while_loop` carried flag.

Exact same partition semantics as ops/clustering.py `connected_components`
(clusterer_nodelet.cpp:56-83 comparePoints window + depth gate, SURVEY.md
§7 hard part (c)): labels are the component's minimum flat pixel index,
H*W for background. The XLA form remains the correctness oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clustering import _edge_offsets

_BIG = 1 << 30  # plain int: a module-level jnp scalar would be captured
                # as a pallas constant (rejected by pallas_call)


def _roll2d(x, dv, du):
    """Shift so out[v, u] = x[v + dv, u + du]; wrapped regions are garbage
    and must be masked by the caller (via iota bounds or barrier flags)."""
    out = x
    if dv:
        out = pltpu.roll(out, (-dv) % out.shape[0], 0)
    if du:
        out = pltpu.roll(out, (-du) % out.shape[1], 1)
    return out


def _cc_kernel(
    dyn_ref, z_ref, dd_ref, label_ref,
    *, h, w, hp, wp, offsets, max_iters,
):
    # Mosaic only rotates 32-bit vectors: anything rolled (dyn, adjacency,
    # reach flags) lives as int32 0/1.
    dyn_i = dyn_ref[...].astype(jnp.int32)
    z = z_ref[...]
    dd = dd_ref[0]

    vi = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    ui = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    inb = (vi < h) & (ui < w)
    dyn_i = jnp.where(inb, dyn_i, 0)
    dyn = dyn_i != 0
    # +inf z outside so every depth gate against it fails.
    z = jnp.where(dyn, z, jnp.float32(jnp.inf))

    flat = vi * w + ui
    sentinel = jnp.int32(h * w)
    init = jnp.where(dyn, flat, sentinel)

    def edge_i(dv, du):
        """1 where the pixel has a window edge to pixel + (dv, du)."""
        nz = _roll2d(z, dv, du)
        nd = _roll2d(dyn_i, dv, du)
        okv = (vi + dv >= 0) & (vi + dv < h)
        oku = (ui + du >= 0) & (ui + du < w)
        ok = dyn & (nd != 0) & okv & oku & (jnp.abs(z - nz) <= dd)
        return ok.astype(jnp.int32)

    adj_l = edge_i(0, -1)   # edge to the left neighbor
    adj_u = edge_i(-1, 0)   # edge to the upper neighbor
    adj_r = _roll2d(adj_l, 0, 1)   # edge to the right  = left-edge of x+1
    adj_d = _roll2d(adj_u, 1, 0)   # edge to the bottom = up-edge   of y+1

    def seg_scan(label, link_i, dv, du, span):
        """Distance-doubling segmented min along one direction.

        link_i[p] = 1 = p takes min from p + (dv, du) (its scan-order
        predecessor's direction). After ceil(log2(span)) doublings every
        pixel holds the min over its maximal linked run.
        """
        reach = link_i
        k = 1
        while k < span:
            neigh = _roll2d(label, dv * k, du * k)
            label = jnp.where(reach != 0, jnp.minimum(label, neigh), label)
            reach = reach * _roll2d(reach, dv * k, du * k)
            k *= 2
        return label

    def sweep(label):
        best = label
        for dv, du in offsets:
            ok = edge_i(dv, du) != 0
            neigh = _roll2d(label, dv, du)
            best = jnp.minimum(best, jnp.where(ok, neigh, jnp.int32(_BIG)))
        return jnp.where(dyn, best, sentinel)

    def propagate(label):
        label = seg_scan(label, adj_l, 0, -1, wp)
        label = seg_scan(label, adj_r, 0, 1, wp)
        label = seg_scan(label, adj_u, -1, 0, hp)
        label = seg_scan(label, adj_d, 1, 0, hp)
        return jnp.where(dyn, label, sentinel)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        label, _, it = state
        new = propagate(sweep(label))
        return new, jnp.any(new != label), it + 1

    label, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0))
    )
    label_ref[...] = label


@partial(
    jax.jit,
    static_argnames=("neighbor_distance", "max_iters", "interpret"),
)
def connected_components_pallas(
    dynamic: jnp.ndarray,
    depth: jnp.ndarray,
    depth_diff: jnp.ndarray,
    neighbor_distance: int = 4,
    max_iters: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.clustering.connected_components on TPU (whole image
    resident in VMEM; fits comfortably up to ~1000x2600)."""
    h, w = dynamic.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    dyn = jnp.pad(dynamic.astype(jnp.int8), ((0, hp - h), (0, wp - w)))
    z = jnp.pad(
        jnp.where(jnp.isfinite(depth), depth, jnp.inf).astype(jnp.float32),
        ((0, hp - h), (0, wp - w)),
        constant_values=jnp.inf,
    )
    dd = jnp.asarray(depth_diff, jnp.float32).reshape(1)

    offsets = _edge_offsets(neighbor_distance)
    out = pl.pallas_call(
        partial(
            _cc_kernel, h=h, w=w, hp=hp, wp=wp,
            offsets=offsets, max_iters=max_iters,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=interpret,
    )(dyn, z, dd)
    return out[:h, :w]
