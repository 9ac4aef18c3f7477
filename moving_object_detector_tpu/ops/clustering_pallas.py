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
    dyn_ref, z_ref, dd_ref, nd_ref, off_ref, label_ref, iters_ref,
    *, h, w, hp, wp, dv_groups, max_iters, max_span,
):
    # Mosaic only rotates 32-bit vectors: anything rolled (dyn, adjacency,
    # reach flags) lives as int32 0/1. All in-kernel loops are
    # lax.fori_loop with DYNAMIC rotate amounts — unrolled Python loops
    # made Mosaic allocate a fresh VMEM stack slot per step (207 MB for
    # the 48-offset sweep + 4x11 doubling scans; the scoped limit is 16).
    dd = dd_ref[0]
    # Traced effective radius (dynamic_reconfigure retune without
    # recompiling, Clusterer.cfg:11): the static stencil covers the
    # compile-time maximum; each offset is gated by Chebyshev <= radius.
    nd_radius = nd_ref[0]

    vi0 = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    ui0 = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)

    def iotas():
        return vi0, ui0
    dyn_i = jnp.where(
        (vi0 < h) & (ui0 < w), dyn_ref[...].astype(jnp.int32), 0
    )
    # +inf z outside so every depth gate against it fails.
    z = jnp.where(dyn_i != 0, z_ref[...], jnp.float32(jnp.inf))

    sentinel = jnp.int32(h * w)
    init = jnp.where(dyn_i != 0, vi0 * w + ui0, sentinel)

    def roll_rows(x, dv):
        """out[v, u] = x[v + dv, u]; wrapped rows must be masked."""
        if isinstance(dv, int) and dv % hp == 0:
            return x
        return pltpu.roll(x, (-dv) % hp, 0)

    def roll_cols(x, du):
        """out[v, u] = x[v, u + du]; wrapped columns must be masked."""
        if isinstance(du, int) and du % wp == 0:
            return x
        return pltpu.roll(x, (-du) % wp, 1)

    def roll2d(x, dv, du):
        """out[v, u] = x[v + dv, u + du]; wrapped regions must be masked
        by the caller. dv/du may be traced scalars."""
        return roll_cols(roll_rows(x, dv), du)

    def edge_from_rowrolled(dyn_plane, z_v, d_v, dv, du):
        """1 where the pixel has a window edge to pixel + (dv, du), given
        z/dyn planes already row-rolled by dv (z_v, d_v).
        dyn_plane: int32 with the dynamic flag at bit 4."""
        nz = roll_cols(z_v, du)
        nd = roll_cols(d_v, du) & 16
        vi, ui = iotas()
        okv = (vi + dv >= 0) & (vi + dv < h)
        oku = (ui + du >= 0) & (ui + du < w)
        in_radius = (
            jnp.maximum(jnp.abs(jnp.int32(dv)), jnp.abs(du)) <= nd_radius
        )
        ok = (
            (dyn_plane & 16 != 0) & (nd != 0) & okv & oku
            & (jnp.abs(z - nz) <= dd) & in_radius
        )
        return ok.astype(jnp.int32)

    def edge_i(dyn_plane, dv, du):
        return edge_from_rowrolled(
            dyn_plane, roll_rows(z, dv), roll_rows(dyn_plane, dv), dv, du
        )

    # One resident bit-packed int32 plane (separate planes put the kernel
    # 4+ MB over the 16 MB scoped-vmem limit): bit0 = edge-left,
    # bit1 = edge-right, bit2 = edge-up, bit3 = edge-down, bit4 = dynamic.
    dyn16 = dyn_i << 4
    adj_l = edge_i(dyn16, 0, -1)
    adj_u = edge_i(dyn16, -1, 0)
    adj = (
        adj_l
        | (roll2d(adj_l, 0, 1) << 1)   # right = left-edge of x+1
        | (adj_u << 2)
        | (roll2d(adj_u, 1, 0) << 3)   # down  = up-edge   of y+1
        | dyn16
    )
    dyn = (adj & 16) != 0

    # Distance-doubling step counts. ``max_span`` < image size trades
    # per-iteration scan work for (possibly) more fixpoint iterations on
    # components wider than the span — the while_loop re-runs until the
    # PARTITION stops changing, so the result is identical either way.
    n_dbl_w = max(1, (min(wp, max_span or wp) - 1).bit_length())
    n_dbl_h = max(1, (min(hp, max_span or hp) - 1).bit_length())

    def seg_scan(label, bit, axis, sign, n_dbl):
        """Distance-doubling segmented min along one axis: adj bit
        ``bit`` set at p means p takes min from p + sign*e_axis. After
        ceil(log2(span)) doublings every pixel holds the min over its
        maximal linked run. Axis-aligned, so each doubling step is ONE
        rotate per plane (the old roll2d form paid a second zero-amount
        dynamic rotate per step)."""
        roll1 = roll_rows if axis == 0 else roll_cols

        def step(j, carry):
            label, reach = carry
            k = sign * (jnp.int32(1) << j)
            neigh = roll1(label, k)
            label = jnp.where(reach != 0, jnp.minimum(label, neigh), label)
            reach = reach * roll1(reach, k)
            return label, reach

        link_i = (adj >> bit) & 1
        label, _ = jax.lax.fori_loop(0, n_dbl, step, (label, link_i))
        return label

    # The window edge set is iteration-INVARIANT: precompute all offsets'
    # masks once, bit-packed into two resident planes (offset idx -> bit
    # idx%32 of plane idx//32), so each sweep step is one label roll plus
    # a bit test instead of re-rolling z/adj and re-evaluating the gate.
    # Offsets are grouped by dv (static, contiguous in off_ref): the row
    # rotate happens once per group as a static-amount roll, and only the
    # column rotate stays per-offset — 9 static + 48 dynamic rotates
    # instead of 96 dynamic ones per sweep.
    zero = jnp.zeros_like(adj)
    epack1, epack2 = zero, zero
    for dv, base, cnt in dv_groups:
        z_v = roll_rows(z, dv)
        d_v = roll_rows(adj, dv)

        def pack_one(i, pl2, dv=dv, base=base, z_v=z_v, d_v=d_v):
            e1, e2 = pl2
            idx = base + i
            du = off_ref[idx, 1]
            eb = edge_from_rowrolled(adj, z_v, d_v, dv, du)
            lo = idx < 32
            e1 = e1 | jnp.where(lo, eb << idx, 0)
            e2 = e2 | jnp.where(lo, 0, eb << (idx - 32))
            return e1, e2

        epack1, epack2 = jax.lax.fori_loop(
            0, cnt, pack_one, (epack1, epack2)
        )

    def sweep(label):
        best = label
        for dv, base, cnt in dv_groups:
            lab_v = roll_rows(label, dv)

            def step(i, b, base=base, lab_v=lab_v):
                idx = base + i
                du = off_ref[idx, 1]
                lo = idx < 32
                bits = jnp.where(lo, epack1 >> idx, epack2 >> (idx - 32))
                neigh = roll_cols(lab_v, du)
                return jnp.minimum(
                    b, jnp.where(bits & 1 != 0, neigh, jnp.int32(_BIG))
                )

            best = jax.lax.fori_loop(0, cnt, step, best)
        return jnp.where(dyn, best, sentinel)

    def propagate(label):
        label = seg_scan(label, 0, 1, -1, n_dbl_w)
        label = seg_scan(label, 1, 1, 1, n_dbl_w)
        label = seg_scan(label, 2, 0, -1, n_dbl_h)
        label = seg_scan(label, 3, 0, 1, n_dbl_h)
        return jnp.where(dyn, label, sentinel)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        label, _, it = state
        new = propagate(sweep(label))
        return new, jnp.any(new != label), it + 1

    label, _, n_iters = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0))
    )
    label_ref[...] = label
    # Convergence observability (profiling: how many sweep+propagate
    # rounds busy frames actually need vs max_iters).
    iters_ref[0] = n_iters


def connected_components_pallas(
    dynamic: jnp.ndarray,
    depth: jnp.ndarray,
    depth_diff: jnp.ndarray,
    neighbor_distance: int | jnp.ndarray = 4,
    max_iters: int = 64,
    interpret: bool = False,
    return_iters: bool = False,
    max_span: int = 0,
    stencil_radius: int | None = None,
) -> jnp.ndarray:
    """Drop-in for ops.clustering.connected_components on TPU (whole image
    resident in VMEM; fits comfortably up to ~1000x2600).

    ``return_iters=True`` additionally returns the number of
    sweep+propagate rounds the fixpoint took (scalar int32), for
    convergence profiling against ``max_iters``.

    ``max_span`` > 0 caps the per-iteration distance-doubling scan reach
    (in pixels); components wider/taller than the cap converge over extra
    fixpoint iterations instead. Same partition, fewer rolls per
    iteration when real components are much smaller than the frame.

    ``neighbor_distance`` may be a traced int32 scalar (dynamic_reconfigure
    retune without recompiling, Clusterer.cfg:11): the stencil is built at
    the static ``stencil_radius`` (defaults to ``neighbor_distance`` when
    that is a plain int) and every offset is gated in-kernel by Chebyshev
    distance <= the traced radius, reproducing the radius-k edge set
    exactly for any k <= stencil_radius (values above clamp)."""
    # Resolved OUTSIDE the jitted core: under jit even a plain-int caller
    # argument arrives as a tracer.
    if stencil_radius is None:
        if not isinstance(neighbor_distance, int):
            raise TypeError(
                "traced neighbor_distance requires a static stencil_radius"
            )
        stencil_radius = neighbor_distance
    return _connected_components_pallas_jit(
        dynamic, depth, depth_diff, neighbor_distance,
        max_iters=max_iters, interpret=interpret,
        return_iters=return_iters, max_span=max_span,
        stencil_radius=stencil_radius,
    )


@partial(
    jax.jit,
    static_argnames=(
        "stencil_radius", "max_iters", "interpret", "return_iters",
        "max_span",
    ),
)
def _connected_components_pallas_jit(
    dynamic, depth, depth_diff, neighbor_distance,
    *, max_iters, interpret, return_iters, max_span, stencil_radius,
):
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
    nd = jnp.clip(
        jnp.asarray(neighbor_distance, jnp.int32), 0, stencil_radius
    ).reshape(1)
    off_list = _edge_offsets(stencil_radius)
    offsets = jnp.asarray(off_list, jnp.int32)
    # Static (dv, base, count) runs of the dv-contiguous offset list, so
    # the kernel can hoist one static row rotate per dv group.
    dv_groups = []
    i = 0
    while i < len(off_list):
        j = i
        while j < len(off_list) and off_list[j][0] == off_list[i][0]:
            j += 1
        dv_groups.append((off_list[i][0], i, j - i))
        i = j
    dv_groups = tuple(dv_groups)

    out, iters = pl.pallas_call(
        partial(
            _cc_kernel, h=h, w=w, hp=hp, wp=wp,
            dv_groups=dv_groups, max_iters=max_iters, max_span=max_span,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        # Whole-image residency intentionally exceeds the default 16 MB
        # scoped-vmem budget; v5e has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(dyn, z, dd, nd, offsets)
    if return_iters:
        return out[:h, :w], iters[0]
    return out[:h, :w]
