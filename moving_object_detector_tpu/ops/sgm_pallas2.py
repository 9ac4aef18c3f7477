"""SGM v2: fused Pallas TPU kernels operating directly on census images.

Replaces the v1 pipeline (ops/sgm_pallas.py), which materialized and
relayouted a 63 MB int8 cost volume plus 504 MB of int16 per-direction path
sums (measured 12.7 ms/frame at KITTI resolution; the DP kernels and the
XLA glue between them were ~80% of it). v2 restructures the whole stereo
matcher around three ideas:

1. **In-kernel matching costs.** No cost volume is ever written to HBM.
   Each kernel reconstructs the Hamming cost C(y, x, d) =
   popcount(censusL[y,x] ^ censusR[y,x-d]) from the two (tiny) census
   images in VMEM:

   * the horizontal DP kernel and the WTA kernel scan over x and read the
     128-column census window as one dynamic leading-axis slice of a
     per-grid-step scratch assembly (previous blocks + current block);
   * the vertical DP kernel scans over y and builds the window with ONE
     strided lane roll per step (``pltpu.roll(bcast_row, 0, 1, stride=1,
     stride_axis=0)`` shears row d right by d, so row d holds
     censusR[x - d]); the wrap region x < d is exactly the
     masked-to-max-cost region.

2. **int8 path deltas.** The SGM recurrence L(d) = C(d) + m(d) - min L
   has m(d) - min L in [0, P2], so each direction stores only that delta
   as int8 — 4x less DP-kernel write traffic than v1's int16 L values.
   The total is reconstructed as sum(deltas) + 4*C (the WTA kernel
   recomputes C in-kernel).

3. **Fused scanning WTA.** One kernel streams the horizontal deltas (in
   their native (W, D, H) layout — no transpose) plus the transposed
   vertical total, rebuilds the full aggregated cost per column, and
   computes left argmin / subpixel (masked sublane-min reductions over
   the disparity-in-sublanes axis), the right-view argmin via a systolic
   recurrence B <- min(roll(B), packed) whose finished right pixel pops
   out 128 steps later, and the gather-free left-right consistency
   resolve via ring buffers + one-hot sublane sums. Only a single
   (H, D, W) -> (W, D, H) relayout of the vertical sums remains
   (uint8, done by XLA — measured faster than in-kernel shuffles).

Disparity axis convention: D sits NATURAL in sublanes everywhere. The
horizontal/WTA kernels achieve this by windowing into the COLUMN-REVERSED
right census (ascending reversed rows = descending original columns =
ascending disparity), so no axis flip is ever materialized; the vertical
kernel's shear is natural by construction (Mosaic strided rolls only
support non-negative strides, which fixes these choices).

Output is bitwise-equal to the lax.scan reference in ops/sgm.py (same
contract as sgm_gpu_ros's CUDA pipeline, SURVEY.md §2.3; consumed at
scene_flow_constructor.cpp:267-268).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_D = 128
_MAX_COST = 32  # maximum census Hamming distance (5x5 window, 24 bits used)
_PAD_COST = 127  # uniform pad cost: exactly DP-neutral (see v1 docstring)
_BIG_T = 1 << 17  # > any real 4-path total (<= 988)


def _dp_update_sub(carry, cost, p1, p2, d_reversed):
    """One SGM step with the disparity axis in sublanes.

    carry/cost: (D, N) int32. Returns (new_carry, delta) with
    delta = new_carry - cost in [0, p2].
    """
    d, n = carry.shape
    prev_min = jnp.min(carry, axis=0, keepdims=True)
    sub = jax.lax.broadcasted_iota(jnp.int32, (d, n), 0)
    big = jnp.int32(1 << 20)
    if d_reversed:  # sublane e holds d = D-1-e
        dm1 = jnp.where(sub == d - 1, big, pltpu.roll(carry, d - 1, 0))
        dp1 = jnp.where(sub == 0, big, pltpu.roll(carry, 1, 0))
    else:
        dm1 = jnp.where(sub == 0, big, pltpu.roll(carry, 1, 0))
        dp1 = jnp.where(sub == d - 1, big, pltpu.roll(carry, d - 1, 0))
    best = jnp.minimum(
        jnp.minimum(carry, prev_min + p2), jnp.minimum(dm1, dp1) + p1
    )
    delta = best - prev_min
    return cost + delta, delta


def _h_cost(scr_ref, cl_ref, t, x, blk, *, width, hl):
    """Census cost column at scan position x, (D-natural, HL-lanes) int32.

    scr_ref: (blk + D, HL) scratch holding COLUMN-REVERSED censusR rows;
    row (blk - 1 - t) + d is reversed-column (WP - 1 - x) + d, i.e.
    original column x - d — so sublane d of the slice holds
    censusR[x - d] with the disparity axis NATURAL.
    """
    win = scr_ref[pl.ds(blk - 1 - t, _D)]
    cl_row = cl_ref[t]
    ham = jax.lax.population_count(cl_row[None, :] ^ win)
    dvec = jax.lax.broadcasted_iota(jnp.int32, (_D, hl), 0)
    cost = jnp.where(dvec > x, _MAX_COST, ham)
    return jnp.where(x >= width, _PAD_COST, cost)


def _fill_scratch(scr_ref, r0_ref, r1_ref, r2_ref, blk):
    """Assemble reversed-census blocks [rb0; rb0+1; rb0+2] so window
    slices never cross a ref boundary (scratch is (blk + D, HL))."""
    scr_ref[0:blk] = r0_ref[:]
    if blk >= _D:
        scr_ref[blk: blk + _D] = r1_ref[0:_D]
    else:
        scr_ref[blk: 2 * blk] = r1_ref[:]
        scr_ref[2 * blk: 3 * blk] = r2_ref[:]


def _h_kernel(
    cl_f_ref, crp2_f_ref, crp_f_ref, cr_f_ref,
    cl_b_ref, crp2_b_ref, crp_b_ref, cr_b_ref,
    out_f_ref, out_b_ref,
    fwd_ref, bwd_ref, scrf_ref, scrb_ref,
    *, blk, p1, p2, width, hl,
):
    """Dual-direction horizontal DP over census columns.

    Outputs per-direction int8 deltas in (W, D, HL) blocks (D natural:
    the census window comes from the column-reversed right census, whose
    ascending rows are descending original columns).
    """
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        fwd_ref[:] = jnp.zeros_like(fwd_ref)
        bwd_ref[:] = jnp.zeros_like(bwd_ref)

    _fill_scratch(scrf_ref, cr_f_ref, crp_f_ref, crp2_f_ref, blk)
    _fill_scratch(scrb_ref, cr_b_ref, crp_b_ref, crp2_b_ref, blk)

    def body(t, carries):
        fwd, bwd = carries
        x_f = j * blk + t
        cost_f = _h_cost(scrf_ref, cl_f_ref, t, x_f, blk, width=width, hl=hl)
        fwd, delta_f = _dp_update_sub(fwd, cost_f, p1, p2, False)
        out_f_ref[t] = delta_f.astype(jnp.int16).astype(jnp.int8)
        tb = blk - 1 - t
        x_b = (nb - 1 - j) * blk + tb
        cost_b = _h_cost(scrb_ref, cl_b_ref, tb, x_b, blk, width=width, hl=hl)
        bwd, delta_b = _dp_update_sub(bwd, cost_b, p1, p2, False)
        out_b_ref[tb] = delta_b.astype(jnp.int16).astype(jnp.int8)
        return fwd, bwd

    fwd, bwd = jax.lax.fori_loop(0, blk, body, (fwd_ref[:], bwd_ref[:]))
    fwd_ref[:] = fwd
    bwd_ref[:] = bwd


def horizontal_deltas(
    cl_t: jnp.ndarray, cr_t_rev: jnp.ndarray, p1: int, p2: int, width: int,
    interpret: bool = False,
):
    """Run both horizontal DP directions over (WP, HP) int32 transposed
    census images (cr_t_rev is the COLUMN-reversed right census, i.e.
    cr_t[::-1]). Returns (delta_fwd, delta_bwd) as (WP, D, HP) int8 with
    the disparity axis natural in sublanes."""
    wp, hp = cl_t.shape
    assert wp % _D == 0 and hp % _D == 0
    blk = _D
    nb = wp // blk
    stripes = hp // _D
    grid = (stripes, nb)

    def in_specs(direction):
        # cl view follows the stream's natural block q; the cr views are
        # of the COLUMN-REVERSED census at reversed blocks nb-1-q and
        # nb-q (the window x-127..x reads backwards from column x).
        if direction == "f":
            jm = lambda i, j: (j, i)
            r0 = lambda i, j, n=nb: (n - 1 - j, i)
            r1 = lambda i, j, n=nb: (jnp.minimum(n - j, n - 1), i)
            r2 = lambda i, j, n=nb: (jnp.minimum(n + 1 - j, n - 1), i)
        else:
            jm = lambda i, j, n=nb: (n - 1 - j, i)
            r0 = lambda i, j: (j, i)
            r1 = lambda i, j, n=nb: (jnp.minimum(j + 1, n - 1), i)
            r2 = lambda i, j, n=nb: (jnp.minimum(j + 2, n - 1), i)
        blkspec = lambda m: pl.BlockSpec((blk, _D), m, memory_space=pltpu.VMEM)
        return [blkspec(jm), blkspec(r2), blkspec(r1), blkspec(r0)]

    out_spec_f = pl.BlockSpec(
        (blk, _D, _D), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
    )
    out_spec_b = pl.BlockSpec(
        (blk, _D, _D), lambda i, j, n=nb: (n - 1 - j, 0, i),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        partial(_h_kernel, blk=blk, p1=p1, p2=p2, width=width, hl=_D),
        grid=grid,
        in_specs=in_specs("f") + in_specs("b"),
        out_specs=[out_spec_f, out_spec_b],
        out_shape=[
            jax.ShapeDtypeStruct((wp, _D, hp), jnp.int8),
            jax.ShapeDtypeStruct((wp, _D, hp), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((_D, _D), jnp.int32),
            pltpu.VMEM((_D, _D), jnp.int32),
            pltpu.VMEM((blk + _D, _D), jnp.int32),
            pltpu.VMEM((blk + _D, _D), jnp.int32),
        ],
        interpret=interpret,
    )(cl_t, cr_t_rev, cr_t_rev, cr_t_rev,
      cl_t, cr_t_rev, cr_t_rev, cr_t_rev)


def _v_cost(cl_row, cr_row, y, *, height, wp):
    """Census cost slab for image row y: (D-natural, WP) int32.

    The strided roll shears the broadcast right-census row so sublane d
    holds censusR[y, x - d]; the wrap region x < d is overwritten by the
    max-cost mask.
    """
    bcast = jnp.broadcast_to(cr_row[None, :], (_D, wp))
    win = pltpu.roll(bcast, 0, 1, stride=1, stride_axis=0)
    ham = jax.lax.population_count(cl_row[None, :] ^ win)
    dsub = jax.lax.broadcasted_iota(jnp.int32, (_D, wp), 0)
    xlane = jax.lax.broadcasted_iota(jnp.int32, (_D, wp), 1)
    cost = jnp.where(dsub > xlane, _MAX_COST, ham)
    return jnp.where(y >= height, _PAD_COST, cost)


def _v_kernel(
    cl_f_ref, cr_f_ref, cl_b_ref, cr_b_ref,
    out_f_ref, out_b_ref, fwd_ref, bwd_ref,
    *, blk, p1, p2, height, wp,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        fwd_ref[:] = jnp.zeros_like(fwd_ref)
        bwd_ref[:] = jnp.zeros_like(bwd_ref)

    def body(t, carries):
        fwd, bwd = carries
        y_f = j * blk + t
        cost_f = _v_cost(cl_f_ref[t], cr_f_ref[t], y_f, height=height, wp=wp)
        fwd, delta_f = _dp_update_sub(fwd, cost_f, p1, p2, False)
        out_f_ref[t] = delta_f.astype(jnp.int16).astype(jnp.int8)
        tb = blk - 1 - t
        y_b = (nb - 1 - j) * blk + tb
        cost_b = _v_cost(cl_b_ref[tb], cr_b_ref[tb], y_b, height=height, wp=wp)
        bwd, delta_b = _dp_update_sub(bwd, cost_b, p1, p2, False)
        out_b_ref[tb] = delta_b.astype(jnp.int16).astype(jnp.int8)
        return fwd, bwd

    fwd, bwd = jax.lax.fori_loop(0, blk, body, (fwd_ref[:], bwd_ref[:]))
    fwd_ref[:] = fwd
    bwd_ref[:] = bwd


def vertical_deltas(
    cl: jnp.ndarray, cr: jnp.ndarray, p1: int, p2: int, height: int,
    interpret: bool = False, blk: int = 8,
):
    """Run both vertical DP directions over (HP, WP) int32 census images.
    Returns (delta_fwd, delta_bwd) as (HP, D, WP) int8 with the disparity
    axis NATURAL in sublanes."""
    hp, wp = cl.shape
    assert hp % blk == 0 and wp % _D == 0
    nb = hp // blk
    row = lambda m: pl.BlockSpec((blk, wp), m, memory_space=pltpu.VMEM)
    fmap = lambda j: (j, 0)
    bmap = lambda j, n=nb: (n - 1 - j, 0)
    out_f = pl.BlockSpec(
        (blk, _D, wp), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    out_b = pl.BlockSpec(
        (blk, _D, wp), lambda j, n=nb: (n - 1 - j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        partial(_v_kernel, blk=blk, p1=p1, p2=p2, height=height, wp=wp),
        grid=(nb,),
        in_specs=[row(fmap), row(fmap), row(bmap), row(bmap)],
        out_specs=[out_f, out_b],
        out_shape=[
            jax.ShapeDtypeStruct((hp, _D, wp), jnp.int8),
            jax.ShapeDtypeStruct((hp, _D, wp), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((_D, wp), jnp.int32),
            pltpu.VMEM((_D, wp), jnp.int32),
        ],
        interpret=interpret,
    )(cl, cr, cl, cr)


def _wta_kernel(
    hf_ref, hb_ref, vt_ref, cl_ref, crp2_ref, crp_ref, cr_ref,
    out_ref,
    b_ref, ring_d_ref, ring_r_ref, scr_ref,
    *, blk, width, hl, p_subpixel, p_lr, lr_max_diff, p_uniq,
):
    """Fused WTA scanning x: reconstruct totals, left/right argmin,
    subpixel, LR check. Emits disparity for pixel x - 127 at step x."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        b_ref[:] = jnp.full_like(b_ref, jnp.int32(1 << 30))
        ring_d_ref[:] = jnp.full_like(ring_d_ref, -1.0)
        ring_r_ref[:] = jnp.zeros_like(ring_r_ref)

    _fill_scratch(scr_ref, cr_ref, crp_ref, crp2_ref, blk)

    d_iota = jax.lax.broadcasted_iota(jnp.int32, (_D, hl), 0)
    k_iota = d_iota  # ring slot index

    def body(t, state):
        b, ring_d, ring_r = state
        x = j * blk + t
        cost = _h_cost(scr_ref, cl_ref, t, x, blk, width=width, hl=hl)
        total = (
            hf_ref[t].astype(jnp.int32)
            + hb_ref[t].astype(jnp.int32)
            + vt_ref[t].astype(jnp.int32)
            + 4 * cost
        )
        total = jnp.where(x >= width, _BIG_T, total)
        packed = total * _D + d_iota

        # Left view: winner + neighbor costs via sublane reductions.
        run = jnp.min(packed, axis=0, keepdims=True)  # (1, hl)
        best = jnp.bitwise_and(run, _D - 1)
        c0 = (run >> 7).astype(jnp.float32)
        big = jnp.int32(1 << 30)
        cm = jnp.min(
            jnp.where(d_iota == best - 1, total, big), axis=0, keepdims=True
        ).astype(jnp.float32)
        cp = jnp.min(
            jnp.where(d_iota == best + 1, total, big), axis=0, keepdims=True
        ).astype(jnp.float32)
        disp = best.astype(jnp.float32)
        if p_subpixel:
            denom = cm - 2.0 * c0 + cp
            offset = jnp.where(
                denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0
            )
            interior = (best > 0) & (best < _D - 1)
            disp = disp + jnp.where(interior, offset, 0.0)
        valid = (x >= best) & (x < width)
        if p_uniq > 0:
            # Uniqueness (libSGM/SGBM lineage): winner must beat every
            # non-adjacent candidate by 1/ratio — one extra masked sublane
            # min over the already-resident totals (ops/sgm.py semantics).
            umin = jnp.min(
                jnp.where(jnp.abs(d_iota - best) <= 1, big, total),
                axis=0, keepdims=True,
            ).astype(jnp.float32)
            valid = valid & (umin * jnp.float32(p_uniq) >= c0)
        disp = jnp.where(valid, disp, -1.0)

        # Right view systolic: B[k] accumulates min over d<=k of
        # total(xr + d, d) for right pixel xr = x - k; after this step
        # pixel x - 127 is complete at sublane 127.
        b = jnp.minimum(
            jnp.where(d_iota == 0, big, pltpu.roll(b, 1, 0)),
            packed,
        )
        rv = b[_D - 1: _D, :]  # popped right pixel x - 127: packed min
        best_r = jnp.bitwise_and(rv, _D - 1)

        # Rings: insert current left result / popped right argmin at slot 0.
        ring_d = jnp.where(k_iota == 0, disp, pltpu.roll(ring_d, 1, 0))
        ring_r = jnp.where(k_iota == 0, best_r, pltpu.roll(ring_r, 1, 0))

        if p_lr:
            p = x - (_D - 1)  # the pixel completing this step
            d_l = ring_d[_D - 1: _D, :]  # its left disparity (or -1)
            xr = jnp.round(p - d_l).astype(jnp.int32)
            delta = p - xr
            onehot = (k_iota == delta) & (d_l >= 0.0)
            d_r = jnp.sum(jnp.where(onehot, ring_r, 0), axis=0, keepdims=True)
            consistent = jnp.abs(d_l - d_r.astype(jnp.float32)) <= lr_max_diff
            final = jnp.where((xr >= 0) & consistent & (d_l >= 0.0), d_l, -1.0)
        else:
            final = ring_d[_D - 1: _D, :]
        out_ref[t] = final[0]
        return b, ring_d, ring_r

    b, ring_d, ring_r = jax.lax.fori_loop(
        0, blk, body, (b_ref[:], ring_d_ref[:], ring_r_ref[:])
    )
    b_ref[:] = b
    ring_d_ref[:] = ring_d
    ring_r_ref[:] = ring_r


def wta_from_parts(
    hf: jnp.ndarray, hb: jnp.ndarray, vt: jnp.ndarray,
    cl_t: jnp.ndarray, cr_t_rev: jnp.ndarray,
    width: int,
    subpixel: bool = True, lr_check: bool = True, lr_max_diff: float = 1.0,
    interpret: bool = False, blk: int = 64, uniqueness_ratio: float = 0.0,
):
    """Fused WTA over streamed parts.

    hf/hb: (WP, D, HP) int8 horizontal deltas; vt: (WP, D, HP) uint8
    summed vertical deltas (transposed by XLA); cl_t: (WP, HP) int32
    transposed census; cr_t_rev: its column-reversed right counterpart.
    Returns (WP, HP) f32 disparities in scan layout — row x holds PIXEL
    x - 127 (the caller shifts & crops).
    """
    wp, d, hp = hf.shape
    assert d == _D and wp % blk == 0 and 2 * blk >= _D
    wpx = wp + _D
    nbx = wpx // blk
    nb = wp // blk
    stripes = hp // _D

    clamp = lambda j: jnp.minimum(j, nb - 1)
    clamp0 = lambda j: jnp.clip(j, 0, nb - 1)
    vol = lambda m: pl.BlockSpec((blk, _D, _D), m, memory_space=pltpu.VMEM)
    img = lambda m: pl.BlockSpec((blk, _D), m, memory_space=pltpu.VMEM)
    vmap_ = lambda i, j: (clamp(j), 0, i)
    imap = lambda i, j: (clamp(j), i)
    # Reversed-census windows: natural block q=clamp(j) reads reversed
    # blocks nb-1-q, nb-q, nb+1-q.
    rmap0 = lambda i, j: (clamp0(nb - 1 - clamp(j)), i)
    rmap1 = lambda i, j: (clamp0(nb - clamp(j)), i)
    rmap2 = lambda i, j: (clamp0(nb + 1 - clamp(j)), i)

    out = pl.pallas_call(
        partial(
            _wta_kernel, blk=blk, width=width, hl=_D,
            p_subpixel=subpixel, p_lr=lr_check, lr_max_diff=lr_max_diff,
            p_uniq=float(uniqueness_ratio),
        ),
        grid=(stripes, nbx),
        in_specs=[vol(vmap_), vol(vmap_), vol(vmap_),
                  img(imap), img(rmap2), img(rmap1), img(rmap0)],
        out_specs=pl.BlockSpec(
            (blk, _D), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((wpx, hp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_D, _D), jnp.int32),
            pltpu.VMEM((_D, _D), jnp.float32),
            pltpu.VMEM((_D, _D), jnp.int32),
            pltpu.VMEM((blk + _D, _D), jnp.int32),
        ],
        interpret=interpret,
    )(hf, hb, vt, cl_t, cr_t_rev, cr_t_rev, cr_t_rev)
    return out


def _pad_to(x: jnp.ndarray, mult0: int, mult1: int):
    h, w = x.shape
    return jnp.pad(x, ((0, (-h) % mult0), (0, (-w) % mult1)))


@partial(jax.jit, static_argnames=(
    "p1", "p2", "subpixel", "lr_check", "lr_max_diff", "interpret",
    "uniqueness_ratio"))
def sgm_disparity_v2(
    census_l: jnp.ndarray,
    census_r: jnp.ndarray,
    p1: int = 10,
    p2: int = 120,
    subpixel: bool = True,
    lr_check: bool = True,
    lr_max_diff: float = 1.0,
    interpret: bool = False,
    uniqueness_ratio: float = 0.0,
) -> jnp.ndarray:
    """Full v2 SGM from (H, W) int32 census images to (H, W) f32 disparity
    (-1 invalid). Bitwise-equal to ops.sgm's XLA reference pipeline."""
    h, w = census_l.shape
    cl = _pad_to(census_l, _D, _D)
    cr = _pad_to(census_r, _D, _D)
    hp, wp = cl.shape
    cl_t = cl.T
    cr_t_rev = cr.T[::-1]

    hf, hb = horizontal_deltas(cl_t, cr_t_rev, p1, p2, w, interpret)
    vf, vb = vertical_deltas(cl, cr, p1, p2, h, interpret)
    # Sum (fits uint8: 2*p2 <= 240) + transpose to the scan layout — one
    # fused XLA copy, the only full-volume relayout in the pipeline.
    vt = jnp.transpose(vf.astype(jnp.uint8) + vb.astype(jnp.uint8),
                       (2, 1, 0))
    scan = wta_from_parts(
        hf, hb, vt, cl_t, cr_t_rev, w,
        subpixel=subpixel, lr_check=lr_check, lr_max_diff=lr_max_diff,
        interpret=interpret, uniqueness_ratio=uniqueness_ratio,
    )
    # Row x of `scan` holds pixel x - 127: shift, crop, back to (H, W).
    return scan[_D - 1: _D - 1 + w, :h].T


def total_from_parts(census_l, census_r, p1=10, p2=120, interpret=False):
    """(H, W, D) int32 aggregated 4-path total — test oracle hook."""
    h, w = census_l.shape
    cl = _pad_to(census_l, _D, _D)
    cr = _pad_to(census_r, _D, _D)
    cl_t, cr_t_rev = cl.T, cr.T[::-1]
    hf, hb = horizontal_deltas(cl_t, cr_t_rev, p1, p2, w, interpret)
    vf, vb = vertical_deltas(cl, cr, p1, p2, h, interpret)
    hsum = (
        hf.astype(jnp.int32) + hb.astype(jnp.int32)
    ).transpose(2, 0, 1)  # (HP, WP, D)
    vsum = (vf.astype(jnp.int32) + vb.astype(jnp.int32)).transpose(0, 2, 1)
    from .sgm import hamming_cost_volume_dhw

    cost = hamming_cost_volume_dhw(census_l, census_r, _D).astype(jnp.int32)
    cost = jnp.transpose(cost, (1, 2, 0))
    return hsum[:h, :w] + vsum[:h, :w] + 4 * cost
