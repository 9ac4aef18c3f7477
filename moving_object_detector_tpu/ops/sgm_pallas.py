"""Pallas TPU kernels for SGM path aggregation.

The XLA ``lax.scan`` formulation in ops/sgm.py is correct but scan-step
-overhead-bound on TPU (~1 s/frame at KITTI resolution: ~3200 sequential
steps of tiny (rows, D) updates). These kernels restructure the dynamic
programming the TPU way:

* the scanline axis is the *leading* (untiled) block dimension, so the DP
  loop's dynamic indexing never touches a tiled sublane/lane dim (a Mosaic
  requirement); the horizontal pass therefore runs on a (W, H, D)-transposed
  copy of the cost volume, the vertical pass on the natural (H, W, D);
* the scan axis is tiled across the sequential Pallas grid with the DP
  carry held in VMEM scratch, which persists across grid steps — each grid
  step processes one block with a plain ``fori_loop``, no per-step XLA
  dispatch;
* forward and backward directions run in the same kernel on two block
  streams (two in/out specs with mirrored index maps), halving kernel
  launches;
* the disparity axis D = 128 is the lane dimension; d±1 neighbor shifts are
  lane rolls with edge masking; path sums are stored int16 (4-path maximum
  4*(24+120) = 576).

Replaces the CUDA path-aggregation kernels of sgm_gpu_ros (SURVEY.md §2.3)
on the same contract as sgm.aggregate_cost_volume (bitwise-equal output).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sublane-dim block sizes: int8 tiles need multiples of 32; 64 cross-rows
# per step amortizes the DP chain's op-issue latency (~10% over 32).
_LANES = 128
_SUB = 64
# Leading-dim (scan axis) block lengths (VMEM: 2 streams x (blk, SUB, 128)
# x (1B in + 2B out) x 2 pipeline buffers must stay well under 16 MB).
_BLK_W = 104
_BLK_H = 96


def _dp_update(carry, cost, p1, p2, flipped=False):
    """One SGM step on (R, D) int32 registers:
    L(d) = C(d) + min(Lp(d), Lp(d-1)+P1, Lp(d+1)+P1, min Lp + P2) - min Lp.

    ``flipped``: the lane axis stores disparities reversed (lane l holds
    d = D-1-l); the d±1 neighbor rolls and edge masks mirror accordingly.
    The flipped-lane convention lets the downstream WTA kernel express the
    right-view shear as a single strided roll without any lane-permuting
    relayout of the 120 MB volume.
    """
    r, d = carry.shape
    prev_min = jnp.min(carry, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, d), 1)
    big = jnp.int32(1 << 20)
    if flipped:
        down = jnp.where(lane == d - 1, big, pltpu.roll(carry, d - 1, 1))
        up = jnp.where(lane == 0, big, pltpu.roll(carry, 1, 1))
    else:
        down = jnp.where(lane == 0, big, pltpu.roll(carry, 1, 1))  # Lp(d-1)
        up = jnp.where(lane == d - 1, big, pltpu.roll(carry, d - 1, 1))
    best = jnp.minimum(
        jnp.minimum(carry, prev_min + p2), jnp.minimum(down, up) + p1
    )
    return cost + best - prev_min


def _dual_scan_kernel(
    cost_f_ref, cost_b_ref, out_f_ref, out_b_ref, fwd_ref, bwd_ref,
    *, blk, p1, p2, flipped=False
):
    """Forward + backward DP over one pair of mirrored scan-axis blocks.

    cost_*_ref: (BLK, SUB, D) int8 — forward-streamed and backward-streamed
    blocks of the (scan, cross, D) cost volume.
    out_*_ref: (BLK, SUB, D) int16 per-direction path costs. Each direction
    writes its own output unconditionally — predicated read-modify-write
    accumulation into a shared output measured ~20x slower; the two arrays
    are summed by one fused XLA pass afterwards.
    fwd_ref/bwd_ref: (SUB, D) int32 scratch carries, persistent across the
    sequential grid; reset when a new cross-axis stripe begins.
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        fwd_ref[:] = jnp.zeros_like(fwd_ref)
        bwd_ref[:] = jnp.zeros_like(bwd_ref)

    def body(x, carries):
        fwd, bwd = carries
        cf = cost_f_ref[x].astype(jnp.int32)
        fwd = _dp_update(fwd, cf, p1, p2, flipped)
        out_f_ref[x] = fwd.astype(jnp.int16)
        xb = blk - 1 - x
        cb = cost_b_ref[xb].astype(jnp.int32)
        bwd = _dp_update(bwd, cb, p1, p2, flipped)
        out_b_ref[xb] = bwd.astype(jnp.int16)
        return fwd, bwd

    fwd, bwd = jax.lax.fori_loop(
        0, blk, body, (fwd_ref[:], bwd_ref[:])
    )
    fwd_ref[:] = fwd
    bwd_ref[:] = bwd


def _dual_scan(cost_scan_major: jnp.ndarray, blk: int, p1: int, p2: int,
               interpret: bool, flipped: bool = False):
    """Run the dual-direction DP over a (S, C, D) int8 volume where S is the
    scan axis (leading) and C the cross axis (sublane-tiled). Returns the
    int16 sum of both directions."""
    s, c, d = cost_scan_major.shape
    assert s % blk == 0 and c % _SUB == 0 and d == _LANES
    ns = s // blk
    grid = (c // _SUB, ns)

    out_f, out_b = pl.pallas_call(
        partial(_dual_scan_kernel, blk=blk, p1=p1, p2=p2, flipped=flipped),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (blk, _SUB, d), lambda i, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (blk, _SUB, d),
                lambda i, j, _ns=ns: (_ns - 1 - j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (blk, _SUB, d), lambda i, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (blk, _SUB, d),
                lambda i, j, _ns=ns: (_ns - 1 - j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, c, d), jnp.int16),
            jax.ShapeDtypeStruct((s, c, d), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SUB, d), jnp.int32),
            pltpu.VMEM((_SUB, d), jnp.int32),
        ],
        interpret=interpret,
    )(cost_scan_major, cost_scan_major)
    return (out_f.astype(jnp.int32) + out_b.astype(jnp.int32)).astype(
        jnp.int16
    )


def _census_kernel(*refs, width, rh, rw, blk):
    """Census transform for one stripe of rows.

    refs: 2*rh+1 row-shifted copies of the padded image, each a (blk, WP)
    f32 block (shifted copies sidestep Mosaic's sublane-aligned-slice
    requirement — an in-kernel halo slice at r0+dy is misaligned), followed
    by the (blk, WP) int32 output.
    """
    row_refs = refs[: 2 * rh + 1]
    out_ref = refs[2 * rh + 1]
    wp = out_ref.shape[1]
    center = row_refs[rh][:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
    out = jnp.zeros((blk, wp), jnp.int32)
    bit = 0
    for dy in range(-rh, rh + 1):
        rows = row_refs[rh + dy][:]
        for dx in range(-rw, rw + 1):
            if dy == 0 and dx == 0:
                continue
            if dx == 0:
                darker = rows < center
            else:
                shift = (-dx) % wp
                neigh = pltpu.roll(rows, shift, 1)
                if dx > 0:
                    valid = lanes < width - dx
                else:
                    valid = lanes >= -dx
                # NOTE: jnp.where(mask, bool_vec, False) trips an
                # unsupported i1 truncation in Mosaic; boolean AND works.
                darker = valid & (neigh < center)
            out = out | (darker.astype(jnp.int32) << bit)
            bit += 1
    out_ref[:] = out


def _cost_kernel(cl_ref, cr_ref, out_ref, *, width, d_max, blk):
    """Hamming cost stripe: out[d, y, x] = popcount(cl[y,x] ^ cr[y,x-d]).

    cl_ref/cr_ref: (blk, WP) int32 census stripes; out_ref: (D, blk, WP)
    bf16 (exact: integer costs <= 127). In-image x < d candidates get the
    max census distance (32); pad columns x >= width get the uniform 127
    (DP-neutral).
    """
    wp = cl_ref.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
    cl = cl_ref[:]
    cr = cr_ref[:]

    def body(d, _):
        shifted = pltpu.roll(cr, d, 1)  # cr[x - d] (wraps; masked below)
        ham = jax.lax.population_count(cl ^ shifted)
        ham = jnp.where(lanes < d, 32, ham)
        ham = jnp.where(lanes >= width, 127, ham)
        # int32 -> int8 truncation is unsupported by this Mosaic version;
        # bf16 is exact for census costs (integers <= 127) and feeds the
        # MXU relayouts without a cast.
        out_ref[d] = ham.astype(jnp.float32).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, d_max, body, 0)


@partial(jax.jit, static_argnames=("d_max", "window", "interpret"))
def census_cost_volume_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    d_max: int = 128,
    window=(5, 5),
    interpret: bool = False,
):
    """Fused census + Hamming cost volume on TPU.

    Returns (D, HP, WP) bf16 with HP = H rounded to 8 and WP = W rounded to
    128 (pad columns at uniform 127). The XLA census path materializes ~24
    shifted comparison intermediates through HBM (~3 ms/frame at KITTI
    size); here each stripe stays in VMEM.
    """
    h, w = left.shape
    rh, rw = window[0] // 2, window[1] // 2
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    blk = 8

    def pad_img(img):
        img = img.astype(jnp.float32)
        return jnp.pad(
            img,
            ((rh, hp - h + rh), (0, wp - w)),
            constant_values=jnp.inf,
        )

    censuses = []
    n_rows = 2 * rh + 1
    row_spec = pl.BlockSpec((blk, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    for img in (left, right):
        padded = pad_img(img)  # (HP + 2*rh, WP)
        shifted = [padded[dy : dy + hp] for dy in range(n_rows)]
        census = pl.pallas_call(
            partial(_census_kernel, width=w, rh=rh, rw=rw, blk=blk),
            grid=(hp // blk,),
            in_specs=[row_spec] * n_rows,
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            interpret=interpret,
        )(*shifted)
        censuses.append(census)
    cl, cr = censuses

    cost = pl.pallas_call(
        partial(_cost_kernel, width=w, d_max=d_max, blk=blk),
        grid=(hp // blk,),
        in_specs=[
            pl.BlockSpec((blk, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (d_max, blk, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_max, hp, wp), jnp.bfloat16),
        interpret=interpret,
    )(cl, cr)
    return cost


def _pad_axis(x: jnp.ndarray, axis: int, mult: int, value):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _block_len(extent: int, preferred: int) -> int:
    """Largest divisor of ``extent`` that is <= preferred (extent is a
    multiple of 32, so a reasonable divisor always exists)."""
    for cand in range(min(preferred, extent), 0, -1):
        if extent % cand == 0:
            return cand
    return extent


@partial(jax.jit, static_argnames=("p1", "p2", "interpret", "lanes_flipped"))
def aggregate_cost_volume_pallas(
    cost: jnp.ndarray,
    p1: int = 10,
    p2: int = 120,
    interpret: bool = False,
    cost_whd: jnp.ndarray | None = None,
    lanes_flipped: bool = False,
) -> jnp.ndarray:
    """4-path SGM aggregation of an (H, W, D=128) cost volume.

    Drop-in for sgm.aggregate_cost_volume (returns f32, bitwise-equal
    values). H and W are padded internally to multiples of 32; padded cells
    carry a uniform cost, which is *exactly* neutral for the DP: a uniform
    carry c gives L = C + c - c, identical to a fresh zero carry. So padded
    results equal the unpadded reference on all real pixels.
    """
    h, w, d = cost.shape
    assert d == _LANES, "disparity axis must be 128 lanes"
    cost_i8 = jnp.clip(cost, 0, 127).astype(jnp.int8)
    cost_i8 = _pad_axis(_pad_axis(cost_i8, 0, _SUB, 127), 1, _SUB, 127)
    hp, wp = cost_i8.shape[:2]

    # Horizontal: scan axis W leading. The caller may supply the (W, H, D)
    # relayout directly (computed on the MXU, see sgm.compute_disparity);
    # otherwise fall back to an XLA transpose.
    if cost_whd is not None:
        cost_t = jnp.clip(cost_whd, 0, 127).astype(jnp.int8)
        cost_t = _pad_axis(_pad_axis(cost_t, 0, _SUB, 127), 1, _SUB, 127)
    else:
        cost_t = jnp.transpose(cost_i8, (1, 0, 2))  # (W, H, D)
    blk_w = _block_len(wp, _BLK_W)
    hsum_t = _dual_scan(cost_t, blk_w, p1, p2, interpret, lanes_flipped)
    hsum = jnp.transpose(hsum_t, (1, 0, 2))  # (H, W, D)

    # Vertical: scan axis H leading (natural layout).
    blk_h = _block_len(hp, _BLK_H)
    vsum = _dual_scan(cost_i8, blk_h, p1, p2, interpret, lanes_flipped)

    # Max 4-path sum is 576: stays int16, halving all downstream traffic.
    total = (hsum.astype(jnp.int32) + vsum.astype(jnp.int32)).astype(
        jnp.int16
    )
    return total[:h, :w, :]


def _wta_kernel(
    tot_ref, out_ref, *, width, d_max, blk, p_subpixel, p_lr, lr_max_diff
):
    """Fused winner-take-all for one stripe of rows.

    tot_ref: (D, blk, WP) int16 aggregated costs (D leading so the d-loop
    never touches a tiled dim). Computes, entirely in-kernel: the left-view
    argmin with winner/neighbor costs (packed-value trick: cost*128+d makes
    one min() yield both cost and argument with first-min tie-breaking),
    parabolic subpixel, the right-view argmin via dynamic lane rolls
    (cost_R(x, d) = total(x+d, d)), and the gather-free LR resolution
    d_R(x - round(d_L)) via a second shift-select loop.

    out_ref: (blk, WP) f32 disparity, -1 where invalid.
    """
    wp = tot_ref.shape[2]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
    big = jnp.int32(1 << 24)

    def body(d, carry):
        run_packed, cm, cp, prev, rv_packed = carry
        sl = tot_ref[d].astype(jnp.int32)
        # Right neighbor of the current winner (ordering: before updates).
        cur_arg = jnp.bitwise_and(run_packed, 127)
        cp = jnp.where(d == cur_arg + 1, sl, cp)
        packed = sl * 128 + d
        better = packed < run_packed
        cm = jnp.where(better, prev, cm)
        run_packed = jnp.minimum(run_packed, packed)
        # Right view: candidate for right-pixel x is total(x + d, d).
        shift = (wp - d) % wp
        sr = pltpu.roll(sl, shift, 1)  # sr[x] = sl[x + d] (wraps)
        sr = jnp.where(lanes + d < wp, sr, big // 256)
        rv_packed = jnp.minimum(rv_packed, sr * 128 + d)
        return run_packed, cm, cp, prev * 0 + sl, rv_packed

    init = (
        jnp.full((blk, wp), big, jnp.int32),
        jnp.full((blk, wp), big, jnp.int32),
        jnp.full((blk, wp), big, jnp.int32),
        jnp.full((blk, wp), big, jnp.int32),
        jnp.full((blk, wp), big, jnp.int32),
    )
    run_packed, cm, cp, _, rv_packed = jax.lax.fori_loop(0, d_max, body, init)

    best = jnp.bitwise_and(run_packed, 127)
    c0 = (run_packed >> 7).astype(jnp.float32)
    cmf = cm.astype(jnp.float32)
    cpf = cp.astype(jnp.float32)
    disp = best.astype(jnp.float32)
    if p_subpixel:
        denom = cmf - 2.0 * c0 + cpf
        offset = jnp.where(
            denom > 1e-6, 0.5 * (cmf - cpf) / jnp.maximum(denom, 1e-6), 0.0
        )
        interior = (best > 0) & (best < d_max - 1)
        disp = disp + jnp.where(interior, offset, 0.0)

    valid = lanes >= best
    if p_lr:
        best_r = jnp.bitwise_and(rv_packed, 127)
        # Match the XLA path bit-for-bit: xr = round(x - disp).
        xr = jnp.round(lanes.astype(jnp.float32) - disp).astype(jnp.int32)
        xshift = lanes - xr
        xr_ok = xr >= 0

        def resolve(k, d_r):
            rolled = pltpu.roll(best_r, k, 1)  # best_r[x - k] (wraps)
            take = (xshift == k) & (lanes >= k)
            return jnp.where(take, rolled, d_r)

        d_r = jax.lax.fori_loop(
            0, d_max, resolve, jnp.full((blk, wp), -1000, jnp.int32)
        )
        consistent = jnp.abs(disp - d_r.astype(jnp.float32)) <= lr_max_diff
        valid = valid & xr_ok & consistent
    valid = valid & (lanes < width)
    out_ref[:] = jnp.where(valid, disp, -1.0)


@partial(jax.jit, static_argnames=("subpixel", "lr_check", "lr_max_diff", "interpret", "lanes_flipped"))
def wta_disparity_pallas(
    total: jnp.ndarray,
    subpixel: bool = True,
    lr_check: bool = True,
    lr_max_diff: float = 1.0,
    interpret: bool = False,
    lanes_flipped: bool = False,
) -> jnp.ndarray:
    """Fused WTA over an (H, W, D=128) aggregated volume. Returns (H, W)
    f32 disparity with -1 invalid — same contract as sgm.wta_disparity.

    lanes_flipped: the volume stores disparity d at lane D-1-d (see
    _dp_update); un-flipped here via a negated-leading-index transpose (the
    relayout cost is the same either way — Mosaic cannot stride a roll over
    the lane dim, so a truly relayout-free WTA isn't expressible yet; see
    PLAN_NEXT.md).
    """
    h, w, d = total.shape
    assert d == _LANES
    if lanes_flipped:
        total = total[:, :, ::-1]
    blk = 8
    hp = -(-h // blk) * blk
    wp = -(-w // 128) * 128
    tot = jnp.pad(
        total.astype(jnp.int16),
        ((0, hp - h), (0, wp - w), (0, 0)),
        constant_values=jnp.int16(20000),
    )
    tot = jnp.transpose(tot, (2, 0, 1))  # (D, HP, WP)
    disp = pl.pallas_call(
        partial(
            _wta_kernel,
            width=w,
            d_max=d,
            blk=blk,
            p_subpixel=subpixel,
            p_lr=lr_check,
            lr_max_diff=lr_max_diff,
        ),
        grid=(hp // blk,),
        in_specs=[
            pl.BlockSpec((d, blk, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((blk, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(tot)
    return disp[:h, :w]
