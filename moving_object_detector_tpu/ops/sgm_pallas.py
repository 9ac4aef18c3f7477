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

# Sublane-dim block sizes: int8 tiles need multiples of 32.
_LANES = 128
_SUB = 32
# Leading-dim (scan axis) block lengths.
_BLK_W = 208  # horizontal kernel: W blocks (1248 = 6 * 208)
_BLK_H = 96  # vertical kernel: H blocks (384 = 4 * 96)


def _dp_update(carry, cost, p1, p2):
    """One SGM step on (R, D) int32 registers:
    L(d) = C(d) + min(Lp(d), Lp(d-1)+P1, Lp(d+1)+P1, min Lp + P2) - min Lp.
    """
    r, d = carry.shape
    prev_min = jnp.min(carry, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, d), 1)
    big = jnp.int32(1 << 20)
    down = jnp.where(lane == 0, big, pltpu.roll(carry, 1, 1))  # Lp(d-1)
    up = jnp.where(lane == d - 1, big, pltpu.roll(carry, d - 1, 1))  # Lp(d+1)
    best = jnp.minimum(
        jnp.minimum(carry, prev_min + p2), jnp.minimum(down, up) + p1
    )
    return cost + best - prev_min


def _dual_scan_kernel(
    cost_f_ref, cost_b_ref, out_f_ref, out_b_ref, fwd_ref, bwd_ref,
    *, blk, p1, p2
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
        fwd = _dp_update(fwd, cf, p1, p2)
        out_f_ref[x] = fwd.astype(jnp.int16)
        xb = blk - 1 - x
        cb = cost_b_ref[xb].astype(jnp.int32)
        bwd = _dp_update(bwd, cb, p1, p2)
        out_b_ref[xb] = bwd.astype(jnp.int16)
        return fwd, bwd

    fwd, bwd = jax.lax.fori_loop(
        0, blk, body, (fwd_ref[:], bwd_ref[:])
    )
    fwd_ref[:] = fwd
    bwd_ref[:] = bwd


def _dual_scan(cost_scan_major: jnp.ndarray, blk: int, p1: int, p2: int,
               interpret: bool):
    """Run the dual-direction DP over a (S, C, D) int8 volume where S is the
    scan axis (leading) and C the cross axis (sublane-tiled). Returns the
    int16 sum of both directions."""
    s, c, d = cost_scan_major.shape
    assert s % blk == 0 and c % _SUB == 0 and d == _LANES
    ns = s // blk
    grid = (c // _SUB, ns)

    out_f, out_b = pl.pallas_call(
        partial(_dual_scan_kernel, blk=blk, p1=p1, p2=p2),
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


@partial(jax.jit, static_argnames=("p1", "p2", "interpret"))
def aggregate_cost_volume_pallas(
    cost: jnp.ndarray, p1: int = 10, p2: int = 120, interpret: bool = False
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

    # Horizontal: scan axis W leading.
    cost_t = jnp.transpose(cost_i8, (1, 0, 2))  # (W, H, D)
    blk_w = _block_len(wp, _BLK_W)
    hsum_t = _dual_scan(cost_t, blk_w, p1, p2, interpret)  # (W, H, D) i16
    hsum = jnp.transpose(hsum_t, (1, 0, 2))  # (H, W, D)

    # Vertical: scan axis H leading (natural layout).
    blk_h = _block_len(hp, _BLK_H)
    vsum = _dual_scan(cost_i8, blk_h, p1, p2, interpret)  # (H, W, D) i16

    # Max 4-path sum is 576: stays int16, halving all downstream traffic.
    total = (hsum.astype(jnp.int32) + vsum.astype(jnp.int32)).astype(
        jnp.int16
    )
    return total[:h, :w, :]
