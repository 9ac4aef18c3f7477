"""Pallas TPU kernel for the PWC-Net local correlation layer.

The XLA shift-and-reduce form (ops/flow_ops.py ``correlation``) re-reads the
feature maps once per offset: 81 offsets x ~several MB per pyramid level
(measured ~2.9 ms at KITTI level 2). This kernel reads f1 and f2 into VMEM
ONCE per (row block, channel chunk) and produces all (2r+1)^2 offset planes
from registers:

* layout (C, H, W): lanes = W so the dx shift is one lane roll per offset;
  the channel reduction is a vector add over the leading axis;
* dy handled by slicing a halo'd f2 scratch assembled from the current and
  adjacent row blocks (BlockSpecs cannot overlap, so the neighbors arrive
  as separate refs — the sgm_pallas2 adjacent-block trick);
* channels are processed in chunks of <= 64 on the innermost grid
  dimension, accumulating into the revisited output block — this bounds
  VMEM (the first attempt OOM'd the 16 MB scoped vmem at C = 64 with
  double-buffered full-channel blocks);
* out-of-image columns are zero because the W padding is >= r and zero
  (lane rolls wrap through the zero pad); out-of-image rows are masked
  in-kernel to match the XLA zero-pad semantics.

Replaces the hot path of the reference's Caffe correlation layer
(docker/dockerfile:73-74; SURVEY.md §2.3 pwc_net_ros) on TPU. The XLA
form in flow_ops.py remains the portable reference / correctness oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(
    f1_ref, f2p_ref, f2c_ref, f2n_ref, out_ref, scr_ref,
    *, bh, r, height, c_real, n_chunks,
):
    """One (row block, channel chunk): accumulate
    out[(dy, dx), y, x] += mean-contribution of this chunk's channels to
    corr(f1, f2) at offset (dy, dx).

    f1/f2*: (1, cc, bh, W); scr: (cc, bh + 2r, W) halo'd f2;
    out: (1, K, bh, W), K = (2r+1)^2, dy-major, revisited across chunks.
    """
    i = pl.program_id(1)
    cc = pl.program_id(2)

    @pl.when(cc == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Halo'd f2 rows: last r rows of the previous block, the current
    # block, first r rows of the next block.
    scr_ref[:, 0:r] = f2p_ref[0, :, bh - r : bh]
    scr_ref[:, r : r + bh] = f2c_ref[0]
    scr_ref[:, r + bh : bh + 2 * r] = f2n_ref[0, :, 0:r]

    f1 = f1_ref[0]
    inv_c = jnp.float32(1.0 / c_real)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, bh, 1), 1) + i * bh

    k = 0
    for dy in range(-r, r + 1):
        f2dy = scr_ref[:, r + dy : r + dy + bh, :]
        # Rows y + dy outside the image contribute zero (XLA pad parity).
        ok = (row + dy >= 0) & (row + dy < height)
        f2dy = jnp.where(ok, f2dy, 0.0)
        for dx in range(-r, r + 1):
            # Lane roll by -dx: column x reads f2[x + dx]; wrapped columns
            # land in the zero W-padding (pad >= r), so no mask is needed.
            shifted = pltpu.roll(f2dy, (-dx) % f2dy.shape[-1], 2)
            out_ref[0, k] += jnp.sum(f1 * shifted, axis=0) * inv_c
            k += 1


def _pad_axis(x, axis, mult, extra=0):
    pad = (-x.shape[axis]) % mult + extra
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg) if pad else x


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
@partial(jax.jit, static_argnames=("search_range", "interpret"))
def correlation_pallas(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    search_range: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for flow_ops.correlation on TPU: (B, H, W, C) pair ->
    (B, H, W, (2r+1)^2) mean-channel local cost volume.

    Differentiable: the backward pass runs through the XLA reference form
    (training hits correlation far less often than serving; the kernel
    keeps the inference path fast while grads stay exact)."""
    b, h, w, c = f1.shape
    r = search_range
    k = (2 * r + 1) ** 2

    # Channel chunks of <= 64 (VMEM budget); pad C to the chunk multiple.
    cchunk = min(c, 64)
    n_chunks = -(-c // cchunk)

    # (B, C, H, W) with lanes = W. Zero W-pad to a lane multiple with >= r
    # slack so lane rolls wrap through zeros; zero C-pad to the chunk grid.
    f1t = _pad_axis(jnp.moveaxis(f1, 3, 1), 1, cchunk)
    f1t = _pad_axis(f1t, 3, 128, 0)
    if f1t.shape[3] - w < r:
        f1t = jnp.pad(f1t, ((0, 0), (0, 0), (0, 0), (0, 128)))
    f2t = _pad_axis(jnp.moveaxis(f2, 3, 1), 1, cchunk)
    f2t = _pad_axis(f2t, 3, f1t.shape[3])

    bh = 8
    f1t = _pad_axis(f1t, 2, bh)
    f2t = _pad_axis(f2t, 2, bh)
    hp, wp = f1t.shape[2], f1t.shape[3]
    nb = hp // bh

    spec = lambda m: pl.BlockSpec(
        (1, cchunk, bh, wp), m, memory_space=pltpu.VMEM
    )
    cur = lambda bb, i, cc: (bb, cc, i, 0)
    prev = lambda bb, i, cc: (bb, cc, jnp.maximum(i - 1, 0), 0)
    nxt = lambda bb, i, cc, n=nb: (bb, cc, jnp.minimum(i + 1, n - 1), 0)

    out = pl.pallas_call(
        partial(
            _corr_kernel, bh=bh, r=r, height=h, c_real=c, n_chunks=n_chunks
        ),
        grid=(b, nb, n_chunks),
        in_specs=[spec(cur), spec(prev), spec(cur), spec(nxt)],
        out_specs=pl.BlockSpec(
            (1, k, bh, wp), lambda bb, i, cc: (bb, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cchunk, bh + 2 * r, wp), jnp.float32)],
        interpret=interpret,
    )(f1t, f2t, f2t, f2t)
    return jnp.moveaxis(out[:, :, :h, :w], 1, 3)


def _corr_fwd(f1, f2, search_range, interpret):
    return correlation_pallas(f1, f2, search_range, interpret), (f1, f2)


def _corr_bwd(search_range, interpret, res, g):
    from .flow_ops import correlation

    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: correlation(a, b, search_range), f1, f2)
    return vjp(g)


correlation_pallas.defvjp(_corr_fwd, _corr_bwd)
