"""Semi-global matching stereo, TPU-native.

Replaces sgm_gpu_ros (SURVEY.md §2.3): the CUDA kernel pipeline
(census transform -> Hamming cost volume -> multi-directional path
aggregation -> winner-take-all with uniqueness/LR checks) consumed by
``computeDisparity`` at scene_flow_constructor.cpp:267-268, redesigned for
XLA/TPU:

* the disparity axis (D = 128) is the innermost/lane dimension, so every
  per-pixel DP update is a full-width VPU op;
* the four path directions are ``lax.scan`` recurrences over image rows or
  columns, carrying one (H, D) / (W, D) slice — the XLA-structured form of
  SGM's sequential dynamic programming;
* winner-take-all + parabolic subpixel + left-right consistency are one
  fused elementwise pass.

The output contract matches stereo_msgs/DisparityImage as the reference
consumes it (disparity_image_processor.cpp:25-27,41-42): raw disparities
with f/T/min/max metadata; invalid pixels carry -1 which fails the
``min_disparity`` gate downstream.

A Pallas kernel specialization of the aggregation loop lives in
``ops/sgm_pallas.py``; this module is the portable reference implementation
and the correctness oracle for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SGMConfig
from ..types import DisparityImage, StereoModel


def census_transform(img: jnp.ndarray, window=(5, 5)) -> jnp.ndarray:
    """Census transform: per pixel, a bit per window neighbor that is darker
    than the center. (H, W) -> (H, W) int32 (window must have <= 32 cells)."""
    wh, ww = window
    assert wh % 2 == 1 and ww % 2 == 1
    assert wh * ww - 1 <= 32, "census signature must fit int32"
    rh, rw = wh // 2, ww // 2
    pad = jnp.pad(img, ((rh, rh), (rw, rw)), constant_values=jnp.inf)
    h, w = img.shape
    bits = []
    for dy in range(-rh, rh + 1):
        for dx in range(-rw, rw + 1):
            if dy == 0 and dx == 0:
                continue
            neigh = pad[rh + dy : rh + dy + h, rw + dx : rw + dx + w]
            bits.append(neigh < img)
    out = jnp.zeros(img.shape, jnp.int32)
    for i, b in enumerate(bits):
        out = out | (b.astype(jnp.int32) << i)
    return out


def hamming_cost_volume(
    census_l: jnp.ndarray, census_r: jnp.ndarray, max_disparity: int
) -> jnp.ndarray:
    """(H, W, D) f32 matching cost: popcount(census_l(x) ^ census_r(x - d)).

    Out-of-image (x < d) candidates get the maximum census distance so they
    never win WTA but stay finite for the DP recurrences.
    """
    h, w = census_l.shape
    slices = []
    max_cost = 32.0
    for d in range(max_disparity):
        if d == 0:
            shifted = census_r
        else:
            shifted = jnp.pad(census_r, ((0, 0), (d, 0)))[:, :w]
        ham = jax.lax.population_count(census_l ^ shifted).astype(jnp.float32)
        if d > 0:
            col = jnp.arange(w) < d
            ham = jnp.where(col[None, :], max_cost, ham)
        slices.append(ham)
    return jnp.stack(slices, axis=-1)


def _dp_step(carry, cost_slice, p1, p2):
    """One SGM DP update: carry and cost_slice are (..., D)."""
    prev_min = jnp.min(carry, axis=-1, keepdims=True)
    up = jnp.concatenate(
        [jnp.full(carry.shape[:-1] + (1,), jnp.inf, carry.dtype), carry[..., :-1]],
        axis=-1,
    )
    down = jnp.concatenate(
        [carry[..., 1:], jnp.full(carry.shape[:-1] + (1,), jnp.inf, carry.dtype)],
        axis=-1,
    )
    best = jnp.minimum(
        jnp.minimum(carry, prev_min + p2),
        jnp.minimum(up, down) + p1,
    )
    return cost_slice + best - prev_min


def aggregate_path(cost: jnp.ndarray, axis: int, reverse: bool, p1, p2):
    """Aggregate along one direction. cost: (H, W, D); axis 1 = horizontal
    scan (over x), axis 0 = vertical scan (over y)."""
    # Move the scan axis to the front for lax.scan.
    vol = jnp.moveaxis(cost, axis, 0)  # (S, R, D)

    def step(carry, c):
        out = _dp_step(carry, c, p1, p2)
        return out, out

    init = jnp.zeros(vol.shape[1:], vol.dtype)
    _, agg = jax.lax.scan(step, init, vol, reverse=reverse)
    return jnp.moveaxis(agg, 0, axis)


def _subpixel(total: jnp.ndarray, best: jnp.ndarray) -> jnp.ndarray:
    """Parabola fit around the WTA disparity. total (H, W, D), best (H, W)."""
    d = total.shape[-1]
    bm1 = jnp.clip(best - 1, 0, d - 1)
    bp1 = jnp.clip(best + 1, 0, d - 1)
    c0 = jnp.take_along_axis(total, best[..., None], axis=-1)[..., 0]
    cm = jnp.take_along_axis(total, bm1[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(total, bp1[..., None], axis=-1)[..., 0]
    denom = cm - 2.0 * c0 + cp
    offset = jnp.where(
        denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0
    )
    interior = (best > 0) & (best < d - 1)
    return best.astype(jnp.float32) + jnp.where(interior, offset, 0.0)


def aggregate_cost_volume(cost: jnp.ndarray, cfg: SGMConfig) -> jnp.ndarray:
    """Sum of directional aggregations (4 paths: 2 horizontal + 2 vertical)."""
    p1 = jnp.float32(cfg.p1)
    p2 = jnp.float32(cfg.p2)
    total = aggregate_path(cost, axis=1, reverse=False, p1=p1, p2=p2)
    total = total + aggregate_path(cost, axis=1, reverse=True, p1=p1, p2=p2)
    total = total + aggregate_path(cost, axis=0, reverse=False, p1=p1, p2=p2)
    total = total + aggregate_path(cost, axis=0, reverse=True, p1=p1, p2=p2)
    return total


def wta_disparity(total: jnp.ndarray, cfg: SGMConfig) -> jnp.ndarray:
    """Winner-take-all + subpixel + left-right consistency. Returns (H, W)
    f32 disparity with -1 for invalid pixels."""
    h, w, d = total.shape
    best = jnp.argmin(total, axis=-1).astype(jnp.int32)
    disp = _subpixel(total, best) if cfg.subpixel else best.astype(jnp.float32)

    valid = jnp.ones((h, w), bool)
    # No valid candidate at all when x < d for every d except d<=x; pixels
    # x = 0 can only have d = 0: treat border band as invalid-if-cost-max.
    if cfg.lr_check:
        # Right-view WTA from the same volume: cost_R(y, x, d) = cost_L(y, x+d, d).
        cols = jnp.arange(w)[None, :, None] + jnp.arange(d)[None, None, :]
        cols = jnp.clip(cols, 0, w - 1)
        right_vol = jnp.take_along_axis(
            total, jnp.broadcast_to(cols, (h, w, d)), axis=1
        )
        best_r = jnp.argmin(right_vol, axis=-1).astype(jnp.int32)
        # For each left pixel: the matching right pixel x - d_L.
        xr = jnp.round(jnp.arange(w)[None, :] - disp).astype(jnp.int32)
        xr_ok = xr >= 0
        xr_c = jnp.clip(xr, 0, w - 1)
        d_r = jnp.take_along_axis(best_r, xr_c, axis=1)
        consistent = jnp.abs(disp - d_r.astype(jnp.float32)) <= cfg.lr_max_diff
        valid = valid & xr_ok & consistent

    # Candidates beyond the image edge carry max cost; if the winner sits in
    # that region (x < best) the pixel has no true support.
    valid = valid & (jnp.arange(w)[None, :] >= best)
    return jnp.where(valid, disp, -1.0)


@partial(jax.jit, static_argnames=("cfg",))
def compute_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    stereo: StereoModel,
    cfg: SGMConfig = SGMConfig(),
) -> DisparityImage:
    """Full SGM stereo: (H, W) grayscale pair -> DisparityImage.

    The TPU equivalent of sgm_gpu::SgmGpu::computeDisparity
    (scene_flow_constructor.cpp:267-268), including the f/T/min/max metadata
    the downstream DisparityImageProcessor relies on.
    """
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    window = cfg.census_window
    if window[0] * window[1] - 1 > 32:
        window = (5, 5)
    cl = census_transform(left, window)
    cr = census_transform(right, window)
    cost = hamming_cost_volume(cl, cr, cfg.max_disparity)
    total = aggregate_cost_volume(cost, cfg)
    disp = wta_disparity(total, cfg)
    return DisparityImage.create(
        disp,
        f=stereo.cam.fx,
        t=stereo.baseline,
        min_disparity=0.0,
        max_disparity=float(cfg.max_disparity - 1),
    )
