"""Stereo visual odometry: batched feature tracking + RANSAC + Gauss-Newton.

The TPU-native replacement for libviso2 (SURVEY.md §2.3): where viso2 runs
SSE-optimized sparse matching and sequential RANSAC on the CPU
(scene_flow_constructor.cpp:230-244 consumes ``process()``/``getMotion()``),
this module runs the whole estimate as fixed-shape JAX:

* Harris corners on the previous left image with max-pool NMS and top-K
  selection (the analog of viso2's bucketed feature selection,
  odometry_params.h:15-51);
* pyramidal Lucas-Kanade tracking into the current left image (replacing
  viso2's circular patch matching) — vmapped over features;
* 3D lift from the previous disparity (z = f*B/d, the same back-projection
  the scene-flow stage uses);
* RANSAC over vmapped 3-point Gauss-Newton pose hypotheses minimizing
  reprojection error, then a final Gauss-Newton refinement on all inliers —
  fixed hypothesis/iteration counts, no data-dependent control flow.

Returns the camera motion M with p_now = M @ p_prev — the convention the
reference assigns to ``transform_prev2now_`` (scene_flow_constructor.cpp:
248-249) — plus a success flag mirroring the reference's per-stage soft-fail
(:251-255).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import EgoMotionConfig
from .ops import geometry
from .types import CameraModel, DisparityImage


def _box_sum(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Box-window sum via a 2D summed-area table, same-padded."""
    pad = size // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad)))
    c = jnp.cumsum(jnp.cumsum(xp, axis=0), axis=1)
    c = jnp.pad(c, ((1, 0), (1, 0)))
    h, w = x.shape
    return (
        c[size : size + h, size : size + w]
        - c[:h, size : size + w]
        - c[size : size + h, :w]
        + c[:h, :w]
    )


def harris_response(img: jnp.ndarray, window: int = 5, k: float = 0.04):
    """Harris corner response from central-difference gradients.

    The roll-based differences wrap around the image edges; the wrapped
    first/last row/column would otherwise fabricate large gradients (bright
    right edge vs dark left edge) that _box_sum spreads ``window//2`` px
    inward — inside the dense mode's 2 px selection border, letting
    textureless border pixels outrank real corners in their bucket. Zero
    the undefined border gradients instead."""
    ix = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) * 0.5
    iy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) * 0.5
    ix = ix.at[:, 0].set(0.0).at[:, -1].set(0.0)
    iy = iy.at[0, :].set(0.0).at[-1, :].set(0.0)
    sxx = _box_sum(ix * ix, window)
    syy = _box_sum(iy * iy, window)
    sxy = _box_sum(ix * iy, window)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep only local maxima within a (2r+1)^2 window."""
    size = 2 * radius + 1
    maxed = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        (size, size),
        (1, 1),
        "SAME",
    )
    return scores == maxed


def select_features(
    img: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: EgoMotionConfig,
    border: int | None = None,
):
    """Bucketed top-K Harris corners with NMS.

    Features are capped per spatial bucket (viso2-style bucketing,
    odometry_params.h:26-29) so a corner-dense moving object cannot dominate
    the feature set and hijack the RANSAC consensus; the static background,
    covering most buckets, outvotes it.

    ``border``: exclusion margin in px; defaults to the LK patch reach
    (the widest pyramid level's window). Dense-flow callers pass a small
    margin instead — they never run LK, and the periphery carries the
    parallax that best constrains translation.

    Returns ((K, 2) f32 (u, v) positions, (K,) bool validity).
    """
    h, w = img.shape
    scores = harris_response(img)
    keep = _nms(scores, cfg.nms_radius) & valid & (scores > 0)
    if border is None:
        border = cfg.lk_window * (2 ** (cfg.lk_pyramid_levels - 1)) + 2
    u, v = geometry.pixel_grid(h, w)
    inside = (
        (u >= border) & (u < w - border) & (v >= border) & (v < h - border)
    )
    keep = keep & inside
    masked = jnp.where(keep, scores, -jnp.inf)

    nb = cfg.bucket_h * cfg.bucket_w
    per_bucket = max(1, cfg.max_features // nb)
    # Pad to bucket multiples, regroup into (buckets, cells), top-k each.
    ph = (-h) % cfg.bucket_h
    pw = (-w) % cfg.bucket_w
    padded = jnp.pad(masked, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    hp, wp = padded.shape
    bh, bw = hp // cfg.bucket_h, wp // cfg.bucket_w
    flat_idx = jnp.arange(hp * wp, dtype=jnp.int32).reshape(hp, wp)
    grouped = padded.reshape(cfg.bucket_h, bh, cfg.bucket_w, bw)
    grouped = grouped.transpose(0, 2, 1, 3).reshape(nb, bh * bw)
    gidx = flat_idx.reshape(cfg.bucket_h, bh, cfg.bucket_w, bw)
    gidx = gidx.transpose(0, 2, 1, 3).reshape(nb, bh * bw)
    bvals, bpos = jax.lax.top_k(grouped, per_bucket)  # (nb, per_bucket)
    bidx = jnp.take_along_axis(gidx, bpos, axis=1)
    # Global top-K over the bucketed candidates.
    cand_vals = bvals.reshape(-1)
    cand_idx = bidx.reshape(-1)
    k = min(cfg.max_features, cand_vals.shape[0])
    vals, pos = jax.lax.top_k(cand_vals, k)
    idx = cand_idx[pos]
    if k < cfg.max_features:
        pad_n = cfg.max_features - k
        vals = jnp.concatenate([vals, jnp.full((pad_n,), -jnp.inf)])
        idx = jnp.concatenate([idx, jnp.zeros((pad_n,), jnp.int32)])
    feat_valid = jnp.isfinite(vals)
    fu = (idx % wp).astype(jnp.float32)
    fv = (idx // wp).astype(jnp.float32)
    return jnp.stack([fu, fv], axis=1), feat_valid


def build_pyramid(img: jnp.ndarray, levels: int):
    """Average-pooled image pyramid, finest first."""
    pyr = [img]
    for _ in range(levels - 1):
        cur = pyr[-1]
        h2, w2 = cur.shape[0] // 2 * 2, cur.shape[1] // 2 * 2
        ds = cur[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
        pyr.append(ds)
    return pyr


def _lk_patch_track(prev_img, now_img, pt_prev, guess, half: int, iters: int):
    """Single-level LK: refine ``guess`` displacement of a (2h+1)^2 patch."""
    size = 2 * half + 1
    dy, dx = jnp.mgrid[-half : half + 1, -half : half + 1]
    offs = jnp.stack([dx, dy], axis=-1).reshape(-1, 2).astype(jnp.float32)
    coords0 = pt_prev[None, :] + offs  # (P, 2) in prev image

    template = geometry.bilinear_sample(prev_img, coords0)
    # Template gradients via central differences on the sampled patch grid.
    gx = (
        geometry.bilinear_sample(prev_img, coords0 + jnp.array([1.0, 0.0]))
        - geometry.bilinear_sample(prev_img, coords0 - jnp.array([1.0, 0.0]))
    ) * 0.5
    gy = (
        geometry.bilinear_sample(prev_img, coords0 + jnp.array([0.0, 1.0]))
        - geometry.bilinear_sample(prev_img, coords0 - jnp.array([0.0, 1.0]))
    ) * 0.5
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    inv_ok = jnp.abs(det) > 1e-6
    safe_det = jnp.where(inv_ok, det, 1.0)
    h_inv = (
        jnp.array([[gyy, -gxy], [-gxy, gxx]], jnp.float32) / safe_det
    )

    def body(_, d):
        cur = geometry.bilinear_sample(now_img, coords0 + d[None, :])
        err = cur - template
        b = jnp.array([jnp.sum(err * gx), jnp.sum(err * gy)], jnp.float32)
        step = h_inv @ b
        return d - step

    disp = jax.lax.fori_loop(0, iters, body, guess)
    disp = jnp.where(inv_ok, disp, guess)
    return disp


def lk_track(
    prev_img: jnp.ndarray,
    now_img: jnp.ndarray,
    pts: jnp.ndarray,
    cfg: EgoMotionConfig,
):
    """Pyramidal LK: track (K, 2) points prev -> now.

    Returns ((K, 2) tracked positions, (K,) bool tracked-in-bounds).
    """
    levels = cfg.lk_pyramid_levels
    pyr_prev = build_pyramid(prev_img, levels)
    pyr_now = build_pyramid(now_img, levels)

    disp = jnp.zeros_like(pts)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        track_lvl = jax.vmap(
            lambda p, d: _lk_patch_track(
                pyr_prev[lvl], pyr_now[lvl], p, d, cfg.lk_window, cfg.lk_iters
            )
        )
        disp = track_lvl(pts / scale, disp) * (2.0 if lvl > 0 else 1.0)
    tracked = pts + disp
    h, w = prev_img.shape
    ok = (
        (tracked[:, 0] >= 0)
        & (tracked[:, 0] <= w - 1)
        & (tracked[:, 1] >= 0)
        & (tracked[:, 1] <= h - 1)
    )
    return tracked, ok


def _reprojection_residuals(tf, pts3d, obs_uv, cam: CameraModel):
    """(N, 2) residuals pi(M @ X) - x and (N,) positive-depth mask."""
    p = geometry.transform_points(tf, pts3d)
    z = p[..., 2]
    ok = z > 0.1
    safe_z = jnp.where(ok, z, 1.0)
    u = cam.fx * p[..., 0] / safe_z + cam.cx
    v = cam.fy * p[..., 1] / safe_z + cam.cy
    res = jnp.stack([u, v], axis=-1) - obs_uv
    return res, p, ok


def _chol_solve6(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b for a damped-SPD 6x6 system with an unrolled Cholesky.

    ``jnp.linalg.solve`` lowers to an LU custom-call on TPU
    (LuDecompositionBlock) that cannot fuse and costs ~0.1 ms per call
    site inside the RANSAC/GN loops (~1 ms/frame total in the op trace);
    the unrolled form is pure elementwise math that XLA fuses into the
    surrounding Gauss-Newton fusion. Batched over leading dims.
    """
    n = 6
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        s = a[..., i, i]
        for k in range(i):
            s = s - l[i][k] * l[i][k]
        l[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for j in range(i + 1, n):
            s = a[..., j, i]
            for k in range(i):
                s = s - l[j][k] * l[i][k]
            l[j][i] = s / l[i][i]
    # Forward substitution L y = b.
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x, axis=-1)


def _gn_step(tf, pts3d, obs_uv, weights, cam: CameraModel, damping=1e-4):
    """One damped Gauss-Newton update on the 6-dof left-increment twist."""
    res, p, ok = _reprojection_residuals(tf, pts3d, obs_uv, cam)
    w = weights * ok
    z = jnp.where(ok, p[..., 2], 1.0)
    x, y = p[..., 0], p[..., 1]
    inv_z = 1.0 / z
    # du/dp, dv/dp (pinhole), then dp/dxi = [-[p]x | I].
    du_dp = jnp.stack(
        [cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * x * inv_z * inv_z], -1
    )
    dv_dp = jnp.stack(
        [jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * y * inv_z * inv_z], -1
    )
    zeros = jnp.zeros_like(z)
    dp_dxi = jnp.stack(
        [
            jnp.stack([zeros, p[..., 2], -p[..., 1], jnp.ones_like(z), zeros, zeros], -1),
            jnp.stack([-p[..., 2], zeros, p[..., 0], zeros, jnp.ones_like(z), zeros], -1),
            jnp.stack([p[..., 1], -p[..., 0], zeros, zeros, zeros, jnp.ones_like(z)], -1),
        ],
        axis=-2,
    )  # (N, 3, 6)
    j_u = jnp.einsum("ni,nij->nj", du_dp, dp_dxi)  # (N, 6)
    j_v = jnp.einsum("ni,nij->nj", dv_dp, dp_dxi)
    jac = jnp.stack([j_u, j_v], axis=1)  # (N, 2, 6)
    r = res  # (N, 2)
    jtj = jnp.einsum("nri,nrj,n->ij", jac, jac, w)
    jtr = jnp.einsum("nri,nr,n->i", jac, r, w)
    jtj = jtj + damping * jnp.eye(6, dtype=jnp.float32)
    xi = -_chol_solve6(jtj, jtr)
    return geometry.se3_exp(xi) @ tf


def _solve_pose(pts3d, obs_uv, weights, cam, iters: int):
    def body(_, tf):
        return _gn_step(tf, pts3d, obs_uv, weights, cam)

    return jax.lax.fori_loop(0, iters, body, jnp.eye(4, dtype=jnp.float32))


@partial(jax.jit, static_argnames=("cfg",))
def estimate_motion(
    prev_left: jnp.ndarray,
    now_left: jnp.ndarray,
    disparity_prev: DisparityImage,
    cam: CameraModel,
    key: jnp.ndarray,
    cfg: EgoMotionConfig = EgoMotionConfig(),
    dense_flow: jnp.ndarray | None = None,
):
    """Estimate the camera motion M (p_now = M @ p_prev) between two frames.

    Mirrors the contract of estimateCameraMotion
    (scene_flow_constructor.cpp:214-256): on failure the caller must treat
    the frame's velocities as unavailable.

    Correspondences come from pyramidal LK tracking (self-contained mode,
    viso2-like), or — when ``dense_flow`` (H, W, 2) is provided — from one
    bilinear sample of that field at each feature position. The flow field
    is PREV-frame indexed: now = prev + flow(prev), the PWC training
    convention (train/data_synth.py ground truth; flow_ops.warp contract),
    so a prev feature's correspondence is a direct lookup. The dense mode
    is what the fused pipeline uses: the PWC flow is already computed for
    the scene-flow stage, and per-feature LK's scattered patch gathers are
    the slowest part of this module on TPU.

    Returns (motion 4x4 f32, success bool, inlier_count int32).
    """
    # 1. Features on the previous frame where the previous disparity is
    # valid. Dense-flow mode needs only a bilinear-sampling margin, not the
    # 30 px LK patch reach (~15-20% of a KITTI frame, and the periphery is
    # where forward-motion parallax constrains translation most).
    depth_prev = geometry.disparity_to_depth(disparity_prev)
    pts, feat_valid = select_features(
        prev_left,
        jnp.isfinite(depth_prev),
        cfg,
        border=2 if dense_flow is not None else None,
    )

    # 2. 3D lift at feature pixels (nearest-pixel disparity, like viso2).
    ui = jnp.round(pts[:, 0]).astype(jnp.int32)
    vi = jnp.round(pts[:, 1]).astype(jnp.int32)
    z, zin = geometry.gather_pixels(depth_prev, ui, vi)
    feat_valid = feat_valid & zin & jnp.isfinite(z)
    z = jnp.where(jnp.isfinite(z), z, 1.0)
    x3 = (pts[:, 0] - cam.cx) / cam.fx * z
    y3 = (pts[:, 1] - cam.cy) / cam.fy * z
    pts3d = jnp.stack([x3, y3, z], axis=1)
    feat_valid_pre_track = feat_valid

    # 3. Track into the current frame.
    if dense_flow is not None:
        # Prev-indexed field: the correspondence is flow AT the feature.
        # (An earlier revision treated the field as now-indexed and ran a
        # fixed-point inversion — solving the wrong equation overshoots by
        # ~grad(flow)*flow near motion/depth boundaries, at the scale of
        # inlier_threshold_px.)
        h, w = prev_left.shape
        f = geometry.bilinear_sample(dense_flow, pts)
        tracked = pts + f
        flow_finite = jnp.isfinite(f).all(axis=-1)
        track_ok = (
            flow_finite
            & (tracked[:, 0] >= 0)
            & (tracked[:, 0] <= w - 1)
            & (tracked[:, 1] >= 0)
            & (tracked[:, 1] <= h - 1)
        )
    else:
        tracked, track_ok = lk_track(prev_left, now_left, pts, cfg)
    feat_valid = feat_valid & track_ok

    motion, success, count = _ransac_gn_solve(
        pts3d, tracked, feat_valid, cam, key, cfg
    )

    # Redundancy fallback (reference parity: libviso2 was an INDEPENDENT
    # matcher, scene_flow_constructor.cpp:230 — its failures never
    # correlated with the PWC flow's). If the dense-flow correspondences
    # leave the RANSAC with a low inlier fraction — a corrupted or
    # hallucinated flow field — re-derive the motion from pyramidal-LK
    # tracks of the same features. lax.cond executes only the taken
    # branch, so a healthy flow field never pays for LK.
    if dense_flow is not None and cfg.lk_fallback:
        # feat_valid here includes track_ok from the dense lookup; the LK
        # path must restart from the pre-tracking validity.
        feat_valid_base = feat_valid_pre_track

        def lk_path(_):
            # Features were selected with the dense-mode border (2 px);
            # drop those whose LK patch reach crosses the frame edge —
            # truncated patches track with a systematic bias.
            h_, w_ = prev_left.shape
            reach = cfg.lk_window * (2 ** (cfg.lk_pyramid_levels - 1)) + 2
            in_reach = (
                (pts[:, 0] >= reach) & (pts[:, 0] < w_ - reach)
                & (pts[:, 1] >= reach) & (pts[:, 1] < h_ - reach)
            )
            tracked_l, ok_l = lk_track(prev_left, now_left, pts, cfg)
            return _ransac_gn_solve(
                pts3d, tracked_l, feat_valid_base & in_reach & ok_l,
                cam, key, cfg,
            )

        n_valid = jnp.maximum(feat_valid.sum(), 1)
        low_inliers = count < cfg.lk_fallback_frac * n_valid
        motion, success, count = jax.lax.cond(
            low_inliers,
            lk_path,
            lambda _: (motion, success, count),
            operand=None,
        )
    return motion, success, count


def _ransac_gn_solve(pts3d, tracked, feat_valid, cam, key, cfg):
    """RANSAC (vmapped 3-point Gauss-Newton hypotheses) + two-pass inlier
    refinement over fixed-size correspondence sets. Returns
    (motion 4x4 f32, success bool, inlier_count int32)."""
    n = pts3d.shape[0]
    weights_all = feat_valid.astype(jnp.float32)

    def one_hypothesis(k):
        # Weighted sampling without replacement over valid features.
        idx = jax.random.choice(
            k, n, shape=(cfg.ransac_sample,), replace=False,
            p=weights_all / jnp.maximum(weights_all.sum(), 1.0),
        )
        tf = _solve_pose(
            pts3d[idx], tracked[idx], jnp.ones((cfg.ransac_sample,)), cam,
            cfg.gn_iters_hypothesis,
        )
        res, _, ok = _reprojection_residuals(tf, pts3d, tracked, cam)
        err = jnp.linalg.norm(res, axis=-1)
        inlier = feat_valid & ok & (err < cfg.inlier_threshold_px)
        return tf, inlier, _msac_score(err, feat_valid & ok, cfg)

    keys = jax.random.split(key, cfg.ransac_hypotheses)
    tfs, inliers, scores = jax.vmap(one_hypothesis)(keys)

    # Refine the TOP-K hypotheses (not just argmax) and pick by MSAC
    # score, NOT by inlier count. Measured failure (rotating_cam scene,
    # GT-flow + GT-disparity oracle, 2026-08-21): on a fronto-planar
    # background a yaw error θ traded against lateral translation θ·z
    # keeps MORE 2 px inliers than the TRUE pose (276 vs 269 of 300 —
    # the traded pose accommodates a few moving-object/boundary tracks
    # while still holding the central background inside the gate) but
    # collapses at 1 px (159 vs 269). Plain count selection therefore
    # picks the wrong optimum with a ~1.3 deg / 33 cm error; the MSAC
    # score Σ min(err², th²) prefers the tight fit by a wide margin.
    # Single-candidate refinement additionally locks whatever basin the
    # best hypothesis was in; refining several diversifies the basins.
    # Clamp to >= 1: top_k(k=0) would hand argmin an empty array and fail
    # at trace time with an opaque error.
    k_cand = max(1, min(cfg.refine_candidates, cfg.ransac_hypotheses))
    neg_scores, top_idx = jax.lax.top_k(-scores, k_cand)

    def refine_one(idx):
        # Two-pass refinement: fit on the hypothesis' inliers, re-gate at
        # half threshold (drops tracks corrupted near moving-object
        # boundaries that slipped inside the RANSAC gate), refit.
        tf = _solve_pose(
            pts3d, tracked, inliers[idx].astype(jnp.float32), cam,
            cfg.gn_iters_refine,
        )
        res, _, ok = _reprojection_residuals(tf, pts3d, tracked, cam)
        err = jnp.linalg.norm(res, axis=-1)
        tight = feat_valid & ok & (err < 0.5 * cfg.inlier_threshold_px)
        tf = _solve_pose(
            pts3d, tracked, tight.astype(jnp.float32), cam,
            cfg.gn_iters_refine,
        )
        res, _, ok = _reprojection_residuals(tf, pts3d, tracked, cam)
        err = jnp.linalg.norm(res, axis=-1)
        fin = feat_valid & ok & (err < cfg.inlier_threshold_px)
        return tf, fin.sum().astype(jnp.int32), _msac_score(
            err, feat_valid & ok, cfg
        )

    tfs_r, counts_r, scores_r = jax.vmap(refine_one)(top_idx)
    best_r = jnp.argmin(scores_r)
    tf = tfs_r[best_r]
    count = counts_r[best_r]
    success = count >= cfg.min_inliers
    motion = jnp.where(success, tf, jnp.eye(4, dtype=jnp.float32))
    return motion, success, count


def _msac_score(err, valid, cfg):
    """MSAC objective: truncated squared reprojection error over valid
    features (lower = better). Unlike the inlier count it is sensitive to
    HOW WELL inliers fit, which disambiguates poses whose inlier sets
    differ by a few features but whose residual distributions differ by
    4x (see the planar yaw/translation note in _ransac_gn_solve)."""
    th2 = cfg.inlier_threshold_px**2
    return jnp.sum(jnp.where(valid, jnp.minimum(err**2, th2), th2))
