"""Substage timing of the clusterer on the real chip (chained slope).

Reconstructs cluster_scene_flow's internals stage by stage so the 2.96 ms
in-context cost can be attributed: CC kernel vs sorted-run root selection
vs compact-id passes vs AABB reductions vs median bisection.

Usage: python scripts/profile_clusterer.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from moving_object_detector_tpu.config import ClustererConfig
from moving_object_detector_tpu.clusterer import cluster_scene_flow
from moving_object_detector_tpu.ops.clustering_pallas import (
    connected_components_pallas,
)
from moving_object_detector_tpu.types import SceneFlowCloud
from moving_object_detector_tpu.utils.profiling import chain_slope_ms, consume

H, W = 376, 1242
N = H * W
cfg = ClustererConfig()
cap = cfg.max_objects

# Busy scene: a few blobs of dynamic pixels over a static background.
rng = np.random.default_rng(0)
pts = rng.uniform(-5, 5, (H, W, 3)).astype(np.float32)
pts[..., 2] = rng.uniform(5, 30, (H, W))
vel = np.zeros((H, W, 3), np.float32)
for cy, cx, r in ((100, 300, 45), (200, 700, 60), (280, 1000, 38)):
    yy, xx = np.mgrid[0:H, 0:W]
    m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    vel[m] = rng.uniform(0.5, 2.0, 3).astype(np.float32)
    pts[m, 2] = 10.0 + 0.01 * rng.standard_normal(m.sum()).astype(np.float32)
cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))

depth = cloud.points[..., 2]
dspeed = jnp.float32(cfg.dynamic_speed)
ddiff = jnp.float32(cfg.depth_diff)


def dyn_of(v):
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1))
    return vn >= dspeed, vn


def t(name, step, init, n1=20, n2=120):
    dt = chain_slope_ms(step, init, n1, n2)
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def consume_all(v, out):
    # consume() folds in only the FIRST leaf; fold every leaf so no branch
    # of the clusterer (objects vs label image) is dead-code-eliminated.
    for leaf in jax.tree_util.tree_leaves(out):
        v = consume(v, leaf)
    return v


t("FULL cluster_scene_flow",
  lambda v: consume_all(v, cluster_scene_flow(
      SceneFlowCloud(points=cloud.points, velocity=v), cfg)), cloud.velocity)

def cc_only(v):
    dynamic, _ = dyn_of(v)
    labels = connected_components_pallas(
        dynamic, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
        max_iters=cfg.max_cc_iters)
    return consume(v, labels)

t("CC kernel only", cc_only, cloud.velocity)

# A/B the distance-doubling span cap (ClustererConfig.cc_scan_span): the
# busy objects here are <= 120 px wide, so caps >= 128 are
# iteration-neutral while cutting per-iteration rolls.
for _span in (256, 128, 64):
    def cc_span(v, _span=_span):
        dynamic, _ = dyn_of(v)
        labels = connected_components_pallas(
            dynamic, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
            max_iters=cfg.max_cc_iters, max_span=_span)
        return consume(v, labels)

    _dyn1, _ = dyn_of(cloud.velocity)
    _, _it = connected_components_pallas(
        _dyn1, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
        max_iters=cfg.max_cc_iters, max_span=_span, return_iters=True)
    t(f"CC kernel span<={_span} ({int(_it)} iters)", cc_span,
      cloud.velocity)

# Fixpoint convergence on this busy frame (PLAN_NEXT: is max_iters=64 a
# gross overbound, and is the per-iteration cost or the count the lever?).
_dyn0, _ = dyn_of(cloud.velocity)
_, _n_iters = connected_components_pallas(
    _dyn0, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
    max_iters=cfg.max_cc_iters, return_iters=True)
print(f"{'CC fixpoint iterations (busy frame)':44s} {int(_n_iters):8d}",
      flush=True)

def through_roots(v):
    dynamic, _ = dyn_of(v)
    labels = connected_components_pallas(
        dynamic, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
        max_iters=cfg.max_cc_iters)
    flat = labels.reshape(-1)
    pos = jnp.arange(N, dtype=jnp.int32)
    s = jnp.sort(flat)
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    startpos = jnp.where(start, pos, N)
    rcm = jax.lax.associative_scan(jnp.minimum, startpos, reverse=True)
    nxt = jnp.concatenate([rcm[1:], jnp.full((1,), N, jnp.int32)])
    size = nxt - pos
    big = start & (size >= 2500) & (s < N)
    rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    roots = jnp.stack([jnp.min(jnp.where(big & (rank == c), s, N))
                       for c in range(cap)])
    return consume(v, roots)

t("CC + sort/run root selection", through_roots, cloud.velocity)

def cid_of(v):
    dynamic, _ = dyn_of(v)
    labels = connected_components_pallas(
        dynamic, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
        max_iters=cfg.max_cc_iters)
    flat = labels.reshape(-1)
    pos = jnp.arange(N, dtype=jnp.int32)
    s = jnp.sort(flat)
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    startpos = jnp.where(start, pos, N)
    rcm = jax.lax.associative_scan(jnp.minimum, startpos, reverse=True)
    nxt = jnp.concatenate([rcm[1:], jnp.full((1,), N, jnp.int32)])
    size = nxt - pos
    big = start & (size >= 2500) & (s < N)
    rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    roots = jnp.stack([jnp.min(jnp.where(big & (rank == c), s, N))
                       for c in range(cap)])
    cid = jnp.full((N,), cap, jnp.int32)
    for c in range(cap):
        cid = jnp.where((roots[c] < N) & (flat == roots[c]),
                        jnp.int32(c), cid)
    return cid, roots


def through_aabb(v):
    cid, roots = cid_of(v)
    pts3 = pts.reshape(N, 3)
    pts3 = jnp.asarray(pts3)
    outs = []
    for c in range(cap):
        in_c = (cid == c)[:, None]
        outs.append(jnp.min(jnp.where(in_c, pts3, jnp.inf), axis=0))
        outs.append(jnp.max(jnp.where(in_c, pts3, -jnp.inf), axis=0))
        outs.append(jnp.sum(in_c[:, 0].astype(jnp.int32)))
    r = v
    for o in outs:
        r = consume(r, o)
    return consume(r, cid)


def through_median(v):
    cid, roots = cid_of(v)
    _, vn = dyn_of(v)
    flat_vnorm = vn.reshape(-1)
    cols = jnp.arange(cap, dtype=jnp.int32)[None, :]
    masked = jnp.where(cid[:, None] == cols, flat_vnorm[:, None], -jnp.inf)
    csize = jnp.stack([jnp.sum((cid == c).astype(jnp.int32))
                       for c in range(cap)])
    target = csize // 2 + 1
    vmax = jnp.max(jnp.where(jnp.isfinite(masked), masked, 0.0), axis=0)
    lo = jnp.zeros((cap,), jnp.float32)
    hi = vmax + 1.0

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(masked >= mid[None, :], axis=0)
        ok = cnt >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 22, bisect, (lo, hi))
    eps = lo * 1e-5 + 1e-7
    sel = jnp.where(masked >= (lo - eps)[None, :], masked, jnp.inf)
    median_pixel = jnp.argmin(sel, axis=0)
    mv = v.reshape(N, 3)[median_pixel]
    return consume(consume(v, mv), cid)


def through_cid(v):
    dynamic, _ = dyn_of(v)
    labels = connected_components_pallas(
        dynamic, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
        max_iters=cfg.max_cc_iters)
    flat = labels.reshape(-1)
    pos = jnp.arange(N, dtype=jnp.int32)
    s = jnp.sort(flat)
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    startpos = jnp.where(start, pos, N)
    rcm = jax.lax.associative_scan(jnp.minimum, startpos, reverse=True)
    nxt = jnp.concatenate([rcm[1:], jnp.full((1,), N, jnp.int32)])
    size = nxt - pos
    big = start & (size >= 2500) & (s < N)
    rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    roots = jnp.stack([jnp.min(jnp.where(big & (rank == c), s, N))
                       for c in range(cap)])
    cid = jnp.full((N,), cap, jnp.int32)
    for c in range(cap):
        cid = jnp.where((roots[c] < N) & (flat == roots[c]),
                        jnp.int32(c), cid)
    return consume(v, cid)

t("... + compact-id passes", through_cid, cloud.velocity)
t("cid + AABB reductions", through_aabb, cloud.velocity)
t("cid + median bisection", through_median, cloud.velocity)


# --- attribute the root-selection stage itself: sort vs scans vs reduces ---

def labels_of(v):
    dynamic, _ = dyn_of(v)
    return connected_components_pallas(
        dynamic, depth, ddiff, neighbor_distance=cfg.neighbor_distance,
        max_iters=cfg.max_cc_iters).reshape(-1)


def sort_only(v):
    return consume(v, jnp.sort(labels_of(v)))

t("CC + sort only", sort_only, cloud.velocity)


def sort_scans(v):
    s = jnp.sort(labels_of(v))
    pos = jnp.arange(N, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    startpos = jnp.where(start, pos, N)
    rcm = jax.lax.associative_scan(jnp.minimum, startpos, reverse=True)
    nxt = jnp.concatenate([rcm[1:], jnp.full((1,), N, jnp.int32)])
    size = nxt - pos
    big = start & (size >= 2500) & (s < N)
    rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    return consume(consume(v, rank), big)

t("CC + sort + scans (no root reduces)", sort_scans, cloud.velocity)


def through_roots_v2(v):
    """New scan-free root selection: shift-compare run test + top_k."""
    flat = labels_of(v)
    posi = jnp.arange(N, dtype=jnp.int32)
    s = jnp.sort(flat)
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    s_pad = jnp.concatenate([s, jnp.full((N,), jnp.int32(N))])
    tail = jax.lax.dynamic_slice(s_pad, (jnp.int32(2500 - 1),), (N,))
    big = start & (s < N) & (tail == s)
    neg = jnp.where(big, -posi, jnp.int32(-(N + 1)))
    topv, _ = jax.lax.top_k(neg, cap)
    rpos = -topv
    roots = jnp.where(rpos < N, jnp.take(s, jnp.minimum(rpos, N - 1)),
                      jnp.int32(N))
    return consume(v, roots)

t("CC + v2 root selection (shift+top_k)", through_roots_v2, cloud.velocity)
