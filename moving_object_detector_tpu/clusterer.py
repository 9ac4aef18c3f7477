"""Detection stage: dynamic-pixel clustering -> MovingObjects.

TPU-native rewrite of scene_flow_clusterer (clusterer_nodelet.cpp): the
dynamic map (:40-54), depth-gated connected components (ops/clustering.py),
small-cluster removal (:354-393), and per-cluster AABB + descending-norm
median velocity with re-gating (cluster2MovingObject :147-184) — all under
one jit with a fixed object capacity.

Cluster *numbering* intentionally differs from the reference's union-find
creation order (SURVEY.md §7 hard part (c)): here clusters are ordered by the
raster index of their first member pixel, which is deterministic and matches
the reference at the partition level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import ClustererConfig
from .ops.clustering import connected_components
from .types import MovingObjects, SceneFlowCloud


@partial(jax.jit, static_argnames=("config", "return_overflow"))
def cluster_scene_flow(
    cloud: SceneFlowCloud,
    config: ClustererConfig = ClustererConfig(),
    dynamic_speed: jnp.ndarray | None = None,
    depth_diff: jnp.ndarray | None = None,
    cluster_size: jnp.ndarray | None = None,
    neighbor_distance: jnp.ndarray | None = None,
    return_overflow: bool = False,
):
    """Cluster dynamic pixels into moving objects.

    Args:
      cloud: organized scene-flow cloud (NaN = invalid).
      config: static knobs (capacities, window); the two hot thresholds can be
        overridden per call without recompiling.

    Returns:
      (MovingObjects, label_image): fixed-capacity detections and the (H, W)
      int32 compact-cluster-id image (-1 background), the analog of
      ``~clusters_image`` (clusterer_nodelet.cpp:292-322). With
      ``return_overflow=True`` a third element counts the size-passing
      clusters DROPPED beyond ``config.max_objects`` — the observable
      form of this port's fixed-capacity deviation from the reference's
      unbounded per-cluster loops (clusterer_nodelet.cpp:354-393): 0
      means the frame fit, > 0 means raise max_objects.
    """
    dynamic_speed = (
        jnp.float32(config.dynamic_speed) if dynamic_speed is None else dynamic_speed
    )
    depth_diff = (
        jnp.float32(config.depth_diff) if depth_diff is None else depth_diff
    )
    cluster_size = (
        jnp.int32(config.cluster_size) if cluster_size is None else cluster_size
    )
    # Traced effective radius; config.neighbor_distance is the static
    # stencil bound (tunables.py: any runtime value <= it retunes hot).
    neighbor_distance = (
        jnp.int32(config.neighbor_distance)
        if neighbor_distance is None
        else neighbor_distance
    )

    h, w = cloud.points.shape[:2]
    n = h * w
    cap = config.max_objects

    # calculateDynamicMap (clusterer_nodelet.cpp:40-54): ||v|| >= threshold.
    # NaN velocity compares False -> static, as in the reference where NaN
    # norm fails the >= test.
    vel = cloud.velocity
    vnorm = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    dynamic = vnorm >= dynamic_speed

    # Quiet-frame early-out: with ZERO dynamic pixels the full path
    # provably yields the empty result (all labels = background sentinel
    # -> no runs -> every root slot invalid -> valid all False, outputs
    # zeroed, label image -1), so a lax.cond skips the CC fixpoint, the
    # 467k-element lexicographic sort and the stats pass (~1.5 ms at
    # KITTI res) and returns that constant directly. This is the common
    # case on real streams (no moving object in view) and mirrors the
    # reference, whose per-cluster loops simply have nothing to do on an
    # empty dynamic map (clusterer_nodelet.cpp:56-83). Under vmap the
    # cond degrades to computing both branches — the prior behavior.
    def _empty_branch(cloud, vel, vnorm, dynamic):
        objects = MovingObjects(
            id=jnp.full((cap,), -1, jnp.int32),
            center=jnp.zeros((cap, 3), jnp.float32),
            velocity=jnp.zeros((cap, 3), jnp.float32),
            bounding_box=jnp.zeros((cap, 3), jnp.float32),
            valid=jnp.zeros((cap,), bool),
        )
        return objects, jnp.full((h, w), -1, jnp.int32), jnp.int32(0)

    kwargs = dict(
        config=config,
        dynamic_speed=dynamic_speed,
        depth_diff=depth_diff,
        cluster_size=cluster_size,
        neighbor_distance=neighbor_distance,
    )
    # Dynamic-extent crop fast path (see ClustererConfig.cc_crop_h): run
    # the busy stage on a fixed-size window when all dynamic pixels fit.
    ch = min(config.cc_crop_h, h) if config.cc_crop_h > 0 else 0
    cw = min(config.cc_crop_w, w) if config.cc_crop_w > 0 else 0
    crop_on = ch > 0 and cw > 0 and (ch < h or cw < w)

    def _busy_branch(cloud, vel, vnorm, dynamic):
        def _full_branch(cloud, vel, vnorm, dynamic):
            return _cluster_dynamic(cloud, vel, vnorm, dynamic, **kwargs)[:3]

        if not crop_on:
            return _full_branch(cloud, vel, vnorm, dynamic)
        # Bounding box of the (non-empty, guaranteed by the outer cond)
        # dynamic set. No margin is needed: a window edge requires BOTH
        # endpoints dynamic (comparePoints, clusterer_nodelet.cpp:186-219),
        # so every edge lies inside the bbox.
        rows_any = jnp.any(dynamic, axis=1)
        cols_any = jnp.any(dynamic, axis=0)
        ri = jnp.arange(h, dtype=jnp.int32)
        ci = jnp.arange(w, dtype=jnp.int32)
        r0 = jnp.min(jnp.where(rows_any, ri, h))
        r1 = jnp.max(jnp.where(rows_any, ri, -1))
        c0 = jnp.min(jnp.where(cols_any, ci, w))
        c1 = jnp.max(jnp.where(cols_any, ci, -1))
        fits = (r1 - r0 < ch) & (c1 - c0 < cw)
        r0c = jnp.clip(r0, 0, h - ch)
        c0c = jnp.clip(c0, 0, w - cw)

        def _run_window(dyn_src, r0s, c0s):
            """Cluster one (ch, cw) window of the frame.

            ``dyn_src`` may be a side-masked copy of the dynamic map (the
            two-window path), so a window that geometrically overlaps the
            other side never clusters the other side's pixels. Returns
            the window result plus each object slot's frame-raster root
            key (= the cluster's first member in FULL-frame raster order;
            within one window, crop raster order equals frame raster
            order restricted to the window, so the window root IS the
            frame root) and the window's size-passing cluster count.
            """
            pts_c = jax.lax.dynamic_slice(
                cloud.points, (r0s, c0s, jnp.int32(0)), (ch, cw, 3)
            )
            vel_c = jax.lax.dynamic_slice(
                vel, (r0s, c0s, jnp.int32(0)), (ch, cw, 3)
            )
            vnorm_c = jax.lax.dynamic_slice(vnorm, (r0s, c0s), (ch, cw))
            dyn_c = jax.lax.dynamic_slice(dyn_src, (r0s, c0s), (ch, cw))
            objects, label_c, overflow, roots = _cluster_dynamic(
                SceneFlowCloud(points=pts_c, velocity=vel_c),
                vel_c, vnorm_c, dyn_c,
                min_size_cap=h * w, **kwargs,
            )
            nc = ch * cw
            key = jnp.where(
                roots < nc,
                (roots // cw + r0s) * w + (roots % cw + c0s),
                jnp.int32(h * w),
            )
            big = jnp.sum((roots < nc).astype(jnp.int32)) + overflow
            return objects, label_c, overflow, key, big

        def _crop_branch(cloud, vel, vnorm, dynamic):
            objects, label_c, overflow, _, _ = _run_window(dynamic, r0c, c0c)
            # Objects are world-space (crop-invariant); only the compact
            # label image needs scattering back into the frame.
            label_image = jax.lax.dynamic_update_slice(
                jnp.full((h, w), -1, jnp.int32), label_c, (r0c, c0c)
            )
            return objects, label_image, overflow

        if config.cc_crop_windows < 2:
            return jax.lax.cond(
                fits, _crop_branch, _full_branch, cloud, vel, vnorm, dynamic
            )

        # Two-window split (cc_crop_windows >= 2): when the dynamic
        # extent defeats one window (e.g. objects near opposite frame
        # corners — BENCH_MATRIX --busy-wide, 136.97 vs 237.3 pairs/s),
        # split at the widest all-static column gap. EXACT when the gap
        # exceeds the neighbor radius: adjacency is Chebyshev-gated
        # (ops/clustering._edge_offsets), so no edge crosses the gap and
        # every cluster lies wholly in one side; per-side top-`cap`
        # selection then composes exactly (a side's (cap+1)-th cluster is
        # preceded by cap earlier keys of its own side, so it can never
        # be in the merged first cap).
        dyncol = jnp.where(cols_any, ci, -1)
        last_dyn = jax.lax.associative_scan(jnp.maximum, dyncol)
        prev_dyn = jnp.concatenate(
            [jnp.full((1,), -1, last_dyn.dtype), last_dyn[:-1]]
        )
        gap = jnp.where(cols_any & (prev_dyn >= 0), ci - prev_dyn - 1, -1)
        i_star = jnp.argmax(gap).astype(jnp.int32)  # right side's first col
        cL = prev_dyn[i_star].astype(jnp.int32)  # left side's last col
        colmask_l = (ci <= cL)[None, :]
        dyn_l = dynamic & colmask_l
        dyn_r = dynamic & ~colmask_l
        rows_any_l = jnp.any(dyn_l, axis=1)
        rows_any_r = jnp.any(dyn_r, axis=1)
        r0l = jnp.min(jnp.where(rows_any_l, ri, h))
        r1l = jnp.max(jnp.where(rows_any_l, ri, -1))
        r0r = jnp.min(jnp.where(rows_any_r, ri, h))
        r1r = jnp.max(jnp.where(rows_any_r, ri, -1))
        fits2 = (
            (cL >= 0)
            & ((i_star - cL) > neighbor_distance)  # no cross-gap edges
            & (r1l - r0l < ch) & (cL - c0 < cw)
            & (r1r - r0r < ch) & (c1 - i_star < cw)
        )
        r0lc = jnp.clip(r0l, 0, h - ch)
        c0lc = jnp.clip(c0, 0, w - cw)
        r0rc = jnp.clip(r0r, 0, h - ch)
        c0rc = jnp.clip(i_star, 0, w - cw)

        def _two_branch(cloud, vel, vnorm, dynamic):
            obj_l, lab_l, _, key_l, big_l = _run_window(dyn_l, r0lc, c0lc)
            obj_r, lab_r, _, key_r, big_r = _run_window(dyn_r, r0rc, c0rc)
            # Merge the two windows' object slots in global root order
            # (ascending frame key; sentinel h*w slots sort last), keep
            # the first `cap` — identical to the full-frame first-cap
            # selection.
            allkey = jnp.concatenate([key_l, key_r])
            full_order = jnp.argsort(allkey)
            rank = jnp.zeros((2 * cap,), jnp.int32).at[full_order].set(
                jnp.arange(2 * cap, dtype=jnp.int32)
            )
            order = full_order[:cap]

            def pick(a, b):
                return jnp.concatenate([a, b])[order]

            valid_m = pick(obj_l.valid, obj_r.valid)
            ids_m = jnp.where(
                valid_m, jnp.cumsum(valid_m.astype(jnp.int32)) - 1, -1
            )
            objects = MovingObjects(
                id=ids_m.astype(jnp.int32),
                center=pick(obj_l.center, obj_r.center),
                velocity=pick(obj_l.velocity, obj_r.velocity),
                bounding_box=pick(obj_l.bounding_box, obj_r.bounding_box),
                valid=valid_m,
            )
            # Window-compact id -> merged SLOT index (-1 beyond
            # capacity), then scatter both windows into the frame. The
            # label image must carry slot indices exactly like the
            # full-frame path (_cluster_dynamic labels pixels with the
            # objects-array slot, which can differ from the compacted
            # MovingObjects.id whenever an occupied slot has
            # valid=False); ids_m is used only for MovingObjects.id.
            # Window regions may overlap geometrically but claim
            # disjoint pixel sets (the side masks), so elementwise max
            # composes them.
            lut = jnp.where(rank < cap, rank, -1).astype(jnp.int32)

            def remap(lab, lut_side):
                out = jnp.full((ch, cw), -1, jnp.int32)
                for j in range(cap):
                    out = jnp.where(lab == j, lut_side[j], out)
                return out

            base = jnp.full((h, w), -1, jnp.int32)
            t_l = jax.lax.dynamic_update_slice(
                base, remap(lab_l, lut[:cap]), (r0lc, c0lc)
            )
            t_r = jax.lax.dynamic_update_slice(
                base, remap(lab_r, lut[cap:]), (r0rc, c0rc)
            )
            label_image = jnp.maximum(t_l, t_r)
            overflow = jnp.maximum(big_l + big_r - cap, 0)
            return objects, label_image, overflow

        def _no_fit_branch(cloud, vel, vnorm, dynamic):
            return jax.lax.cond(
                fits2, _two_branch, _full_branch, cloud, vel, vnorm, dynamic
            )

        return jax.lax.cond(
            fits, _crop_branch, _no_fit_branch, cloud, vel, vnorm, dynamic
        )

    objects, label_image, overflow = jax.lax.cond(
        jnp.any(dynamic),
        _busy_branch,
        _empty_branch,
        cloud,
        vel,
        vnorm,
        dynamic,
    )
    if return_overflow:
        return objects, label_image, overflow
    return objects, label_image


def _cluster_dynamic(
    cloud,
    vel,
    vnorm,
    dynamic,
    *,
    config,
    dynamic_speed,
    depth_diff,
    cluster_size,
    neighbor_distance,
    min_size_cap=None,
):
    h, w = cloud.points.shape[:2]
    n = h * w
    cap = config.max_objects
    # When clustering a crop of a larger frame, cluster_size must still be
    # honored at its full-frame value: a cluster_size above the crop area
    # must reject everything (the dynamic_slice of s_pad below clamps its
    # start to n, making `tail` all-sentinel, so no run passes — exactly
    # the required behavior).
    if min_size_cap is None:
        min_size_cap = n

    depth = cloud.points[..., 2]
    from .ops import resolve_auto_backend

    backend = resolve_auto_backend(config.cc_backend)
    if backend in ("pallas", "pallas_interpret"):
        from .ops.clustering_pallas import connected_components_pallas

        labels = connected_components_pallas(
            dynamic,
            depth,
            depth_diff,
            neighbor_distance=neighbor_distance,
            max_iters=config.max_cc_iters,
            interpret=backend == "pallas_interpret",
            max_span=config.cc_scan_span,
            stencil_radius=config.neighbor_distance,
        )
    else:
        labels = connected_components(
            dynamic,
            depth,
            depth_diff,
            neighbor_distance=neighbor_distance,
            max_iters=config.max_cc_iters,
            stencil_radius=config.neighbor_distance,
        )
    flat_labels = labels.reshape(-1)

    # Component sizes + root selection, scatter/gather-free (both lower to
    # ~467k-update serialized ops on TPU, measured ~7 ms on busy frames):
    # sort the labels once, test run lengths with a shifted compare, and
    # pick the first `cap` runs of size >= cluster_size. Sorted order is ascending
    # label = ascending raster index of the component's first member, the
    # same ordering the reference's removeSmallClusters renumbering
    # produces (clusterer_nodelet.cpp:354-393). Like the reference, a lone
    # dynamic pixel still forms a (size-1) component; min_size >= 2 removes
    # singletons for exact parity.
    min_size = jnp.clip(cluster_size, 2, min_size_cap)
    pos = jnp.arange(n, dtype=jnp.int32)
    # Lexicographic sort (label asc, ||v|| desc, pixel index): one sort
    # serves both root selection AND the median — each cluster's members
    # land contiguous with descending norms, so the reference's
    # "sort by ||v||, take element size/2" (cluster2MovingObject,
    # clusterer_nodelet.cpp:168-174) becomes a (cap,)-element gather at
    # run_start + size//2 instead of a 22-pass per-cluster bisection.
    # f32 bits of non-negative floats are order-isomorphic to the floats,
    # so the negated bitcast sorts norms descending; NaN norms only occur
    # on background pixels (label = sentinel) where order is irrelevant.
    flat_vnorm = vnorm.reshape(-1)
    vbits = jax.lax.bitcast_convert_type(flat_vnorm, jnp.int32)
    s, _, spix = jax.lax.sort(
        (flat_labels, -vbits, pos), num_keys=2
    )
    start = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )  # first element of each run
    # Run-length test without scans (the reverse min-scan + cumsum pair
    # measured ~0.9 ms at KITTI res; the sort itself is only ~0.2 ms): a
    # run starting at i has >= m members iff the element m-1 slots ahead
    # holds the same value. Padding with the background sentinel can't
    # fake a run: real labels are < n.
    s_pad = jnp.concatenate([s, jnp.full((n,), jnp.int32(n))])
    tail = jax.lax.dynamic_slice(s_pad, (min_size - 1,), (n,))
    big_start = start & (s < n) & (tail == s)

    # First `cap` big runs in sorted (= ascending-root) order: the cap
    # smallest start positions, via one top_k over negated positions.
    neg = jnp.where(big_start, -pos, jnp.int32(-(n + 1)))
    topv, _ = jax.lax.top_k(neg, cap)
    rpos = -topv  # (cap,) ascending start positions; n+1 = no such run
    roots = jnp.where(
        rpos < n, jnp.take(s, jnp.minimum(rpos, n - 1)), jnp.int32(n)
    )  # (cap,) label value = root flat index
    root_valid = roots < n

    if backend in ("pallas", "pallas_interpret"):
        # One VMEM-resident pass does compact ids, AABBs
        # (pcl::getMinMax3D, clusterer_nodelet.cpp:151-161) and member
        # counts together — the unrolled XLA passes below re-stream the
        # label/point planes from HBM `cap` times (~1.2 ms at KITTI res
        # vs ~0.2 for the fused kernel). Identical results (min/max/sum
        # are order-insensitive; cid claims are disjoint).
        from .ops.cluster_stats_pallas import cluster_stats_pallas

        cid_img, mins, maxs, csize = cluster_stats_pallas(
            labels, cloud.points, roots,
            interpret=backend == "pallas_interpret",
        )
        cid = cid_img.reshape(-1)
    else:
        # Compact id per pixel: cap masked passes instead of a
        # 467k-element table gather.
        cid = jnp.full((n,), cap, jnp.int32)
        for c in range(cap):
            # The (roots[c] < n) guard keeps invalid slots (sentinel n)
            # from claiming the background label.
            cid = jnp.where(
                (roots[c] < n) & (flat_labels == roots[c]),
                jnp.int32(c), cid,
            )

        # AABB per cluster (pcl::getMinMax3D, clusterer_nodelet.cpp:
        # 151-161). Unrolled masked reductions: a 17-bin segment_min
        # lowers to a 467k-element scatter (~7 ms on TPU); `cap` masked
        # min-reduces are ~0.2 ms.
        pts = cloud.points.reshape(n, 3)
        mins_list, maxs_list, csize_list = [], [], []
        for c in range(cap):
            in_c = (cid == c)[:, None]
            mins_list.append(jnp.min(jnp.where(in_c, pts, jnp.inf), axis=0))
            maxs_list.append(jnp.max(jnp.where(in_c, pts, -jnp.inf), axis=0))
            csize_list.append(jnp.sum(in_c[:, 0].astype(jnp.int32)))
        mins = jnp.stack(mins_list)
        maxs = jnp.stack(maxs_list)
        csize = jnp.stack(csize_list)

    # Median velocity: the member whose ||v|| ranks size/2-th (0-based) in
    # *descending* order (cluster2MovingObject, clusterer_nodelet.cpp:
    # 168-174). The lexicographic sort above already ordered every
    # cluster's members contiguously by descending norm, so the median
    # member is the pixel at sorted position run_start + size//2.
    mpos = jnp.clip(rpos + csize // 2, 0, n - 1)
    median_pixel = jnp.take(spix, mpos)  # (cap,)
    med_vel = vel.reshape(n, 3)[median_pixel]

    med_norm = jnp.sqrt(jnp.sum(med_vel * med_vel, axis=-1))
    # Re-gate the median against dynamic_speed (:176-177).
    valid = root_valid & (csize > 0) & (med_norm >= dynamic_speed)

    # Sequential ids over passing clusters (publishMovingObjects :329-339).
    ids = jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, -1)

    center = jnp.where(valid[:, None], (mins + maxs) * 0.5, 0.0)
    bbox = jnp.where(valid[:, None], maxs - mins, 0.0)
    out_vel = jnp.where(valid[:, None], med_vel, 0.0)

    objects = MovingObjects(
        id=ids.astype(jnp.int32),
        center=center,
        velocity=out_vel,
        bounding_box=bbox,
        valid=valid,
    )
    label_image = jnp.where(cid == cap, -1, cid).reshape(h, w)
    # Size-passing clusters beyond the max_objects capacity: the silent
    # drop made observable (VERDICT round-3 weak #8).
    overflow = jnp.maximum(jnp.sum(big_start.astype(jnp.int32)) - cap, 0)
    # roots (per-slot cluster root = min member flat index; sentinel n for
    # unused slots) lets the two-window crop path order clusters globally.
    return objects, label_image, overflow, roots
