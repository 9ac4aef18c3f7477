"""Clustering tests: connected-component semantics, size filtering, AABB and
median-velocity extraction (clusterer_nodelet.cpp:40-393)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.clusterer import cluster_scene_flow
from moving_object_detector_tpu.config import ClustererConfig
from moving_object_detector_tpu.ops.clustering import connected_components
from moving_object_detector_tpu.types import SceneFlowCloud

CFG = ClustererConfig(cluster_size=4, max_objects=8)


def make_cloud(h=24, w=32):
    pts = np.full((h, w, 3), np.nan, np.float32)
    vel = np.full((h, w, 3), np.nan, np.float32)
    return pts, vel


def fill_block(pts, vel, y0, y1, x0, x1, z, v):
    ys, xs = np.mgrid[y0:y1, x0:x1]
    pts[y0:y1, x0:x1, 0] = xs * 0.01
    pts[y0:y1, x0:x1, 1] = ys * 0.01
    pts[y0:y1, x0:x1, 2] = z
    vel[y0:y1, x0:x1] = v


def run(pts, vel, cfg=CFG):
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))
    objects, label_image = cluster_scene_flow(cloud, cfg)
    return objects, np.asarray(label_image)


def test_single_block_detected():
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 10, 5, 13, z=2.0, v=[1.0, 0.0, 0.0])
    objects, labels = run(pts, vel)
    valid = np.asarray(objects.valid)
    assert valid.sum() == 1
    i = valid.argmax()
    np.testing.assert_allclose(np.asarray(objects.velocity)[i], [1, 0, 0], atol=1e-6)
    # AABB center: x in [0.05, 0.12], y in [0.04, 0.09], z = 2
    np.testing.assert_allclose(
        np.asarray(objects.center)[i],
        [(0.05 + 0.12) / 2, (0.04 + 0.09) / 2, 2.0],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(objects.bounding_box)[i], [0.07, 0.05, 0.0], atol=1e-5
    )
    assert (labels[4:10, 5:13] == labels[4, 5]).all()
    assert labels[4, 5] >= 0


def test_slow_pixels_not_clustered():
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 10, 5, 13, z=2.0, v=[0.1, 0.0, 0.0])  # < 0.3 m/s
    objects, labels = run(pts, vel)
    assert not np.asarray(objects.valid).any()
    assert (labels == -1).all()


def test_depth_gate_splits_clusters():
    """Adjacent pixels further apart than depth_diff in z form two clusters."""
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 10, 5, 10, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 4, 10, 10, 15, z=3.0, v=[0.0, 1.0, 0.0])  # dz=1 > 0.15
    objects, labels = run(pts, vel)
    assert np.asarray(objects.valid).sum() == 2
    assert labels[5, 7] != labels[5, 12]


def test_distant_blocks_with_gap_beyond_neighbor_distance():
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 10, 2, 8, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 4, 10, 14, 20, z=2.0, v=[1.0, 0.0, 0.0])  # gap 6 > 4
    objects, labels = run(pts, vel)
    assert np.asarray(objects.valid).sum() == 2
    assert labels[5, 4] != labels[5, 16]


def test_blocks_within_neighbor_distance_merge():
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 10, 2, 8, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 4, 10, 10, 16, z=2.0, v=[1.0, 0.0, 0.0])  # gap 2 <= 4
    objects, labels = run(pts, vel)
    assert np.asarray(objects.valid).sum() == 1
    assert labels[5, 4] == labels[5, 12]


def test_small_cluster_removed():
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 5, 5, 8, z=2.0, v=[1.0, 0.0, 0.0])  # 3 px < 4
    objects, _ = run(pts, vel)
    assert not np.asarray(objects.valid).any()


def test_median_velocity_descending_rank():
    """Median = element at size/2 of the norm-descending sort
    (clusterer_nodelet.cpp:168-174): 4 members with norms
    [1, 2, 3, 10] sorted desc [10, 3, 2, 1] -> index 2 -> norm 2."""
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 5, 5, 9, z=2.0, v=[0.0, 0.0, 0.0])
    vel[4, 5] = [10.0, 0, 0]
    vel[4, 6] = [3.0, 0, 0]
    vel[4, 7] = [2.0, 0, 0]
    vel[4, 8] = [1.0, 0, 0]
    objects, _ = run(pts, vel)
    valid = np.asarray(objects.valid)
    assert valid.sum() == 1
    np.testing.assert_allclose(
        np.asarray(objects.velocity)[valid.argmax()], [2.0, 0, 0], atol=1e-6
    )


def test_median_regate_drops_cluster():
    """If the median velocity is below dynamic_speed the cluster is dropped
    even though its pixels individually passed (:176-177).

    A cluster of fast-but-mostly-minimal pixels: all at exactly 0.3 passes
    (>=); craft one where the median lands on a pixel whose full vector norm
    is below threshold is impossible post-gate, so instead verify the >= gate
    keeps an all-threshold cluster."""
    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 8, 5, 9, z=2.0, v=[0.3, 0.0, 0.0])
    objects, _ = run(pts, vel)
    assert np.asarray(objects.valid).sum() == 1


def test_mixed_sign_diagonal_not_connected():
    """The reference's scan window only links same-sign offsets: a chain of
    up-right (mixed-sign) diagonal steps must NOT merge."""
    h, w = 16, 16
    pts = np.full((h, w, 3), np.nan, np.float32)
    vel = np.full((h, w, 3), np.nan, np.float32)
    # Two pixels diagonal up-right of each other, k=1 to make it sharp.
    for (y, x) in [(8, 4), (7, 5)]:  # (7,5) is up-right of (8,4)
        pts[y, x] = [x * 0.01, y * 0.01, 2.0]
        vel[y, x] = [1.0, 0.0, 0.0]
    dynamic = jnp.asarray(np.isfinite(vel[..., 0]))
    labels = np.asarray(
        connected_components(
            dynamic, jnp.asarray(pts[..., 2]), jnp.float32(0.15),
            neighbor_distance=1, max_iters=16,
        )
    )
    assert labels[8, 4] != labels[7, 5]
    # But down-right diagonal does connect.
    pts2 = pts.copy(); vel2 = vel.copy()
    pts2[7, 5] = np.nan; vel2[7, 5] = np.nan
    pts2[9, 5] = [0.05, 0.09, 2.0]; vel2[9, 5] = [1.0, 0, 0]
    dynamic2 = jnp.asarray(np.isfinite(vel2[..., 0]))
    labels2 = np.asarray(
        connected_components(
            dynamic2, jnp.asarray(pts2[..., 2]), jnp.float32(0.15),
            neighbor_distance=1, max_iters=16,
        )
    )
    assert labels2[8, 4] == labels2[9, 5]


def test_snake_component_converges():
    """A long winding 1-px-wide path exercises the propagation/pointer-jump
    convergence."""
    h, w = 20, 40
    pts = np.full((h, w, 3), np.nan, np.float32)
    vel = np.full((h, w, 3), np.nan, np.float32)
    path = []
    y = 0
    for x in range(w):
        path.append((y, x))
    for y in range(1, h):
        path.append((y, w - 1) if y % 2 == 1 else (y, 0))
        xs = range(w - 1, -1, -1) if y % 2 == 1 else range(w)
        for x in xs:
            path.append((y, x))
    for (y, x) in path:
        pts[y, x] = [x * 0.01, y * 0.01, 2.0]
        vel[y, x] = [1.0, 0.0, 0.0]
    dynamic = jnp.asarray(np.isfinite(vel[..., 0]))
    labels = np.asarray(
        connected_components(
            dynamic, jnp.asarray(pts[..., 2]), jnp.float32(0.15),
            neighbor_distance=1, max_iters=256,
        )
    )
    member_labels = labels[np.isfinite(vel[..., 0])]
    assert (member_labels == member_labels[0]).all()


def test_capacity_overflow_keeps_first_clusters():
    cfg = dataclasses.replace(CFG, max_objects=2, cluster_size=2)
    pts, vel = make_cloud(16, 60)
    for i in range(4):
        fill_block(pts, vel, 2, 6, i * 14 + 2, i * 14 + 6, z=2.0, v=[1.0, 0, 0])
    objects, _ = run(pts, vel, cfg)
    assert np.asarray(objects.valid).sum() == 2  # first two in raster order
    ids = np.asarray(objects.id)
    assert set(ids[np.asarray(objects.valid)]) == {0, 1}


def test_quiet_early_out_matches_full_path():
    """The zero-dynamic lax.cond early-out must be BITWISE identical to
    what the full CC/sort/stats path produces on an all-static cloud."""
    import jax

    from moving_object_detector_tpu.clusterer import _cluster_dynamic

    pts, vel = make_cloud()
    fill_block(pts, vel, 4, 10, 5, 13, z=2.0, v=[0.01, 0.0, 0.0])  # slow
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))
    obj_fast, lab_fast = cluster_scene_flow(cloud, CFG)

    vnorm = jnp.sqrt(jnp.sum(cloud.velocity**2, axis=-1))
    obj_full, lab_full, _, _ = _cluster_dynamic(
        cloud, cloud.velocity, vnorm,
        vnorm >= jnp.float32(CFG.dynamic_speed),
        config=CFG,
        dynamic_speed=jnp.float32(CFG.dynamic_speed),
        depth_diff=jnp.float32(CFG.depth_diff),
        cluster_size=jnp.int32(CFG.cluster_size),
        neighbor_distance=jnp.int32(CFG.neighbor_distance),
    )
    np.testing.assert_array_equal(np.asarray(lab_fast), np.asarray(lab_full))
    assert not bool(np.asarray(obj_full.valid).any())
    for a, b in zip(jax.tree_util.tree_leaves(obj_fast),
                    jax.tree_util.tree_leaves(obj_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _run_cfg(pts, vel, cfg):
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))
    objects, label_image = cluster_scene_flow(cloud, cfg)
    return objects, np.asarray(label_image)


def _assert_same_result(a, b):
    import jax

    obj_a, lab_a = a
    obj_b, lab_b = b
    np.testing.assert_array_equal(np.asarray(lab_a), np.asarray(lab_b))
    for x, y in zip(jax.tree_util.tree_leaves(obj_a),
                    jax.tree_util.tree_leaves(obj_b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_crop_fast_path_matches_full_path():
    """Dynamic extent inside the cc_crop window: identical objects AND
    label image (raster order, hence root choice and cluster ordering,
    is crop-invariant)."""
    pts, vel = make_cloud(h=40, w=64)
    fill_block(pts, vel, 20, 28, 30, 44, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 22, 30, 50, 60, z=3.0, v=[0.0, 1.0, 0.0])
    full = _run_cfg(pts, vel, dataclasses.replace(CFG))
    crop = _run_cfg(
        pts, vel, dataclasses.replace(CFG, cc_crop_h=16, cc_crop_w=40)
    )
    assert np.asarray(full[0].valid).sum() == 2
    _assert_same_result(full, crop)


def test_crop_fallback_when_extent_exceeds_window():
    """Dynamic pixels wider than the window: the full-frame branch runs
    and results are identical to a crop-disabled config."""
    pts, vel = make_cloud(h=40, w=64)
    fill_block(pts, vel, 4, 12, 2, 60, z=2.0, v=[1.0, 0.0, 0.0])
    full = _run_cfg(pts, vel, CFG)
    crop = _run_cfg(
        pts, vel, dataclasses.replace(CFG, cc_crop_h=16, cc_crop_w=40)
    )
    assert np.asarray(full[0].valid).sum() == 1
    _assert_same_result(full, crop)


def test_crop_at_frame_edges():
    """Window clamping at the bottom-right corner keeps the crop in
    bounds and results exact."""
    pts, vel = make_cloud(h=40, w=64)
    fill_block(pts, vel, 34, 40, 56, 64, z=2.0, v=[1.0, 0.0, 0.0])
    full = _run_cfg(pts, vel, CFG)
    crop = _run_cfg(
        pts, vel, dataclasses.replace(CFG, cc_crop_h=16, cc_crop_w=40)
    )
    assert np.asarray(full[0].valid).sum() == 1
    _assert_same_result(full, crop)


def test_crop_cluster_size_above_crop_area_rejects():
    """cluster_size above the crop AREA must reject every cluster (the
    full-frame min_size clip semantics, not the crop's)."""
    pts, vel = make_cloud(h=40, w=64)
    fill_block(pts, vel, 20, 28, 30, 44, z=2.0, v=[1.0, 0.0, 0.0])
    cfg = dataclasses.replace(
        CFG, cluster_size=10 * 12 + 1, cc_crop_h=10, cc_crop_w=12
    )
    # 8x14 block = 112 px > crop area 120? no: make the block bigger than
    # the window so the FULL path runs, then shrink cluster_size checks:
    # here extent 8x14 fits no 10x12 window -> full path; separately, a
    # small fitting block must be rejected by the big threshold.
    objects, labels = _run_cfg(pts, vel, cfg)
    assert not np.asarray(objects.valid).any()
    cfg2 = dataclasses.replace(
        CFG, cluster_size=16 * 40 + 1, cc_crop_h=16, cc_crop_w=40
    )
    objects2, labels2 = _run_cfg(pts, vel, cfg2)
    assert not np.asarray(objects2.valid).any()
    # Size-rejected clusters get no compact id in either path.
    assert (labels2 == -1).all()


def test_crop_median_and_capacity_parity_random():
    """Randomized multi-blob scenes: crop vs full bitwise parity
    (exercises median gather, ordering, capacity overflow)."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        pts, vel = make_cloud(h=48, w=96)
        for _ in range(5):
            y0 = int(rng.integers(8, 28))
            x0 = int(rng.integers(20, 60))
            hh = int(rng.integers(2, 8))
            ww = int(rng.integers(2, 10))
            z = float(rng.uniform(1, 2))
            v = [float(rng.uniform(0.5, 2)), 0.0, 0.0]
            fill_block(pts, vel, y0, y0 + hh, x0, x0 + ww, z=z, v=v)
        cfg = dataclasses.replace(CFG, max_objects=4)
        full = _run_cfg(pts, vel, cfg)
        crop = _run_cfg(
            pts, vel,
            dataclasses.replace(cfg, cc_crop_h=32, cc_crop_w=64),
        )
        _assert_same_result(full, crop)


def test_crop_fast_path_pallas_interpret():
    """Crop branch over the Pallas CC + fused-stats kernels (interpret
    mode) matches the XLA full-frame path bitwise."""
    pts, vel = make_cloud(h=24, w=32)
    fill_block(pts, vel, 10, 16, 12, 22, z=2.0, v=[1.0, 0.0, 0.0])
    full = _run_cfg(pts, vel, dataclasses.replace(CFG, cc_backend="xla"))
    crop = _run_cfg(
        pts, vel,
        dataclasses.replace(
            CFG, cc_backend="pallas_interpret", cc_crop_h=8, cc_crop_w=16
        ),
    )
    assert np.asarray(full[0].valid).sum() == 1
    _assert_same_result(full, crop)


def test_cluster_overflow_counter():
    """Size-passing clusters beyond max_objects are dropped (fixed
    capacity); return_overflow=True must report exactly how many, and 0
    when everything fits or the frame is quiet."""
    pts, vel = make_cloud()
    for i, x0 in enumerate((2, 12, 22)):
        fill_block(pts, vel, 4, 10, x0, x0 + 7, z=2.0 + i,
                   v=[1.0, 0.0, 0.0])
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))

    cfg2 = dataclasses.replace(CFG, max_objects=2)
    objects, _, overflow = cluster_scene_flow(cloud, cfg2,
                                              return_overflow=True)
    assert int(np.asarray(objects.valid).sum()) == 2
    assert int(overflow) == 1

    objects, _, overflow = cluster_scene_flow(cloud, CFG,
                                              return_overflow=True)
    assert int(np.asarray(objects.valid).sum()) == 3
    assert int(overflow) == 0

    quiet = SceneFlowCloud(
        points=jnp.asarray(pts),
        velocity=jnp.zeros_like(jnp.asarray(vel)),
    )
    _, _, overflow = cluster_scene_flow(quiet, cfg2, return_overflow=True)
    assert int(overflow) == 0

    # Default signature unchanged: two elements.
    out = cluster_scene_flow(cloud, cfg2)
    assert len(out) == 2


def test_two_window_split_matches_full_path():
    """Two objects at opposite frame corners: the single window can't fit
    the dynamic extent, the two-window column split runs, and the result
    is bitwise identical to the full-frame path (ordering, ids, label
    image, median velocities)."""
    pts, vel = make_cloud(h=40, w=96)
    fill_block(pts, vel, 2, 10, 2, 20, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 30, 38, 70, 92, z=3.0, v=[0.0, 1.0, 0.0])
    full = _run_cfg(pts, vel, CFG)
    two = _run_cfg(
        pts, vel, dataclasses.replace(CFG, cc_crop_h=16, cc_crop_w=40)
    )
    assert np.asarray(full[0].valid).sum() == 2
    _assert_same_result(full, two)


def test_two_window_disabled_falls_back_to_full():
    """cc_crop_windows=1 restores the single-window behavior: the
    two-corner scene takes the full-frame branch, results identical."""
    pts, vel = make_cloud(h=40, w=96)
    fill_block(pts, vel, 2, 10, 2, 20, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 30, 38, 70, 92, z=3.0, v=[0.0, 1.0, 0.0])
    full = _run_cfg(pts, vel, CFG)
    one = _run_cfg(
        pts, vel,
        dataclasses.replace(
            CFG, cc_crop_h=16, cc_crop_w=40, cc_crop_windows=1
        ),
    )
    _assert_same_result(full, one)


def test_two_window_small_gap_falls_back():
    """A column gap not exceeding the neighbor radius cannot be split
    (a cluster edge could cross it): the full-frame branch must run."""
    pts, vel = make_cloud(h=40, w=96)
    # Same depth, column distance exactly neighbor_distance (4, i.e. 3
    # static columns between): the two blocks are ONE window-CC cluster
    # in the full path, so the split predicate must reject the gap.
    fill_block(pts, vel, 2, 10, 2, 46, z=2.0, v=[1.0, 0.0, 0.0])
    fill_block(pts, vel, 2, 10, 49, 92, z=2.0, v=[1.0, 0.0, 0.0])
    full = _run_cfg(pts, vel, CFG)
    two = _run_cfg(
        pts, vel, dataclasses.replace(CFG, cc_crop_h=16, cc_crop_w=60)
    )
    assert np.asarray(full[0].valid).sum() == 1  # merged across the gap
    _assert_same_result(full, two)


def test_two_window_capacity_and_ordering_parity():
    """Clusters on both sides exceeding max_objects: the merged first-cap
    selection and the overflow count must match the full-frame path."""
    from moving_object_detector_tpu.types import SceneFlowCloud

    pts, vel = make_cloud(h=40, w=96)
    # 3 left-side and 3 right-side blobs, interleaved in raster order.
    for i, (y0, x0) in enumerate(
        [(2, 2), (6, 70), (14, 10), (18, 80), (26, 4), (30, 74)]
    ):
        fill_block(
            pts, vel, y0, y0 + 3, x0, x0 + 8,
            z=1.5 + 0.5 * i, v=[1.0 + 0.1 * i, 0.0, 0.0],
        )
    cfg_full = dataclasses.replace(CFG, max_objects=4)
    cfg_two = dataclasses.replace(
        CFG, max_objects=4, cc_crop_h=16, cc_crop_w=40
    )
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))
    obj_f, lab_f, ovf_f = cluster_scene_flow(
        cloud, cfg_full, return_overflow=True
    )
    obj_t, lab_t, ovf_t = cluster_scene_flow(
        cloud, cfg_two, return_overflow=True
    )
    assert int(np.asarray(ovf_f)) == 2  # 6 size-passing clusters, cap 4
    assert int(np.asarray(ovf_t)) == int(np.asarray(ovf_f))
    _assert_same_result((obj_f, np.asarray(lab_f)), (obj_t, np.asarray(lab_t)))


def test_two_window_random_scatter_parity():
    """Randomized blobs over the whole frame: whatever branch triggers
    (one-window, two-window, or full fallback), results are bitwise
    identical to the crop-disabled path."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        pts, vel = make_cloud(h=48, w=112)
        for _ in range(int(rng.integers(1, 6))):
            y0 = int(rng.integers(0, 40))
            x0 = int(rng.integers(0, 100))
            hh = int(rng.integers(2, 8))
            ww = int(rng.integers(2, 12))
            z = float(rng.uniform(1, 3))
            v = [float(rng.uniform(0.5, 2)), 0.0, 0.0]
            fill_block(pts, vel, y0, y0 + hh, x0, x0 + min(ww, 112 - x0), z=z, v=v)
        cfg = dataclasses.replace(CFG, max_objects=4)
        full = _run_cfg(pts, vel, cfg)
        two = _run_cfg(
            pts, vel,
            dataclasses.replace(
                cfg, cc_crop_h=16, cc_crop_w=48
            ),
        )
        _assert_same_result(full, two)
