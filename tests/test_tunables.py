"""Runtime-tunable parameter tests (dynamic_reconfigure analog): retuning
between frames changes behavior without recompiling."""

import jax
import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.tunables import Tunables


def test_tunables_from_config_defaults():
    from moving_object_detector_tpu.config import PipelineConfig

    t = Tunables.from_config(PipelineConfig())
    assert float(t.dynamic_flow_diff) == 5.0
    assert int(t.cluster_size) == 2500
    assert abs(float(t.depth_diff) - 0.15) < 1e-6
    assert abs(float(t.dynamic_speed) - 0.3) < 1e-6
    assert float(t.covariance_trace_limit) == 0.5
    assert int(t.correction_count_limit) == 3
    assert float(t.object_radius) == 0.5


def test_retune_no_recompile():
    """Changing a tunable between calls must reuse the compiled step."""
    import tests.test_pipeline as tp
    from moving_object_detector_tpu.pipeline import PipelineState, detect_step

    rng = np.random.default_rng(5)
    bg = tp.blocky(rng, tp.H, tp.W)
    obj = tp.noisy(rng, tp.OBJ_H, tp.OBJ_W)
    tun = Tunables.from_config(tp.CONFIG)

    def run(tun, speed_th):
        state = PipelineState.create(tp.CONFIG)
        outs = []
        for k in range(2):
            obj_x = 30 + tp.SHIFT * k
            left, right = tp.make_frame(bg, obj, obj_x)
            flow = tp.true_flow(obj_x, first=(k == 0))
            state, out = detect_step(
                None, state,
                jnp.asarray(left), jnp.asarray(right), jnp.float32(k * 0.1),
                tp.STEREO, tp.CONFIG,
                flow_override=jnp.asarray(flow),
                tunables=tun.replace_values(dynamic_speed=speed_th),
            )
            outs.append(out)
        return outs[-1]

    # Default threshold (0.3 m/s): the 2 m/s object is detected.
    out_lo = run(tun, 0.3)
    assert np.asarray(out_lo.detections.valid).sum() == 1

    baseline_compiles = detect_step._cache_size()

    # Raised threshold (5 m/s): the same object is no longer dynamic —
    # and the jit cache must not have grown.
    out_hi = run(tun, 5.0)
    assert np.asarray(out_hi.detections.valid).sum() == 0
    assert detect_step._cache_size() == baseline_compiles


def test_cluster_size_tunable():
    import tests.test_clusterer as tc
    from moving_object_detector_tpu.clusterer import cluster_scene_flow
    from moving_object_detector_tpu.types import SceneFlowCloud

    pts, vel = tc.make_cloud()
    tc.fill_block(pts, vel, 4, 10, 5, 13, z=2.0, v=[1.0, 0.0, 0.0])  # 48 px
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))
    obj_small, _ = cluster_scene_flow(
        cloud, tc.CFG, cluster_size=jnp.int32(10)
    )
    obj_big, _ = cluster_scene_flow(
        cloud, tc.CFG, cluster_size=jnp.int32(100)
    )
    assert np.asarray(obj_small.valid).sum() == 1
    assert np.asarray(obj_big.valid).sum() == 0


def test_runner_reconfigure_file(tmp_path):
    """The runtime reconfigure channel (dynamic_reconfigure-server analog):
    a watched JSON file applies Tunables between frames; unknown keys and
    malformed JSON are skipped without crashing."""
    import json
    import os
    import time

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.io.runner import PipelineRunner
    from moving_object_detector_tpu.types import StereoModel

    cfg = PipelineConfig(height=16, width=32)
    stereo = StereoModel.create(fx=50.0, fy=50.0, cx=16, cy=8, baseline=0.5)
    path = str(tmp_path / "tunables.json")
    runner = PipelineRunner(cfg, stereo, reconfigure_file=path)

    # No file yet: nothing applied.
    assert not runner._maybe_reload_tunables()
    assert abs(float(runner.tunables.dynamic_speed)
               - cfg.clusterer.dynamic_speed) < 1e-6

    with open(path, "w") as f:
        json.dump({"dynamic_speed": 1.25, "cluster_size": 64,
                   "not_a_tunable": 7}, f)
    assert runner._maybe_reload_tunables()
    assert abs(float(runner.tunables.dynamic_speed) - 1.25) < 1e-6
    assert int(runner.tunables.cluster_size) == 64
    # Unchanged mtime: no reapply.
    assert not runner._maybe_reload_tunables()

    # Malformed JSON must not crash or change values.
    time.sleep(0.01)
    with open(path, "w") as f:
        f.write("{broken")
    os.utime(path, (time.time() + 1, time.time() + 1))
    assert not runner._maybe_reload_tunables()
    assert abs(float(runner.tunables.dynamic_speed) - 1.25) < 1e-6

    # A further edit applies again.
    with open(path, "w") as f:
        json.dump({"dynamic_flow_diff": 2.5}, f)
    os.utime(path, (time.time() + 2, time.time() + 2))
    assert runner._maybe_reload_tunables()
    assert abs(float(runner.tunables.dynamic_flow_diff) - 2.5) < 1e-6


def test_neighbor_distance_gated_stencil_parity():
    """A traced radius under a larger static stencil must reproduce the
    static radius-k edge set exactly (Chebyshev gating,
    ops/clustering.py), for both CC backends."""
    from moving_object_detector_tpu.ops.clustering import (
        connected_components,
    )
    from moving_object_detector_tpu.ops.clustering_pallas import (
        connected_components_pallas,
    )

    rng = np.random.default_rng(3)
    dyn = jnp.asarray(rng.random((24, 40)) < 0.25)
    depth = jnp.asarray(rng.uniform(1.0, 1.05, (24, 40)).astype(np.float32))
    dd = jnp.float32(0.2)

    for k in (0, 1, 2, 4):
        ref = connected_components(dyn, depth, dd, neighbor_distance=k)
        gated = connected_components(
            dyn, depth, dd,
            neighbor_distance=jnp.int32(k), stencil_radius=4,
        )
        np.testing.assert_array_equal(np.asarray(gated), np.asarray(ref))
        gated_pl = connected_components_pallas(
            dyn, depth, dd,
            neighbor_distance=jnp.int32(k), stencil_radius=4,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(gated_pl), np.asarray(ref))
    # Values above the static radius clamp to it.
    over = connected_components(
        dyn, depth, dd, neighbor_distance=jnp.int32(9), stencil_radius=4
    )
    ref4 = connected_components(dyn, depth, dd, neighbor_distance=4)
    np.testing.assert_array_equal(np.asarray(over), np.asarray(ref4))


def test_neighbor_distance_retune_no_recompile():
    """Retuning neighbor_distance between calls changes connectivity
    without growing the jit cache (the last dynamic_reconfigure knob,
    Clusterer.cfg:11)."""
    import tests.test_clusterer as tc
    from moving_object_detector_tpu.clusterer import cluster_scene_flow
    from moving_object_detector_tpu.types import SceneFlowCloud

    # Two 6x4 blobs separated by a 3-px horizontal gap: radius 4 bridges
    # the gap (one cluster), radius 2 does not (two clusters).
    pts, vel = tc.make_cloud()
    tc.fill_block(pts, vel, 4, 10, 5, 9, z=2.0, v=[1.0, 0.0, 0.0])
    tc.fill_block(pts, vel, 4, 10, 12, 16, z=2.0, v=[1.0, 0.0, 0.0])
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))

    merged, _ = cluster_scene_flow(
        cloud, tc.CFG, neighbor_distance=jnp.int32(4)
    )
    assert np.asarray(merged.valid).sum() == 1
    n_compiles = cluster_scene_flow._cache_size()
    split, _ = cluster_scene_flow(
        cloud, tc.CFG, neighbor_distance=jnp.int32(2)
    )
    assert np.asarray(split.valid).sum() == 2
    assert cluster_scene_flow._cache_size() == n_compiles
