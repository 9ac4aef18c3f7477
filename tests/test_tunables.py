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
