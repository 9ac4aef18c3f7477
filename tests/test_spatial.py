"""Spatial (row-stripe) sharding: sharded perception must reproduce the
single-device result away from stripe seams (parallel/spatial.py contract).

Runs on the virtual 8-device CPU mesh (conftest bootstrap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moving_object_detector_tpu.config import FlowNetConfig, SGMConfig
from moving_object_detector_tpu.ops.sgm import sgm_disparity_raw
from moving_object_detector_tpu.parallel.mesh import create_mesh
from moving_object_detector_tpu.parallel.spatial import (
    compute_disparity_spatial,
    flow_forward_spatial,
)
from moving_object_detector_tpu.types import StereoModel


def _stereo_pair(h, w, d_true, key):
    """Textured scene where the right view is the left shifted by d_true."""
    img = jax.random.uniform(key, (h, w), jnp.float32)
    # smooth a little so census windows carry structure
    k = jnp.ones((3, 3), jnp.float32) / 9.0
    img = jax.scipy.signal.convolve2d(img, k, mode="same")
    left = img
    right = jnp.roll(img, -d_true, axis=1)
    return left, right


def test_sgm_spatial_matches_single_device():
    h, w, d_true = 64, 160, 7
    left, right = _stereo_pair(h, w, d_true, jax.random.PRNGKey(0))
    cfg = SGMConfig(max_disparity=32, backend="xla")
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)

    mesh = create_mesh(8, model_parallel=4)  # 4-way row sharding
    ref = sgm_disparity_raw(left, right, cfg)
    out = compute_disparity_spatial(
        left, right, stereo, cfg, mesh, axis="model", halo=12
    ).disparity

    ref_np = np.asarray(ref)
    out_np = np.asarray(out)
    both_valid = (ref_np >= 0) & (out_np >= 0)
    # Valid/invalid status identical for almost all pixels.
    assert (ref_np >= 0).mean() > 0.5  # scene actually matches
    status_agree = ((ref_np >= 0) == (out_np >= 0)).mean()
    assert status_agree > 0.97, status_agree
    # Where both valid, disparities agree to <= 1 px nearly everywhere and
    # exactly on the vast majority.
    diff = np.abs(ref_np - out_np)[both_valid]
    assert (diff <= 1.0).mean() > 0.98, (diff <= 1.0).mean()
    assert (diff == 0.0).mean() > 0.90, (diff == 0.0).mean()


def test_sgm_spatial_recovers_true_disparity():
    h, w, d_true = 64, 160, 5
    left, right = _stereo_pair(h, w, d_true, jax.random.PRNGKey(2))
    cfg = SGMConfig(max_disparity=32, backend="xla")
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    mesh = create_mesh(8, model_parallel=2)
    out = np.asarray(
        compute_disparity_spatial(
            left, right, stereo, cfg, mesh, halo=16
        ).disparity
    )
    valid = out[:, d_true + 2 :][out[:, d_true + 2 :] >= 0]
    assert valid.size > 0.5 * h * w
    assert np.median(np.abs(valid - d_true)) < 0.51


def test_flow_spatial_matches_single_device():
    h, w = 128, 96
    cfg = FlowNetConfig(
        feature_channels=(8, 16, 32), search_range=2,
        use_context_net=False, dtype="float32",
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward

    model = PWCNet(config=cfg)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (h, w), jnp.float32)
    img2 = jnp.roll(img1, -2, axis=1)

    ref = np.asarray(_flow_forward(params, model, img1, img2))
    mesh = create_mesh(8, model_parallel=4)
    out = np.asarray(
        flow_forward_spatial(params, model, img1, img2, mesh, halo=32)
    )
    assert out.shape == ref.shape
    # Interior (away from seams + image border by a pyramid stride) agrees.
    err = np.abs(out - ref)
    assert np.median(err) < 0.05, np.median(err)
    assert np.mean(err < 0.25) > 0.9, np.mean(err < 0.25)


def test_sgm_spatial_halo_bounds_checked():
    h, w = 64, 160
    left = jnp.zeros((h, w), jnp.float32)
    cfg = SGMConfig(max_disparity=32, backend="xla")
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    mesh = create_mesh(8, model_parallel=8)
    with pytest.raises(AssertionError):
        compute_disparity_spatial(left, left, stereo, cfg, mesh, halo=16)


def test_detect_step_streams_spatial_composition():
    """Streams x spatial: 2 streams over 'data' x 2-way row stripes over
    'model' on a 4-device submesh of the CPU mesh. The composed step must
    (a) plumb the sharded heavy-stage outputs bitwise-exactly into the
    batched frame program, and (b) agree with the fully unsharded batched
    step away from stripe seams."""
    from moving_object_detector_tpu.config import (
        ClustererConfig, EgoMotionConfig, PipelineConfig, SceneFlowConfig,
        SGMConfig, TrackerConfig,
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.parallel.spatial import (
        detect_step_streams_spatial,
    )
    from moving_object_detector_tpu.parallel.streams import (
        create_stream_states, detect_step_batched,
    )

    h, w, n = 64, 128, 2
    config = PipelineConfig(
        height=h, width=w,
        scene_flow=SceneFlowConfig(dynamic_flow_diff=2.0),
        clusterer=ClustererConfig(
            cluster_size=100, depth_diff=0.3, dynamic_speed=0.3,
            neighbor_distance=2, max_objects=4,
        ),
        tracker=TrackerConfig(max_tracks=8),
        sgm=SGMConfig(max_disparity=16, census_window=(5, 5), backend="xla"),
        egomotion=EgoMotionConfig(
            max_features=128, nms_radius=2, ransac_hypotheses=16,
            lk_pyramid_levels=2, min_inliers=8,
        ),
        flownet=FlowNetConfig(
            feature_channels=(8, 16, 32), search_range=2,
            use_context_net=False, dtype="float32",
        ),
    )
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.48)
    model = PWCNet(config=config.flownet)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))

    # Per-stream textured scenes; right = left shifted (uniform disparity 6).
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    k3 = jnp.ones((3, 3), jnp.float32) / 9.0
    def scene(key):
        img = jax.random.uniform(key, (h, w), jnp.float32)
        return jax.scipy.signal.convolve2d(img, k3, mode="same")
    lefts0 = jax.vmap(scene)(keys)
    rights0 = jnp.roll(lefts0, -6, axis=2)
    # Frame 1: camera static, texture identical (zero-flow scene).
    lefts1, rights1 = lefts0, rights0

    mesh = create_mesh(4, model_parallel=2)  # (data=2, model=2)
    states = create_stream_states(config, n)
    ts0 = jnp.full((n,), 0.1, jnp.float32)
    ts1 = jnp.full((n,), 0.2, jnp.float32)

    # Warm-up frame + measured frame, both through the composed step (one
    # compiled program). After frame 0, state.prev_left == lefts0 on any
    # path, so the same states serve the unsharded comparisons below.
    with mesh:
        states_sp, _ = detect_step_streams_spatial(
            params, states, lefts0, rights0, ts0, stereo, config, model,
            mesh, sgm_halo=12, flow_halo=24,
        )
        _, out_sp = detect_step_streams_spatial(
            params, states_sp, lefts1, rights1, ts1, stereo, config, model,
            mesh, sgm_halo=12, flow_halo=24,
        )

    # (a) plumbing exactness: feeding the SAME sharded heavy outputs through
    # the batched step must reproduce the composed step bitwise.
    _, out_ref = detect_step_batched(
        params, states_sp, lefts1, rights1, ts1, stereo, config,
        flow_model=model,
        flow_overrides=out_sp.flow,
        disparity_overrides=out_sp.disparity,
    )
    np.testing.assert_array_equal(
        np.asarray(out_ref.scene_flow.velocity),
        np.asarray(out_sp.scene_flow.velocity),
    )
    np.testing.assert_array_equal(
        np.asarray(out_ref.label_image), np.asarray(out_sp.label_image)
    )

    # (b) seam-tolerant agreement with the unsharded batched step.
    _, out_pl = detect_step_batched(
        params, states_sp, lefts1, rights1, ts1, stereo, config,
        flow_model=model,
    )
    d_sp = np.asarray(out_sp.disparity.disparity)
    d_pl = np.asarray(out_pl.disparity.disparity)
    assert d_sp.shape == (n, h, w)
    status_agree = ((d_sp >= 0) == (d_pl >= 0)).mean()
    assert status_agree > 0.95, status_agree
    both = (d_sp >= 0) & (d_pl >= 0)
    assert both.mean() > 0.5
    assert (np.abs(d_sp - d_pl)[both] <= 1.0).mean() > 0.97

    f_sp = np.asarray(out_sp.flow)
    f_pl = np.asarray(out_pl.flow)
    assert f_sp.shape == (n, h, w, 2)
    assert np.median(np.abs(f_sp - f_pl)) < 0.1
    # Static scene: neither path may detect motion.
    assert int(np.asarray(out_sp.detections.valid).sum()) == 0
    assert int(np.asarray(out_pl.detections.valid).sum()) == 0
    assert bool(np.asarray(out_sp.frame_valid).all())


def test_streams_spatial_with_pallas_interpret_kernels():
    """The manual-SPMD streams x spatial composition must compose with the
    PALLAS kernels (not just their XLA oracles): parallel/spatial.py's
    contract is that no GSPMD pass ever sees the Pallas calls, so the
    kernels must run unmodified inside the shard_map. Exercised here with
    every Pallas family in interpret mode on the CPU mesh — SGM v2
    (census-fused DP), flow correlation, scene-flow windowed gather, and
    clusterer CC + stats — and checked for plumbing exactness against the
    unsharded batched step fed the sharded heavy-stage outputs."""
    from moving_object_detector_tpu.config import (
        ClustererConfig, EgoMotionConfig, PipelineConfig, SceneFlowConfig,
        TrackerConfig,
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.parallel.spatial import (
        detect_step_streams_spatial,
    )
    from moving_object_detector_tpu.parallel.streams import (
        create_stream_states, detect_step_batched,
    )

    h, w, n = 64, 160, 2
    config = PipelineConfig(
        height=h, width=w,
        scene_flow=SceneFlowConfig(
            dynamic_flow_diff=2.0, gather_backend="pallas_interpret",
        ),
        clusterer=ClustererConfig(
            cluster_size=100, depth_diff=0.3, dynamic_speed=0.3,
            neighbor_distance=2, max_objects=4,
            cc_backend="pallas_interpret",
        ),
        tracker=TrackerConfig(max_tracks=8),
        # The v2 Pallas kernels are specialized to D=128.
        sgm=SGMConfig(max_disparity=128, census_window=(5, 5),
                      backend="pallas_interpret"),
        egomotion=EgoMotionConfig(
            max_features=128, nms_radius=2, ransac_hypotheses=16,
            lk_pyramid_levels=2, min_inliers=8,
        ),
        flownet=FlowNetConfig(
            feature_channels=(8, 16, 32), search_range=2,
            use_context_net=False, dtype="float32",
            corr_backend="pallas_interpret",
        ),
    )
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.48)
    model = PWCNet(config=config.flownet)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))

    keys = jax.random.split(jax.random.PRNGKey(3), n)
    k3 = jnp.ones((3, 3), jnp.float32) / 9.0

    def scene(key):
        img = jax.random.uniform(key, (h, w), jnp.float32)
        return jax.scipy.signal.convolve2d(img, k3, mode="same")

    lefts0 = jax.vmap(scene)(keys)
    rights0 = jnp.roll(lefts0, -6, axis=2)

    mesh = create_mesh(4, model_parallel=2)  # (data=2, model=2)
    states = create_stream_states(config, n)
    ts0 = jnp.full((n,), 0.1, jnp.float32)
    ts1 = jnp.full((n,), 0.2, jnp.float32)

    with mesh:
        states_sp, _ = detect_step_streams_spatial(
            params, states, lefts0, rights0, ts0, stereo, config, model,
            mesh, sgm_halo=12, flow_halo=24,
        )
        _, out_sp = detect_step_streams_spatial(
            params, states_sp, lefts0, rights0, ts1, stereo, config, model,
            mesh, sgm_halo=12, flow_halo=24,
        )

    # Plumbing exactness: the batched step fed the SAME sharded heavy
    # outputs (and the same interpret-Pallas light stages) reproduces the
    # composed step bitwise.
    _, out_ref = detect_step_batched(
        params, states_sp, lefts0, rights0, ts1, stereo, config,
        flow_model=model,
        flow_overrides=out_sp.flow,
        disparity_overrides=out_sp.disparity,
    )
    np.testing.assert_array_equal(
        np.asarray(out_ref.scene_flow.velocity),
        np.asarray(out_sp.scene_flow.velocity),
    )
    np.testing.assert_array_equal(
        np.asarray(out_ref.label_image), np.asarray(out_sp.label_image)
    )
    # Static scene through real kernels: finite fields, no detections.
    assert np.isfinite(np.asarray(out_sp.flow)).all()
    assert int(np.asarray(out_sp.detections.valid).sum()) == 0
    assert bool(np.asarray(out_sp.frame_valid).all())


def test_streams_scan_matches_batched():
    """detect_step_streams_scan (the supported single-chip multi-stream
    form: lax.map over streams, kernels unbatched) is bitwise-identical
    to the vmapped detect_step_batched on CPU with XLA kernels."""
    from moving_object_detector_tpu.config import (
        ClustererConfig, EgoMotionConfig, PipelineConfig, SceneFlowConfig,
        TrackerConfig,
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.parallel.streams import (
        create_stream_states, detect_step_batched, detect_step_streams_scan,
    )

    h, w, n = 48, 96, 2
    config = PipelineConfig(
        height=h, width=w,
        scene_flow=SceneFlowConfig(dynamic_flow_diff=2.0,
                                   gather_backend="xla"),
        clusterer=ClustererConfig(
            cluster_size=50, depth_diff=0.3, dynamic_speed=0.3,
            neighbor_distance=2, max_objects=4, cc_backend="xla",
        ),
        tracker=TrackerConfig(max_tracks=8),
        sgm=SGMConfig(max_disparity=16, census_window=(5, 5),
                      backend="xla"),
        egomotion=EgoMotionConfig(
            max_features=64, nms_radius=2, ransac_hypotheses=8,
            lk_pyramid_levels=2, min_inliers=8,
        ),
        flownet=FlowNetConfig(
            feature_channels=(8, 16, 32), search_range=2,
            use_context_net=False, dtype="float32", corr_backend="xla",
        ),
    )
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.48)
    model = PWCNet(config=config.flownet)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))

    keys = jax.random.split(jax.random.PRNGKey(5), n)
    k3 = jnp.ones((3, 3), jnp.float32) / 9.0
    def scene(key):
        img = jax.random.uniform(key, (h, w), jnp.float32)
        return jax.scipy.signal.convolve2d(img, k3, mode="same")
    lefts = jax.vmap(scene)(keys)
    rights = jnp.roll(lefts, -5, axis=2)

    states = create_stream_states(config, n)
    ts = jnp.full((n,), 0.1, jnp.float32)
    st_b, out_b = detect_step_batched(
        params, states, lefts, rights, ts, stereo, config,
        flow_model=model,
    )
    st_s, out_s = detect_step_streams_scan(
        params, states, lefts, rights, ts, stereo, config,
        flow_model=model,
    )
    for name, a, b in (
        ("disparity", out_b.disparity.disparity, out_s.disparity.disparity),
        ("velocity", out_b.scene_flow.velocity, out_s.scene_flow.velocity),
        ("label", out_b.label_image, out_s.label_image),
        ("prev_left", st_b.prev_left, st_s.prev_left),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_detect_step_batched_guarded_on_accelerator(monkeypatch):
    """The vmapped streams path crashed a real TPU worker (BENCH_MATRIX
    r4); it must refuse to run when the default backend is not CPU."""
    from moving_object_detector_tpu.parallel import streams as streams_mod

    monkeypatch.setattr(streams_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="detect_step_streams_scan"):
        # Trace-time guard: argument shapes never matter.
        streams_mod.detect_step_batched.__wrapped__(
            None, None, None, None, None, None, None
        )
