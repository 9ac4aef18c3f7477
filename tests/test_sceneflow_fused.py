"""Fused scene-flow Pallas kernel (ops/sceneflow_pallas.py) parity: the
one-pass kernel must reproduce the composite construct_scene_flow
(windowed-gather backend) — same NaN patterns, same values — on scenes with
invalid disparities, NaN flow, out-of-range values and a non-trivial
ego-motion."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.config import SceneFlowConfig
from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.sceneflow import construct_scene_flow
from moving_object_detector_tpu.types import DisparityImage, StereoModel


def _scene(h, w, seed, motion=True):
    rng = np.random.default_rng(seed)
    stereo = StereoModel.create(
        fx=90.0, fy=95.0, cx=w / 2 - 3, cy=h / 2 + 2, baseline=0.5
    )
    d_now = rng.uniform(1, 60, (h, w)).astype(np.float32)
    d_prev = rng.uniform(1, 60, (h, w)).astype(np.float32)
    # Invalid patches: NaN, zero, negative, out-of-range.
    d_now[3:6, 10:30] = np.nan
    d_now[8:10, :5] = 0.0
    d_prev[12:14, 40:80] = -2.0
    d_prev[0:2, :] = 200.0
    flow = rng.uniform(-6, 6, (h, w, 2)).astype(np.float32)
    flow[5:7, 50:60] = np.nan
    if motion:
        t = np.asarray(
            geometry.make_se3(
                np.asarray(geometry.so3_exp(jnp.asarray([0.01, -0.02, 0.005]))),
                np.array([0.05, -0.02, 0.1], np.float32),
            )
        )
    else:
        t = np.eye(4, dtype=np.float32)
    disp_now = DisparityImage.create(
        jnp.asarray(d_now), f=90.0, t=0.5, min_disparity=0.5,
        max_disparity=63.0,
    )
    disp_prev = DisparityImage.create(
        jnp.asarray(d_prev), f=90.0, t=0.5, min_disparity=0.5,
        max_disparity=63.0,
    )
    return stereo, disp_now, disp_prev, jnp.asarray(flow), jnp.asarray(t)


def _run(backend, stereo, disp_now, disp_prev, flow, t, vr=8, hr=64):
    cfg = dataclasses.replace(
        SceneFlowConfig(), gather_backend=backend,
        match_v_radius=vr, match_h_radius=hr,
    )
    pts_now = geometry.disparity_to_points(disp_now, stereo.cam)
    pts_prev = geometry.transform_points(
        t, geometry.disparity_to_points(disp_prev, stereo.cam)
    )
    return construct_scene_flow(
        pts_now, pts_prev, flow, disp_now, disp_prev, stereo.cam,
        jnp.float32(0.1), jnp.float32(5.0), transform_prev2now=t, config=cfg,
    )


def _assert_parity(a, b):
    (cloud_a, sf_a), (cloud_b, sf_b) = a, b
    for x, y, name in (
        (cloud_a.points, cloud_b.points, "points"),
        (cloud_a.velocity, cloud_b.velocity, "velocity"),
        (sf_a, sf_b, "static_flow"),
    ):
        x, y = np.asarray(x), np.asarray(y)
        np.testing.assert_array_equal(
            np.isnan(x), np.isnan(y), err_msg=f"{name} NaN mask"
        )
        np.testing.assert_allclose(
            x, y, rtol=1e-5, atol=1e-5, equal_nan=True, err_msg=name
        )


def test_fused_matches_composite_with_motion():
    scene = _scene(24, 132, seed=11, motion=True)
    _assert_parity(
        _run("fused_interpret", *scene), _run("pallas_interpret", *scene)
    )


def test_fused_matches_composite_identity():
    scene = _scene(16, 128, seed=5, motion=False)
    _assert_parity(
        _run("fused_interpret", *scene), _run("pallas_interpret", *scene)
    )


def test_fused_out_of_window_degrades_to_nan():
    """Matches beyond the window radii must yield NaN velocity (never a
    wrong value), exactly like the windowed-gather backend."""
    stereo, disp_now, disp_prev, flow, t = _scene(16, 128, seed=9,
                                                  motion=False)
    flow = flow.at[10, 20, 0].set(40.0)  # horizontal match 40 px away
    scene = (stereo, disp_now, disp_prev, flow, t)
    out_f = _run("fused_interpret", *scene, vr=4, hr=16)
    out_p = _run("pallas_interpret", *scene, vr=4, hr=16)
    assert np.isnan(np.asarray(out_f[0].velocity)[10, 20]).all()
    _assert_parity(out_f, out_p)


def test_fused_disparity_rate_parity():
    """dynamic_disparity_rate must behave identically in the fused kernel
    and the composite path (random scene with real disparity differences,
    so some pixels cross the 100 px/s gate and others do not)."""
    stereo, disp_now, disp_prev, flow, t = _scene(24, 132, seed=7,
                                                  motion=True)

    def run(backend):
        cfg = dataclasses.replace(
            SceneFlowConfig(), gather_backend=backend,
            match_v_radius=8, match_h_radius=64,
        )
        pts_now = geometry.disparity_to_points(disp_now, stereo.cam)
        pts_prev = geometry.transform_points(
            t, geometry.disparity_to_points(disp_prev, stereo.cam)
        )
        return construct_scene_flow(
            pts_now, pts_prev, flow, disp_now, disp_prev, stereo.cam,
            jnp.float32(0.1), jnp.float32(5.0), transform_prev2now=t,
            config=cfg, dynamic_disparity_rate=jnp.float32(100.0),
        )

    _assert_parity(run("fused_interpret"), run("pallas_interpret"))
    # And the gate actually changes the answer vs rate=0 on this scene.
    cloud_rate, _ = run("fused_interpret")
    cloud_off, _ = _run("fused_interpret", stereo, disp_now, disp_prev,
                        flow, t)
    a = np.asarray(cloud_rate.velocity)
    b = np.asarray(cloud_off.velocity)
    both = np.isfinite(a[..., 2]) & np.isfinite(b[..., 2])
    assert ((a[..., 2] != b[..., 2]) & both).any()
