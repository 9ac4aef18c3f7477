"""Scene-flow construct cost: constant vs per-iteration-varying flow.

profile_pipeline.py feeds a CONSTANT zero flow, which makes the previous-
pixel gather's indices loop-invariant — XLA can treat them as constants
and the measured 1.7 ms understates the real cost inside detect_step
(where flow is data-dependent). This times both forms.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.sceneflow import construct_scene_flow
from moving_object_detector_tpu.types import DisparityImage, StereoModel
from moving_object_detector_tpu.utils.profiling import chain_slope_ms

H, W = 376, 1242
stereo = StereoModel.create(fx=721.5, fy=721.5, cx=W / 2, cy=H / 2,
                            baseline=0.54)
cam = stereo.cam
motion = jnp.eye(4, dtype=jnp.float32)
rng = np.random.default_rng(0)
flow0 = jnp.asarray(rng.uniform(-8, 8, (H, W, 2)).astype(np.float32))
d0 = jnp.asarray(rng.uniform(2, 100, (H, W)).astype(np.float32))


def witness(*trees):
    tot = jnp.float32(0.0)
    for t_ in trees:
        for leaf in jax.tree_util.tree_leaves(t_):
            v = jnp.asarray(leaf).ravel()[:4].astype(jnp.float32)
            tot = tot + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.123))
    return tot * 1e-20


def build(d_now, d_prev, flow):
    disp_now = DisparityImage.create(d_now, f=cam.fx, t=0.54,
                                     min_disparity=0.0, max_disparity=127.0)
    disp_prev = DisparityImage.create(d_prev, f=cam.fx, t=0.54,
                                      min_disparity=0.0, max_disparity=127.0)
    pts_now = geometry.disparity_to_points(disp_now, cam)
    pts_prev = geometry.transform_points(
        motion, geometry.disparity_to_points(disp_prev, cam)
    )
    return construct_scene_flow(
        pts_now, pts_prev, flow, disp_now, disp_prev, cam,
        jnp.float32(0.1), jnp.float32(5.0), transform_prev2now=motion,
    )


def t(name, step, init):
    dt = chain_slope_ms(step, init, 12, 60)
    print(f"{name:44s} {dt:8.3f} ms", flush=True)


def const_step(carry):
    d_now, d_prev = carry
    cloud, sf = build(d_now, d_prev, flow0)
    return d_now + witness(cloud, sf), d_prev


t("scene construct (constant flow)", const_step, (d0, d0 + 0.5))


def var_step(carry):
    d_now, d_prev, flow = carry
    cloud, sf = build(d_now, d_prev, flow)
    w = witness(cloud, sf)
    return d_now + w, d_prev, flow + w


t("scene construct (varying flow)", var_step, (d0, d0 + 0.5, flow0))


# --- Backend comparison: composite (xla / windowed-pallas) vs the fused
# one-pass kernel (ops/sceneflow_pallas.py), varying flow, plus a parity
# check on the real chip (odd-resolution padding exercised by 376x1242).
import dataclasses

from moving_object_detector_tpu.config import SceneFlowConfig


def build_cfg(d_now, d_prev, flow, cfg):
    disp_now = DisparityImage.create(d_now, f=cam.fx, t=0.54,
                                     min_disparity=0.0, max_disparity=127.0)
    disp_prev = DisparityImage.create(d_prev, f=cam.fx, t=0.54,
                                      min_disparity=0.0, max_disparity=127.0)
    pts_now = geometry.disparity_to_points(disp_now, cam)
    pts_prev = geometry.transform_points(
        motion, geometry.disparity_to_points(disp_prev, cam)
    )
    return construct_scene_flow(
        pts_now, pts_prev, flow, disp_now, disp_prev, cam,
        jnp.float32(0.1), jnp.float32(5.0), transform_prev2now=motion,
        config=cfg,
    )


for backend in ("xla", "pallas", "fused"):
    cfg = dataclasses.replace(SceneFlowConfig(), gather_backend=backend)

    def step(carry, cfg=cfg):
        d_now, d_prev, flow = carry
        cloud, sf = build_cfg(d_now, d_prev, flow, cfg)
        w = witness(cloud, sf)
        return d_now + w, d_prev, flow + w

    t(f"scene construct [{backend}] (varying flow)", step,
      (d0, d0 + 0.5, flow0))

# Parity on hardware: fused vs windowed composite must agree exactly
# (same window semantics); vs xla they agree wherever the match is within
# the window (flow0 is within +-8 px, so everywhere).
out_p = build_cfg(d0, d0 + 0.5, flow0,
                  dataclasses.replace(SceneFlowConfig(),
                                      gather_backend="pallas"))
out_f = build_cfg(d0, d0 + 0.5, flow0,
                  dataclasses.replace(SceneFlowConfig(),
                                      gather_backend="fused"))
for name, a, b in (
    ("points", out_p[0].points, out_f[0].points),
    ("velocity", out_p[0].velocity, out_f[0].velocity),
    ("static_flow", out_p[1], out_f[1]),
):
    a, b = np.asarray(a), np.asarray(b)
    nan_eq = (np.isnan(a) == np.isnan(b)).all()
    close = np.allclose(a, b, rtol=1e-5, atol=1e-5, equal_nan=True)
    print(f"parity fused vs pallas [{name}]: nan-mask {'OK' if nan_eq else 'MISMATCH'},"
          f" values {'OK' if close else 'MISMATCH'}", flush=True)
