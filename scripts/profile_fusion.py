"""Why does the flow net cost ~2x inside the fused detect_step?

Ablates one stage at a time by monkeypatching pipeline internals with
constant-returning stubs, timing the FULL program each time (chained
slope). Differences between rows isolate pairwise interactions (layout
conflicts, VMEM pressure from the Pallas kernels, scheduling).

Usage: python scripts/profile_fusion.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import moving_object_detector_tpu.pipeline as pipe
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params
from moving_object_detector_tpu.types import (
    DisparityImage, MovingObjects, StereoModel,
)
from moving_object_detector_tpu.utils.profiling import chain_slope_ms

H, W = 376, 1242
config = PipelineConfig(height=H, width=W)
stereo = StereoModel.create(fx=721.5, fy=721.5, cx=W / 2, cy=H / 2,
                            baseline=0.54)
model = PWCNet(config=config.flownet)
params = init_pwc_params(model, H, W)
rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
right = jnp.asarray(np.roll(np.asarray(left), -8, axis=1))

REAL_SGM = pipe.compute_disparity
REAL_CLUSTER = pipe.cluster_scene_flow
REAL_MOTION = pipe.estimate_motion

disp_const = jnp.full((H, W), 8.0, jnp.float32)


def stub_sgm(l, r, st, cfg):
    return DisparityImage.create(
        disp_const + l[0, 0] * 1e-20, f=st.cam.fx, t=st.baseline,
        min_disparity=0.0, max_disparity=float(cfg.max_disparity - 1),
    )


def stub_cluster(cloud, cfg, dynamic_speed=None, depth_diff=None,
                 cluster_size=None):
    cap = cfg.max_objects
    h, w = cloud.points.shape[:2]
    z = cloud.points[..., 2].ravel()[0] * 1e-20
    return (
        MovingObjects(
            id=jnp.full((cap,), -1, jnp.int32),
            center=jnp.zeros((cap, 3)) + z,
            velocity=jnp.zeros((cap, 3)),
            bounding_box=jnp.zeros((cap, 3)),
            valid=jnp.zeros((cap,), bool),
        ),
        jnp.full((h, w), -1, jnp.int32),
    )


def stub_motion(prev, now, disp, cam, key, cfg, dense_flow=None):
    m = jnp.eye(4, dtype=jnp.float32)
    extra = 0.0 if dense_flow is None else dense_flow.ravel()[0] * 1e-20
    return m + extra, jnp.bool_(True), jnp.int32(99)


def witness(*trees):
    tot = jnp.float32(0.0)
    for t_ in trees:
        for leaf in jax.tree_util.tree_leaves(t_):
            v = jnp.asarray(leaf, jnp.float32).ravel()[:4]
            tot = tot + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.123))
    return tot * 1e-20


def run(name, sgm=True, cluster=True, motion=True, flow=True):
    pipe.compute_disparity = REAL_SGM if sgm else stub_sgm
    pipe.cluster_scene_flow = REAL_CLUSTER if cluster else stub_cluster
    pipe.estimate_motion = REAL_MOTION if motion else stub_motion
    override = (
        None if flow
        else jnp.asarray(rng.uniform(-8, 8, (H, W, 2)).astype(np.float32))
    )
    state0 = pipe.PipelineState.create(config)

    def step(carry):
        state, acc = carry
        s2, out = pipe.detect_step.__wrapped__(
            params, state, left + acc * 1e-20, right,
            state.prev_time + 0.1, stereo, config, flow_model=model,
            flow_override=override,
        )
        return s2, witness(
            out.disparity.disparity, out.flow, out.scene_flow.velocity,
            out.static_flow, out.detections.center, out.label_image,
            out.tracked.objects.center, out.tracked.covariance, out.motion,
            out.odom_pose,
        )

    dt = chain_slope_ms(step, (state0, jnp.float32(0.0)), 12, 60)
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


import sys as _sys

if "--pairs" in _sys.argv:
    # Pairwise rows: which coexisting stage doubles the flow net's cost?
    run("flow + SGM (cluster+ego stubbed)", cluster=False, motion=False)
    run("flow + cluster (sgm+ego stubbed)", sgm=False, motion=False)
    run("flow + ego (sgm+cluster stubbed)", sgm=False, cluster=False)
    run("flow ONLY (sgm+cluster+ego stubbed)", sgm=False, cluster=False,
        motion=False)
else:
    run("FULL (all real)")
    run("- flow net (override=rand8)", flow=False)
    run("- SGM (const disparity)", sgm=False)
    run("- clusterer (stub)", cluster=False)
    run("- ego-motion (identity)", motion=False)
    run("flow ONLY (sgm+cluster+ego stubbed)", sgm=False, cluster=False,
        motion=False)
    run("NOTHING (all stubbed)", sgm=False, cluster=False, motion=False,
        flow=False)
