"""Honest per-stage timing of detect_step's components on the real chip.

Each stage is chained with its outputs folded back into its inputs through
a tiny-but-nonzero witness (x + 1e-20 * probe(outputs)), so XLA cannot
dead-code-eliminate any part of the stage (the trap the original bench.py
fell into — see bench.py docstring).

Usage: python scripts/profile_pipeline.py [n1 n2]
Env: MODT_FLOW_SCALE / MODT_SGM_SCALE (default 1) profile the serving
operating point (bench auto = 2/2 with scale-2-gated weights).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params
from moving_object_detector_tpu.types import StereoModel
from moving_object_detector_tpu.utils.profiling import chain_slope_ms

H, W = 376, 1242
N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 12
N2 = int(sys.argv[2]) if len(sys.argv) > 2 else 60
FLOW_SCALE = int(os.environ.get("MODT_FLOW_SCALE", "1"))
SGM_SCALE = int(os.environ.get("MODT_SGM_SCALE", "1"))

config = PipelineConfig(height=H, width=W, flow_input_scale=FLOW_SCALE,
                        sgm_input_scale=SGM_SCALE)
print(f"# operating point: flow_input_scale={FLOW_SCALE} "
      f"sgm_input_scale={SGM_SCALE}", flush=True)
stereo = StereoModel.create(fx=721.5, fy=721.5, cx=W / 2, cy=H / 2,
                            baseline=0.54)
cam = stereo.cam
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint,
    resolve_flow_checkpoint,
)

_ckpt = resolve_flow_checkpoint(os.environ.get("MODT_FLOW_CKPT", "auto"))
if _ckpt:
    import dataclasses

    _params, _flow_cfg = load_flow_checkpoint(_ckpt, config.flownet)
    config = dataclasses.replace(config, flownet=_flow_cfg)
    model = PWCNet(config=_flow_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, _params)
    print(f"# flow weights: {_ckpt}", flush=True)
else:
    model = PWCNet(config=config.flownet)
    params = init_pwc_params(model, H, W)
    print("# flow weights: random init", flush=True)

rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
right = jnp.asarray(np.roll(np.asarray(left), -8, axis=1))
prev_left = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def witness(*trees):
    tot = jnp.float32(0.0)
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            v = jnp.asarray(leaf, jnp.float32).ravel()[:4]
            tot = tot + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.123))
    return tot * 1e-20


def t(name, step, init):
    dt = chain_slope_ms(step, init, N1, N2)
    print(f"{name:40s} {dt:8.3f} ms", flush=True)
    return dt


# --- SGM (through _sgm_forward so sgm_input_scale is honored) ---
from moving_object_detector_tpu.pipeline import _sgm_forward

def sgm_step(carry):
    l, r = carry
    d = _sgm_forward(l, r, stereo, config)
    return l + witness(d.disparity), r

t(f"SGM disparity (pallas v2, 1/{SGM_SCALE})", sgm_step, (left, right))

# --- Flow forward ---
from moving_object_detector_tpu.pipeline import _flow_forward

def flow_step(carry):
    p, n = carry
    f = _flow_forward(params, model, p, n, input_scale=FLOW_SCALE)
    return p + witness(f), n

t(f"PWC-Net flow fwd (1/{FLOW_SCALE})", flow_step, (prev_left, left))

# --- Ego-motion ---
from moving_object_detector_tpu.egomotion import estimate_motion
from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.types import DisparityImage

disp = DisparityImage.create(
    jnp.full((H, W), 8.0, jnp.float32), f=cam.fx, t=0.54,
    min_disparity=0.0, max_disparity=127.0,
)
flow_const = jnp.zeros((H, W, 2), jnp.float32)

def ego_step(carry):
    p, n = carry
    m, ok, _ = estimate_motion(
        p, n, disp, cam, jax.random.PRNGKey(0), config.egomotion,
        dense_flow=flow_const if config.egomotion.use_dense_flow else None,
    )
    return p + witness(m, ok), n

t("ego-motion (RANSAC+GN)", ego_step, (prev_left, left))

# --- Scene flow construction (incl. the back-projections detect_step
# does around it) ---
from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.sceneflow import construct_scene_flow

motion = jnp.eye(4, dtype=jnp.float32)

def scene_step(carry):
    d_now, d_prev, flow = carry
    disp_now = DisparityImage.create(d_now, f=cam.fx, t=0.54,
                                     min_disparity=0.0, max_disparity=127.0)
    disp_prev = DisparityImage.create(d_prev, f=cam.fx, t=0.54,
                                      min_disparity=0.0, max_disparity=127.0)
    pts_now = geometry.disparity_to_points(disp_now, cam)
    pts_prev = geometry.transform_points(
        motion, geometry.disparity_to_points(disp_prev, cam)
    )
    cloud, static_flow = construct_scene_flow(
        pts_now, pts_prev, flow, disp_now, disp_prev, cam,
        jnp.float32(0.1), jnp.float32(5.0), transform_prev2now=motion,
    )
    return d_now + witness(cloud, static_flow), d_prev, flow

t("scene-flow construct (+backproject)", scene_step,
  (jnp.full((H, W), 8.0), jnp.full((H, W), 8.0),
   jnp.zeros((H, W, 2), jnp.float32)))

# --- Clusterer (busy scene: a moving block) ---
from moving_object_detector_tpu.clusterer import cluster_scene_flow
from moving_object_detector_tpu.types import SceneFlowCloud

pts = np.full((H, W, 3), np.nan, np.float32)
vel = np.zeros((H, W, 3), np.float32)
yy, xx = np.mgrid[0:H, 0:W]
pts[..., 0] = (xx - W / 2) / cam.fx * 8.0
pts[..., 1] = (yy - H / 2) / cam.fx * 8.0
pts[..., 2] = 8.0
for (y0, x0) in [(50, 200), (180, 700), (250, 1000)]:
    vel[y0:y0 + 80, x0:x0 + 120] = [1.0, 0, 0]
cloud0 = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))

def cluster_step(carry):
    p, v = carry
    objs, labels = cluster_scene_flow(
        SceneFlowCloud(points=p, velocity=v), config.clusterer
    )
    return p + witness(objs, labels), v

t("clusterer (3 objects)", cluster_step, (cloud0.points, cloud0.velocity))

# --- Tracker ---
from moving_object_detector_tpu.tracker import TrackerState, track_step
from moving_object_detector_tpu.types import MovingObjects

cap = config.clusterer.max_objects
dets = MovingObjects(
    id=jnp.arange(cap, dtype=jnp.int32),
    center=jnp.asarray(rng.uniform(-5, 5, (cap, 3)).astype(np.float32)),
    velocity=jnp.zeros((cap, 3), jnp.float32),
    bounding_box=jnp.ones((cap, 3), jnp.float32),
    valid=jnp.arange(cap) < 3,
)
tstate0 = TrackerState.create(config.tracker.max_tracks)

def tracker_step(carry):
    ts, t_now = carry
    ts2, out = track_step(ts, t_now, dets, config.tracker)
    return ts2, t_now + 0.1 + witness(out)

t("tracker (predict+correct+publish)", tracker_step,
  (tstate0, jnp.float32(0.0)))

# --- FULL detect_step (bench-equivalent): where does the sum-of-stages
# gap go? Ablations flip one stage to a cheap stand-in at a time. ---
from moving_object_detector_tpu.pipeline import PipelineState, detect_step

state0 = PipelineState.create(config)


def full_step(carry):
    state, acc = carry
    s2, out = detect_step(
        params, state, left + acc * 1e-20, right, state.prev_time + 0.1,
        stereo, config, flow_model=model,
    )
    return s2, witness(
        out.disparity.disparity, out.flow, out.scene_flow.velocity,
        out.static_flow, out.detections.center, out.label_image,
        out.tracked.objects.center, out.tracked.covariance, out.motion,
        out.odom_pose,
    )


t("FULL detect_step (quiet frames)", full_step, (state0, jnp.float32(0.0)))


def full_step_oracle_flow(carry):
    state, acc = carry
    s2, out = detect_step(
        params, state, left + acc * 1e-20, right, state.prev_time + 0.1,
        stereo, config, flow_model=model, flow_override=flow_const,
    )
    return s2, witness(
        out.disparity.disparity, out.flow, out.scene_flow.velocity,
        out.static_flow, out.detections.center, out.label_image,
        out.tracked.objects.center, out.tracked.covariance, out.motion,
        out.odom_pose,
    )


t("FULL detect_step (flow_override=0)", full_step_oracle_flow,
  (state0, jnp.float32(0.0)))

flow_rand = jnp.asarray(
    rng.uniform(-8, 8, (H, W, 2)).astype(np.float32)
)


def full_step_rand_flow(carry):
    state, acc = carry
    s2, out = detect_step(
        params, state, left + acc * 1e-20, right, state.prev_time + 0.1,
        stereo, config, flow_model=model, flow_override=flow_rand,
    )
    return s2, witness(
        out.disparity.disparity, out.flow, out.scene_flow.velocity,
        out.static_flow, out.detections.center, out.label_image,
        out.tracked.objects.center, out.tracked.covariance, out.motion,
        out.odom_pose,
    )


t("FULL detect_step (flow_override=rand8)", full_step_rand_flow,
  (state0, jnp.float32(0.0)))
