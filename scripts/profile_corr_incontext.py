"""In-context cost of the correlation backend inside the FULL detect_step.

The standalone comparison (PLAN_NEXT item 5) measured XLA correlation at
0.05 ms and shelved the Pallas kernel — but the op-level trace
(scripts/profile_trace.py) shows the XLA form costs ~4.4 ms/frame inside
the fused program (81 multiply-reduce tuples + an 81-slice concatenate at
flow_ops.py:140-141). This times the whole pipeline with each backend.

Usage: python scripts/profile_corr_incontext.py
"""
import os
import sys
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import (
    PWCNet, init_pwc_params_abstract,
)
from moving_object_detector_tpu.pipeline import PipelineState, detect_step
from moving_object_detector_tpu.types import StereoModel
from moving_object_detector_tpu.utils.checkpoint import (
    resolve_flow_checkpoint, restore_flow_params,
)
from moving_object_detector_tpu.utils.profiling import chain_slope_ms

H, W = 376, 1242
stereo = StereoModel.create(fx=721.5, fy=721.5, cx=W / 2, cy=H / 2,
                            baseline=0.54)

from moving_object_detector_tpu.io.readers import SyntheticStereoSequence

seq = SyntheticStereoSequence(height=H, width=W, n_frames=1)
fl, fr, _, _ = seq.frame(0)
left = jnp.asarray(fl.astype(np.float32))
right = jnp.asarray(fr.astype(np.float32))


def witness(*trees):
    tot = jnp.float32(0.0)
    for t_ in trees:
        for leaf in jax.tree_util.tree_leaves(t_):
            v = jnp.asarray(leaf).astype(jnp.float32)
            tot = tot + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.123)) * 1e-6
    return tot * 1e-14


def run(name, corr_backend):
    config = PipelineConfig(height=H, width=W)
    config = dataclasses.replace(
        config,
        flownet=dataclasses.replace(config.flownet, corr_backend=corr_backend),
    )
    model = PWCNet(config=config.flownet)
    ckpt = resolve_flow_checkpoint("auto")
    params = restore_flow_params(ckpt, like=init_pwc_params_abstract(model))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state0 = PipelineState.create(config)

    def step(carry):
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

    dt = chain_slope_ms(step, (state0, jnp.float32(0.0)), 12, 60)
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


run("FULL, corr_backend=xla", "xla")
run("FULL, corr_backend=pallas", "pallas")
