"""Per-stage PWC-Net flow timing on the real chip (chained slope timing).

Breaks the flow net into pyramid / per-level warp / per-level correlation /
estimator / context / resize so kernel work can be targeted.

Usage: python scripts/profile_flow.py [reps]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from moving_object_detector_tpu.config import FlowNetConfig
from moving_object_detector_tpu.models.pwc_net import (
    ContextNetwork, FeaturePyramid, FlowEstimator, PWCNet, init_pwc_params,
)
from moving_object_detector_tpu.ops import flow_ops
from moving_object_detector_tpu.utils.profiling import chain_slope_ms, consume

H, W = 376, 1242
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def t(name, step, init, n=REPS):
    dt = chain_slope_ms(step, init, n, 6 * n)
    print(f"{name:44s} {dt:8.3f} ms   (slope x{n}->x{6 * n})", flush=True)
    return dt


cfg = FlowNetConfig()
model = PWCNet(config=cfg)
key = jax.random.PRNGKey(0)
params = init_pwc_params(model, H, W, key)
img1 = jax.random.uniform(key, (1, H, W, 1), jnp.float32)
img2 = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 1), jnp.float32)

pyr = FeaturePyramid(cfg.feature_channels, dtype=jnp.bfloat16)
pyr_params = {"params": params["params"]["FeaturePyramid_0"]}

t("FULL PWCNet fwd", lambda x: consume(x, model.apply(params, x, img2)[0]),
  img1)
t("feature pyramid (1 image)",
  lambda x: consume(x, pyr.apply(pyr_params, x.astype(jnp.bfloat16))), img1)

feats = jax.jit(lambda x: pyr.apply(pyr_params, x.astype(jnp.bfloat16)))(img1)
for lvl in range(2, len(feats)):
    f = feats[lvl]
    b, h, w, c = f.shape
    flow0 = jnp.zeros((b, h, w, 2), jnp.bfloat16) + 1.7

    t(f"warp lvl{lvl} ({h}x{w}x{c})",
      lambda v, f=f: consume(v, flow_ops.warp(f, v)), flow0)
    t(f"correlation lvl{lvl} ({h}x{w}x{c})",
      lambda v, f=f: consume(v, flow_ops.correlation(
          f.astype(jnp.float32),
          (f + v[..., :1].astype(f.dtype)).astype(jnp.float32), 4)), flow0)

flow_q = jnp.zeros((1, feats[2].shape[1], feats[2].shape[2], 2), jnp.float32)
t("resize flow q-res -> full bilinear",
  lambda v: consume(v, flow_ops.resize_bilinear(v, (H, W))), flow_q)

est = FlowEstimator(dtype=jnp.bfloat16)
xin = jax.random.uniform(
    key, (1, feats[2].shape[1], feats[2].shape[2], 149), jnp.bfloat16)
est_params = est.init(key, xin)
t("FlowEstimator finest (149ch in)",
  lambda v: consume(v, est.apply(est_params, v)[1]), xin)

ctx = ContextNetwork(dtype=jnp.bfloat16)
featx = jax.random.uniform(
    key, (1, feats[2].shape[1], feats[2].shape[2], 497), jnp.bfloat16)
ctx_params = ctx.init(key, featx, flow_q)
t("ContextNetwork finest (497ch in)",
  lambda v: consume(v, ctx.apply(ctx_params, v, flow_q)), featx)
