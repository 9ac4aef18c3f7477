"""Per-stage SGM v2 timing on the real chip (chained slope measurements).

Usage: python scripts/profile_sgm.py [reps]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from moving_object_detector_tpu.ops import sgm
from moving_object_detector_tpu.ops import sgm_pallas2 as v2
from moving_object_detector_tpu.utils.profiling import chain_slope_ms, consume

H, W, D = 376, 1242, 128
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timed(name, step, init, n=REPS):
    dt = chain_slope_ms(step, init, n, 6 * n)
    print(f"{name:44s} {dt:8.3f} ms   (slope x{n}->x{6 * n})", flush=True)
    return dt


key = jax.random.PRNGKey(0)
left = jax.random.uniform(key, (H, W), jnp.float32)
right = jnp.roll(left, -9, axis=1)

timed("census", lambda x: consume(x, sgm.census_transform(x)), left)

cl = jax.jit(sgm.census_transform)(left)
cr = jax.jit(sgm.census_transform)(right)
clp = v2._pad_to(cl, v2._D, v2._D)
crp = v2._pad_to(cr, v2._D, v2._D)
cl_t, cr_t_rev = clp.T, crp.T[::-1]

timed("horizontal deltas (pallas, 2 dir)",
      lambda c: consume(c, v2.horizontal_deltas(c, cr_t_rev, 10, 120, W)),
      cl_t)
timed("vertical deltas (pallas, 2 dir)",
      lambda c: consume(c, v2.vertical_deltas(c, crp, 10, 120, H)), clp)

hf, hb = jax.jit(lambda c: v2.horizontal_deltas(c, cr_t_rev, 10, 120, W))(
    cl_t)
vf, vb = jax.jit(lambda c: v2.vertical_deltas(c, crp, 10, 120, H))(clp)
timed("v-sum + transpose to (W,D,H) u8",
      lambda v: consume(v, jnp.transpose(
          v.astype(jnp.uint8) + vb.astype(jnp.uint8), (2, 1, 0))), vf)
vt = jax.jit(lambda a, b: jnp.transpose(
    a.astype(jnp.uint8) + b.astype(jnp.uint8), (2, 1, 0)))(vf, vb)
timed("WTA fused (pallas)",
      lambda h: consume(h, v2.wta_from_parts(h, hb, vt, cl_t, cr_t_rev, W)),
      hf)

timed("FULL SGM v2 (census -> disparity)",
      lambda x: consume(x, v2.sgm_disparity_v2(
          sgm.census_transform(x), sgm.census_transform(right))), left)
