"""Per-stage SGM timing on the real chip (chained steps, one jit per stage).

Usage: python scripts/profile_sgm.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from moving_object_detector_tpu.ops import sgm
from moving_object_detector_tpu.ops.sgm_pallas import (
    aggregate_cost_volume_pallas, wta_disparity_pallas, _dual_scan,
    _pad_axis, _block_len, _BLK_W, _BLK_H, _SUB,
)

H, W, D = 376, 1242, 128
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timed(name, fn, *args):
    f = jax.jit(lambda *a: fn(*a))
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return out


def timed_chain(name, step, init, n=REPS):
    """Time a jitted lax.fori_loop chain of ``step`` to drown dispatch."""
    def run(x):
        return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)
    f = jax.jit(run)
    jax.block_until_ready(f(init))
    t0 = time.perf_counter()
    jax.block_until_ready(f(init))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.3f} ms   (chained x{n})")


key = jax.random.PRNGKey(0)
left = jax.random.uniform(key, (H, W), jnp.float32)
right = jnp.roll(left, -9, axis=1)

cl = timed("census L", sgm.census_transform, left)
cr = timed("census R", sgm.census_transform, right)
vol_dhw = timed("hamming cost (D,H,W) i8",
                lambda a, b: sgm.hamming_cost_volume_dhw(a, b, D), cl, cr)

eye = jnp.eye(D, dtype=jnp.bfloat16)
cost_hwd = timed(
    "MXU relayout -> (H,W,D) f32",
    lambda v: jnp.einsum("dhw,de->hwe", v.astype(jnp.bfloat16), eye,
                         preferred_element_type=jnp.float32), vol_dhw)
cost_whd = timed(
    "MXU relayout -> (W,H,D) f32",
    lambda v: jnp.einsum("dhw,de->whe", v.astype(jnp.bfloat16), eye,
                         preferred_element_type=jnp.float32), vol_dhw)

# Padded int8 volumes as the DP kernels see them.
ci8 = jnp.clip(cost_hwd, 0, 127).astype(jnp.int8)
ci8 = _pad_axis(_pad_axis(ci8, 0, _SUB, 127), 1, _SUB, 127)
ct8 = jnp.clip(cost_whd, 0, 127).astype(jnp.int8)
ct8 = _pad_axis(_pad_axis(ct8, 0, _SUB, 127), 1, _SUB, 127)
hp, wp = ci8.shape[:2]
print(f"padded: {hp}x{wp}, blk_w={_block_len(wp, _BLK_W)}, "
      f"blk_h={_block_len(hp, _BLK_H)}")

hsum_t = timed("DP dual scan W (pallas)",
               lambda v: _dual_scan(v, _block_len(wp, _BLK_W), 10, 120, False),
               ct8)
vsum = timed("DP dual scan H (pallas)",
             lambda v: _dual_scan(v, _block_len(hp, _BLK_H), 10, 120, False),
             ci8)
hsum = timed("transpose hsum (W,H,D)->(H,W,D) i16",
             lambda v: jnp.transpose(v, (1, 0, 2)), hsum_t)
total = timed("total = h + v (i16)",
              lambda a, b: (a.astype(jnp.int32) + b.astype(jnp.int32))
              .astype(jnp.int16), hsum, vsum)
total_c = total[:H, :W]
timed("WTA fused (pallas, incl transpose)",
      lambda t: wta_disparity_pallas(t, True, True, 1.0), total_c)

from moving_object_detector_tpu.config import SGMConfig
from moving_object_detector_tpu.types import StereoModel
st = StereoModel.create(fx=721.5, fy=721.5, cx=W / 2, cy=H / 2, baseline=0.54)

def full(li):
    d = sgm.compute_disparity(li, right, st, SGMConfig(backend="pallas"))
    return li + d.disparity[0, 0] * 0  # keep li shape for chaining

timed_chain("FULL SGM (chained)", full, left)
