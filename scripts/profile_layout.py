"""Measure the (H, W, 3) channel-minor layout tax on dense cloud math.

Hypothesis: scene-flow construct (~1.8 ms) and parts of the clusterer are
dominated not by arithmetic but by XLA padding the minormost size-3 channel
dim to 128 lanes (43x memory inflation per pass over a (376,1242,3) f32
array). If true, channel-major (3, H, W) / separate-plane layouts should be
~10-40x faster for the same math, and the scene-flow/clusterer contract
should switch to planes.

Methodology: chained slope (outputs feed a carried accumulator, final
scalar fetched) — see PLAN_NEXT.md "bench honesty".
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 376, 1242
ITERS = 60


def timed(name, fn, *args):
    fn2 = jax.jit(fn)
    out = fn2(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn2(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    # chained: run ITERS dependent iterations inside one jit
    def chain(x):
        def body(c, _):
            r = fn(*((c,) + args[1:]))
            # fold every output leaf back into the carry
            leaves = jax.tree_util.tree_leaves(r)
            add = sum(jnp.sum(jnp.nan_to_num(l.astype(jnp.float32))) for l in leaves)
            return c + 1e-20 * add, ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    ch = jax.jit(chain)
    x0 = args[0]
    r = ch(x0); jax.block_until_ready(r)
    t2 = time.perf_counter()
    r = ch(x0); jax.block_until_ready(r)
    t3 = time.perf_counter()
    print(f"{name:48s} {1e3*(t3-t2)/ITERS:7.3f} ms/iter   (eager3 {1e3*(t1-t0)/3:.3f})")


def main():
    key = jax.random.PRNGKey(0)
    pts_hw3 = jax.random.normal(key, (H, W, 3), jnp.float32)
    pts_3hw = jnp.transpose(pts_hw3, (2, 0, 1)).copy()
    tf = jnp.eye(4, dtype=jnp.float32)

    # 1. transform_points on (H,W,3): R@p + t
    def tx_hw3(p, tf):
        return p @ tf[:3, :3].T + tf[:3, 3]

    # 2. same math channel-major: three planes
    def tx_3hw(p, tf):
        x, y, z = p[0], p[1], p[2]
        R, t = tf[:3, :3], tf[:3, 3]
        return jnp.stack([
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0],
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1],
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2],
        ])

    # 3. pure elementwise pass over (H,W,3) (no matmul): scale+bias
    def ew_hw3(p):
        return p * 1.000001 + 0.5

    def ew_3hw(p):
        return p * 1.000001 + 0.5

    # 4. norm over channel dim (the clusterer's dynamic map)
    def norm_hw3(p):
        return jnp.sqrt(jnp.sum(p * p, axis=-1))

    def norm_3hw(p):
        return jnp.sqrt(p[0] ** 2 + p[1] ** 2 + p[2] ** 2)

    # 5. plain (H, W) elementwise for the bandwidth floor
    plane = pts_hw3[..., 0].copy()

    def ew_hw(p):
        return p * 1.000001 + 0.5

    print(f"arrays: (H,W,3)={H}x{W}x3 f32 = {H*W*3*4/1e6:.1f} MB logical")
    timed("elementwise (H,W) plane [floor]", ew_hw, plane)
    timed("elementwise (H,W,3)", ew_hw3, pts_hw3)
    timed("elementwise (3,H,W)", ew_3hw, pts_3hw)
    timed("transform_points (H,W,3) matmul", tx_hw3, pts_hw3, tf)
    timed("transform_points (3,H,W) planes", tx_3hw, pts_3hw, tf)
    timed("channel norm (H,W,3)", norm_hw3, pts_hw3)
    timed("channel norm (3,H,W)", norm_3hw, pts_3hw)

    # 6. the real construct for attribution, both backends
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.sceneflow import construct_scene_flow
    from moving_object_detector_tpu.types import CameraModel, DisparityImage
    from moving_object_detector_tpu.ops import geometry

    cam = CameraModel(fx=721.0, fy=721.0, cx=W / 2, cy=H / 2)
    disp = jnp.clip(jax.random.uniform(key, (H, W)) * 100 + 5, 1, 127)
    dimg = DisparityImage(
        disparity=disp, f=721.0, t=0.54, min_disparity=0.0,
        max_disparity=128.0,
    )
    flow = jax.random.normal(key, (H, W, 2)) * 3.0
    pts_now = geometry.disparity_to_points(dimg, cam)
    cfg = PipelineConfig(height=H, width=W)

    import dataclasses

    def timed_scalar_chain(name, fn):
        """Chain on a SCALAR carry that perturbs every input per iteration:
        nothing hoists, nothing dead-codes, carry traffic is zero."""
        def chain(s):
            def body(c, _):
                out = fn(c)
                leaves = jax.tree_util.tree_leaves(out)
                add = sum(
                    jnp.sum(jnp.nan_to_num(l.astype(jnp.float32)))
                    for l in leaves
                )
                return c + 1e-24 * add, ()
            c, _ = jax.lax.scan(body, s, None, length=ITERS)
            return c
        ch = jax.jit(chain)
        r = ch(jnp.float32(0.0)); jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = ch(jnp.float32(0.0)); jax.block_until_ready(r)
        t1 = time.perf_counter()
        print(f"{name:48s} {1e3*(t1-t0)/ITERS:7.3f} ms/iter")

    def construct(s, backend):
        c = dataclasses.replace(cfg.scene_flow, gather_backend=backend)
        fl = flow + s
        dn = dataclasses.replace(dimg, disparity=disp + s)
        dp = dataclasses.replace(dimg, disparity=disp + 0.5 * s)
        pn = geometry.disparity_to_points(dn, cam)
        cloud, sf = construct_scene_flow(
            pn, pn, fl, dn, dp, cam,
            jnp.float32(0.1), jnp.float32(5.0), jnp.eye(4), config=c,
        )
        return cloud.points, cloud.velocity, sf

    timed_scalar_chain("construct+backproject [xla gather]",
                       lambda s: construct(s, "xla"))
    timed_scalar_chain("construct+backproject [pallas gather]",
                       lambda s: construct(s, "pallas"))
    timed_scalar_chain("construct+backproject [fused]",
                       lambda s: construct(s, "fused"))

    # --- sub-stage attribution (each includes the backproject it needs) ---
    from moving_object_detector_tpu.sceneflow import static_optical_flow
    from moving_object_detector_tpu.ops.gather_pallas import (
        window_gather_pallas,
    )

    def backproject_only(s):
        dn = dataclasses.replace(dimg, disparity=disp + s)
        return geometry.disparity_to_points(dn, cam)

    def static_flow_only(s):
        pts = backproject_only(s)
        return static_optical_flow(
            geometry.transform_points(jnp.eye(4), pts), cam
        )

    def gather_only(s):
        fl = flow + s
        u, v = geometry.pixel_grid(H, W)
        up = jnp.round(u - fl[..., 0]).astype(jnp.int32)
        vp = jnp.round(v - fl[..., 1]).astype(jnp.int32)
        return window_gather_pallas(disp + s, vp, up, v_radius=16,
                                    h_radius=128)

    timed_scalar_chain("  sub: backproject (H,W,3)", backproject_only)
    timed_scalar_chain("  sub: backproject+transform+project(static flow)",
                       static_flow_only)
    timed_scalar_chain("  sub: windowed pallas gather", gather_only)


if __name__ == "__main__":
    main()
