"""Pallas TPU kernel: the ENTIRE scene-flow construct in one pass.

The composite scene-flow stage (sceneflow.construct_scene_flow) is one
windowed Pallas gather plus ~30 XLA elementwise ops over five W*H inputs
(two disparities, flow, two derived clouds). Its data volume is ~35 MB/frame
— a ~0.05 ms bandwidth floor — yet the stage measures 1.7 ms: the gather
custom-call splits the graph into several multi-output fusions, each
re-reading its inputs from HBM, and the two (H, W, 3) cloud intermediates
(back-projection + SE(3) transform in pipeline.py) are materialized.

This kernel computes the whole construct per (8, 128) tile in VMEM:

* back-project the current disparity (disparity_to_points semantics,
  disparity_image_processor.cpp:86-103),
* back-project + transform + project the previous disparity at the OWN
  pixel -> synthetic static flow (calculateStaticOpticalFlow,
  scene_flow_constructor.cpp:65-89),
* windowed gather of the previous disparity at the backward-flow-matched
  pixel (getPreviousPoint, scene_flow_constructor.h:195-214) — the same
  tile loop as ops/gather_pallas.py,
* the full getMatchPoints validity chain + dynamic test + velocity
  (constructVelocityPC, scene_flow_constructor.cpp:149-212).

Inputs touched once, outputs written once: d_now, d_prev, flow in; points,
velocity, static flow out. Semantics identical to construct_scene_flow with
the pallas gather backend (NaN = invalid everywhere; matches beyond the
window radii degrade to "no velocity", as out-of-image matches do in the
reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# params vector layout (f32, SMEM)
_CAM_FX, _CAM_FY, _CAM_CX, _CAM_CY = 0, 1, 2, 3
_NOW_F, _NOW_T, _NOW_MIN, _NOW_MAX = 4, 5, 6, 7
_PRV_F, _PRV_T, _PRV_MIN, _PRV_MAX = 8, 9, 10, 11
_T00 = 12  # 12..23: T_prev2now rows (r00 r01 r02 tx / r10.. ty / r20.. tz)
_DT, _DYN, _VZ = 24, 25, 26
_NPAR = 27


def _fused_kernel(
    d_now_ref, d_prev_ref, fx_ref, fy_ref, par_ref,
    px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref, sx_ref, sy_ref,
    *, h, w, nbh, nbw, rg_span, rt_span,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    p = lambda k: par_ref[k]
    cfx, cfy, ccx, ccy = p(_CAM_FX), p(_CAM_FY), p(_CAM_CX), p(_CAM_CY)
    r00, r01, r02, tx = p(_T00), p(_T00 + 1), p(_T00 + 2), p(_T00 + 3)
    r10, r11, r12, ty = p(_T00 + 4), p(_T00 + 5), p(_T00 + 6), p(_T00 + 7)
    r20, r21, r22, tz = p(_T00 + 8), p(_T00 + 9), p(_T00 + 10), p(_T00 + 11)
    nan = jnp.float32(jnp.nan)

    u = (j * 128 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)).astype(
        jnp.float32
    )
    v = (i * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)).astype(
        jnp.float32
    )

    def backproject(d, f, t, dmin, dmax, uu, vv):
        """disparity -> (x, y, z, valid): z = f*t/d, NaN when invalid/zero
        (disparity_to_depth + disparity_to_points semantics)."""
        valid = (
            jnp.isfinite(d) & (d >= dmin) & (d <= dmax) & (d != 0.0)
        )
        z = jnp.where(valid, f * t / d, nan)
        x = (uu - ccx) / cfx * z
        y = (vv - ccy) / cfy * z
        return x, y, z

    def transform(x, y, z):
        return (
            r00 * x + r01 * y + r02 * z + tx,
            r10 * x + r11 * y + r12 * z + ty,
            r20 * x + r21 * y + r22 * z + tz,
        )

    # --- Current cloud (own pixel). ---
    d_now = d_now_ref[...]
    pnx, pny, pnz = backproject(
        d_now, p(_NOW_F), p(_NOW_T), p(_NOW_MIN), p(_NOW_MAX), u, v
    )
    valid_now = jnp.isfinite(pnx)

    # --- Static flow: previous disparity at the OWN pixel, transformed and
    # projected (z <= 0 -> NaN, geometry.project_points). ---
    d_prev_own = d_prev_ref[pl.ds(i * 8, 8), pl.ds(j * 128, 128)]
    pox, poy, poz = backproject(
        d_prev_own, p(_PRV_F), p(_PRV_T), p(_PRV_MIN), p(_PRV_MAX), u, v
    )
    ptx, pty, ptz = transform(pox, poy, poz)
    safe_z = jnp.where(ptz <= 0.0, nan, ptz)
    static_x = (cfx * ptx / safe_z + ccx) - u
    static_y = (cfy * pty / safe_z + ccy) - v
    static_ok = jnp.isfinite(static_x)

    # --- Backward-flow match + windowed gather of d_prev. ---
    fxv = fx_ref[...]
    fyv = fy_ref[...]
    flow_finite = jnp.isfinite(fxv) & jnp.isfinite(fyv)
    sfx = jnp.where(flow_finite, fxv, 0.0)
    sfy = jnp.where(flow_finite, fyv, 0.0)
    up = jnp.round(u - sfx).astype(jnp.int32)
    vp = jnp.round(v - sfy).astype(jnp.int32)
    upm = jnp.where((up >= 0) & (up < w), up, -1)
    vpm = jnp.where((vp >= 0) & (vp < h), vp, -1)
    d_prev_m = jnp.full((8, 128), nan, jnp.float32)
    for rg in range(-rg_span, rg_span + 1):
        gb = 8 * jnp.clip(i + rg, 0, nbh - 1)
        for rt in range(-rt_span, rt_span + 1):
            tb = 128 * jnp.clip(j + rt, 0, nbw - 1)
            tile = d_prev_ref[pl.ds(gb, 8), pl.ds(tb, 128)]
            li = upm - tb
            ok_l = (li >= 0) & (li < 128)
            li_c = jnp.clip(li, 0, 127)
            for sr in range(8):
                bc = jnp.broadcast_to(tile[sr : sr + 1, :], (8, 128))
                g = jnp.take_along_axis(bc, li_c, axis=1)
                hit = (vpm == gb + sr) & ok_l
                d_prev_m = jnp.where(hit, g, d_prev_m)

    # --- Match-chain gates (getMatchPoints, scene_flow_constructor.h:
    # 173-227), mirroring sceneflow.construct_scene_flow exactly. ---
    right_now_ok = (
        jnp.isfinite(d_now)
        & (d_now >= p(_NOW_MIN))
        & (d_now <= p(_NOW_MAX))
        & (d_now >= 0.0)
    )
    right_prev_ok = (
        jnp.isfinite(d_prev_m)
        & (d_prev_m >= p(_PRV_MIN))
        & (d_prev_m <= p(_PRV_MAX))
        & (d_prev_m >= 0.0)
    )
    match_ok = flow_finite & right_now_ok & right_prev_ok

    prev_point_ok = right_prev_ok & (d_prev_m != 0.0)
    safe_d = jnp.where(prev_point_ok, d_prev_m, 1.0)
    z_prev = p(_PRV_F) * p(_PRV_T) / safe_d
    x_prev = (up.astype(jnp.float32) - ccx) / cfx * z_prev
    y_prev = (vp.astype(jnp.float32) - ccy) / cfy * z_prev
    qx, qy, qz = transform(x_prev, y_prev, z_prev)

    have_velocity = valid_now & match_ok & prev_point_ok & static_ok

    fdx = fxv - static_x
    fdy = fyv - static_y
    diff_norm = jnp.sqrt(fdx * fdx + fdy * fdy)
    is_dynamic = diff_norm >= p(_DYN)  # NaN compares False: static

    dt = p(_DT)
    # Disparity-rate dynamic test (SceneFlowConfig.dynamic_disparity_rate;
    # 0 = off, NaN compares False): same OR as construct_scene_flow.
    d_pred = jnp.where(
        qz > 0.0, p(_NOW_F) * p(_NOW_T) / jnp.maximum(qz, 1e-6), nan
    )
    ddot = jnp.abs(d_now - d_pred) / dt
    is_dynamic = is_dynamic | ((p(_VZ) > 0.0) & (ddot >= p(_VZ)))
    vx = jnp.where(is_dynamic, (pnx - qx) / dt, 0.0)
    vy = jnp.where(is_dynamic, (pny - qy) / dt, 0.0)
    vz = jnp.where(is_dynamic, (pnz - qz) / dt, 0.0)

    px_ref[...] = pnx
    py_ref[...] = pny
    pz_ref[...] = pnz
    vx_ref[...] = jnp.where(have_velocity, vx, nan)
    vy_ref[...] = jnp.where(have_velocity, vy, nan)
    vz_ref[...] = jnp.where(have_velocity, vz, nan)
    sx_ref[...] = static_x
    sy_ref[...] = static_y


@functools.partial(
    jax.jit, static_argnames=("v_radius", "h_radius", "interpret")
)
def scene_flow_fused_pallas(
    d_now: jnp.ndarray,
    d_prev: jnp.ndarray,
    flow: jnp.ndarray,
    params: jnp.ndarray,
    v_radius: int = 16,
    h_radius: int = 128,
    interpret: bool = False,
):
    """Run the fused construct. ``params`` is the (_NPAR,) f32 vector built
    by pack_params. Returns (points (H,W,3), velocity (H,W,3),
    static_flow (H,W,2))."""
    h, w = d_now.shape
    ph = (-h) % 8
    pw = (-w) % 128
    if ph or pw:
        padnan = lambda a: jnp.pad(
            a, ((0, ph), (0, pw)), constant_values=jnp.nan
        )
        d_now = padnan(d_now)
        d_prev = padnan(d_prev)
        flow = jnp.pad(
            flow, ((0, ph), (0, pw), (0, 0)), constant_values=jnp.nan
        )
    hp, wp = d_now.shape
    nbh, nbw = hp // 8, wp // 128
    rg_span = -(-v_radius // 8)
    rt_span = -(-h_radius // 128)

    tile = lambda: pl.BlockSpec(
        (8, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    plane = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _fused_kernel, h=h, w=w, nbh=nbh, nbw=nbw,
            rg_span=rg_span, rt_span=rt_span,
        ),
        grid=(nbh, nbw),
        in_specs=[
            tile(),  # d_now
            pl.BlockSpec((hp, wp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # d_prev (whole image)
            tile(),  # flow u
            tile(),  # flow v
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
        ],
        out_specs=[tile() for _ in range(8)],
        out_shape=[plane for _ in range(8)],
        interpret=interpret,
    )(
        d_now.astype(jnp.float32),
        d_prev.astype(jnp.float32),
        flow[..., 0].astype(jnp.float32),
        flow[..., 1].astype(jnp.float32),
        params.astype(jnp.float32),
    )
    px, py, pz, vx, vy, vz, sx, sy = [o[:h, :w] for o in outs]
    points = jnp.stack([px, py, pz], axis=-1)
    velocity = jnp.stack([vx, vy, vz], axis=-1)
    static_flow = jnp.stack([sx, sy], axis=-1)
    return points, velocity, static_flow


def pack_params(
    cam, disparity_now, disparity_prev, transform_prev2now, dt,
    dynamic_flow_diff, dynamic_disparity_rate=0.0,
) -> jnp.ndarray:
    """Assemble the kernel's SMEM parameter vector from traced scalars."""
    t = jnp.asarray(transform_prev2now, jnp.float32)
    vals = [
        cam.fx, cam.fy, cam.cx, cam.cy,
        disparity_now.f, disparity_now.t,
        disparity_now.min_disparity, disparity_now.max_disparity,
        disparity_prev.f, disparity_prev.t,
        disparity_prev.min_disparity, disparity_prev.max_disparity,
        t[0, 0], t[0, 1], t[0, 2], t[0, 3],
        t[1, 0], t[1, 1], t[1, 2], t[1, 3],
        t[2, 0], t[2, 1], t[2, 2], t[2, 3],
        dt, dynamic_flow_diff, dynamic_disparity_rate,
    ]
    assert len(vals) == _NPAR
    return jnp.stack([jnp.asarray(x, jnp.float32) for x in vals])
