"""The fused per-frame detection program.

This module is the TPU-native replacement for the reference's entire ROS
node graph (SURVEY.md §1): what the reference runs as four processes wired
by TCPROS topics — scene_flow_constructor (3 worker threads + a construct
thread), scene_flow_clusterer, moving_object_tracker and the marker
converter — becomes ONE jitted function per frame:

    detect_step(params, state, left, right, t) -> (state', FrameOutput)

The reference's thread fan-out (disparity || ego-motion || optical flow,
scene_flow_constructor.cpp:378-386) becomes three independent subgraphs of
one XLA program, which the compiler schedules concurrently on-chip; the
inter-process PointCloud2 serialization boundaries (SURVEY.md §3.1-3.3)
disappear — everything stays in device memory.

State threading is purely functional: the integrated odometry pose
(scene_flow_constructor.cpp:32,322), previous frame/disparity
(:397-398), and the tracker bank live in a PipelineState pytree carried by
the host loop (or a lax.scan over a frame batch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .clusterer import cluster_scene_flow
from .config import PipelineConfig
from .egomotion import estimate_motion
from .models.pwc_net import PWCNet
from .ops import geometry
from .ops.sgm import compute_disparity
from .sceneflow import construct_scene_flow
from .tracker import TrackerState, track_step
from .types import (
    DisparityImage,
    MovingObjects,
    SceneFlowCloud,
    StereoModel,
    TrackedObjects,
)


@struct.dataclass
class PipelineState:
    """Functional pipeline state (everything the reference kept as node
    member variables)."""

    pose: jnp.ndarray  # (4, 4) odom <- base_link integrated pose
    # (== odom <- camera when stereo.base_from_camera is identity)
    prev_left: jnp.ndarray  # (H, W[, 3]) f32 previous left image
    prev_disparity: DisparityImage  # previous disparity WITH metadata
    prev_time: jnp.ndarray  # () f32
    has_prev: jnp.ndarray  # () bool
    tracker: TrackerState
    frame_index: jnp.ndarray  # () int32

    @classmethod
    def create(cls, config: PipelineConfig) -> "PipelineState":
        h, w = config.height, config.width
        shape = (h, w, 3) if getattr(config, "color", False) else (h, w)
        return cls(
            pose=jnp.eye(4, dtype=jnp.float32),
            prev_left=jnp.zeros(shape, jnp.float32),
            # Placeholder metadata (max<min gates everything invalid);
            # replaced by the real DisparityImage after frame 0, so an
            # override's f/T/min/max survive into the next frame's
            # match chain instead of being rebuilt from config.sgm.
            prev_disparity=DisparityImage.create(
                jnp.full((h, w), -1.0, jnp.float32), f=1.0, t=1.0,
                min_disparity=0.0, max_disparity=-1.0,
            ),
            prev_time=jnp.float32(0.0),
            has_prev=jnp.bool_(False),
            tracker=TrackerState.create(config.tracker.max_tracks),
            frame_index=jnp.int32(0),
        )


@struct.dataclass
class FrameOutput:
    """Everything the reference publishes for one frame (SURVEY.md §2.1):
    disparity/depth, optical + synthetic flow, the scene-flow cloud, raw
    detections (camera frame), tracked objects (odom frame), the TF products
    (per-frame motion and integrated pose), and status flags."""

    disparity: DisparityImage
    flow: jnp.ndarray  # (H, W, 2)
    scene_flow: SceneFlowCloud
    static_flow: jnp.ndarray  # (H, W, 2)
    detections: MovingObjects  # camera frame (clusterer output)
    label_image: jnp.ndarray  # (H, W) int32 compact cluster ids
    tracked: TrackedObjects  # odom frame
    motion: jnp.ndarray  # (4, 4) p_now = M @ p_prev (camera frame)
    odom_pose: jnp.ndarray  # (4, 4) odom <- camera (pose @ base_from_camera)
    ego_success: jnp.ndarray  # () bool
    frame_valid: jnp.ndarray  # () bool: scene flow usable this frame
    # Capacity observability (VERDICT round-3 weak #8 — the reference's
    # per-cluster loops and track list are unbounded,
    # clusterer_nodelet.cpp:354-393; this port's fixed capacities must
    # not truncate SILENTLY):
    # size-passing clusters dropped beyond ClustererConfig.max_objects
    cluster_overflow: jnp.ndarray  # () int32
    # track bank completely full after this frame — further spawn
    # candidates (if any) were dropped; raise TrackerConfig.max_tracks
    tracker_saturated: jnp.ndarray  # () bool


def _pad_to_multiple(img: jnp.ndarray, mult: int):
    h, w = img.shape[0], img.shape[1]
    ph = (-h) % mult
    pw = (-w) % mult
    pad = ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge"), (h, w)


def luma(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB -> (H, W) BT.601 luma; (H, W) passes through. The
    MONO8 conversion the reference applies before viso2
    (scene_flow_constructor.cpp:220-221)."""
    if img.ndim == 2:
        return img
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(img.dtype)


def _adapt_flow_channels(img: jnp.ndarray, c: int) -> jnp.ndarray:
    """Match a frame to the flow weights' input channel count
    (FlowNetConfig.in_channels): (H, W[, C_in]) -> (H, W, c)."""
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == c:
        return img
    if c == 1:
        return luma(img)[..., None]
    if img.shape[-1] == 1:
        return jnp.broadcast_to(img, img.shape[:2] + (c,))
    raise ValueError(f"cannot adapt {img.shape} to {c} flow channels")


def _flow_forward(
    flow_params, flow_model: PWCNet, prev_img, now_img, input_scale: int = 1
):
    """Run the flow net on padded inputs, crop back to the frame size.

    ``input_scale`` > 1 runs the net at 1/input_scale resolution and
    bilinearly rescales the flow back (vectors scaled by input_scale) — the
    serving speed/quality knob analogous to the reference's "crop to run
    fast" operating point (detect_with_zed.launch:10-14), but keeping the
    field of view.
    """
    c = getattr(flow_model.config, "in_channels", 1)
    prev_img = _adapt_flow_channels(prev_img, c)
    now_img = _adapt_flow_channels(now_img, c)
    h0, w0 = prev_img.shape[0], prev_img.shape[1]
    if input_scale > 1:
        hs, ws = h0 // input_scale, w0 // input_scale
        prev_img = jax.image.resize(prev_img, (hs, ws, c), "bilinear")
        now_img = jax.image.resize(now_img, (hs, ws, c), "bilinear")
    mult = 2 ** len(flow_model.config.feature_channels)
    p1, (h, w) = _pad_to_multiple(prev_img, mult)
    p2, _ = _pad_to_multiple(now_img, mult)
    batch1 = p1[None]
    batch2 = p2[None]
    full, _ = flow_model.apply(flow_params, batch1, batch2)
    flow = full[0, :h, :w, :]
    if input_scale > 1:
        flow = edge_aware_flow_upsample(flow, (h0, w0), input_scale)
    return flow


def edge_aware_flow_upsample(flow_s, out_hw, scale: int,
                             smooth_spread_px: float = 1.0):
    """Upsample a 1/``scale``-resolution flow field to ``out_hw``,
    scaling vectors by ``scale``, WITHOUT blending across motion
    boundaries.

    Plain bilinear upsampling invents intermediate velocities along every
    motion boundary: a band of pixels between two oppositely-moving
    objects gets the average of the two motions, which (a) bridges the
    clusterer's sign-consistent window CC so crossing objects merge into
    one cluster (measured 2026-08-21: occlusion scene at
    flow_input_scale=2, center err 3.37 m from the merged cluster), and
    (b) pushes static pixels bordering a mover over the dynamic gate
    (boundary phantom detections in the scale-2 scene matrix).

    Same design as the half-res SGM disparity upsample (_sgm_forward):
    NEAREST everywhere (exact half-res winners, boundary quantized to
    scale-px blocks, no invented values), replaced by the bilinear sample
    only where the local half-res 3x3 flow spread is <=
    ``smooth_spread_px`` (half-res px) in both components. The 3x3
    spread window exactly covers the bilinear support, so a pixel whose
    bilinear sample would mix motions is never marked smooth.
    """
    from .ops import flow_ops

    h0, w0 = out_hw
    hs, ws = flow_s.shape[0], flow_s.shape[1]
    s = int(scale)

    def _nearest_up(x):
        up = jnp.repeat(jnp.repeat(x, s, axis=0), s, axis=1)
        ph, pw = h0 - hs * s, w0 - ws * s
        if ph or pw:
            pad = ((0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 2)
            up = jnp.pad(up, pad, mode="edge")
        return up

    up_n = _nearest_up(flow_s)
    up_b = flow_ops.resize_bilinear(flow_s[None], (h0, w0))[0]

    # 3x3 spread via two reduce_windows (XLA lowers these to fused
    # pooling; the earlier 8x pad+roll form cost ~0.28 ms/frame at the
    # KITTI serving point).
    lo = jax.lax.reduce_window(
        flow_s, jnp.inf, jax.lax.min, (3, 3, 1), (1, 1, 1), "SAME"
    )
    hi = jax.lax.reduce_window(
        flow_s, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME"
    )
    spread = jnp.max(hi - lo, axis=-1)
    smooth = _nearest_up((spread <= smooth_spread_px)[..., None])
    return jnp.where(smooth, up_b, up_n) * float(scale)


def _sgm_forward(
    left, right, stereo: StereoModel, config: "PipelineConfig"
) -> DisparityImage:
    """Run SGM at 1/``config.sgm_input_scale`` resolution and restore a
    full-resolution DisparityImage.

    Upsampling is NEAREST with disparities scaled by the factor: valid
    pixels keep exact half-res winners in full-res units, and the -1
    invalid marker survives bit-exactly (bilinear would blend it into
    neighboring disparities and invent depths along occlusion edges).
    Metadata stays in full-res units (d_full = N * d_half), so the
    downstream DisparityImageProcessor contract
    (disparity_image_processor.cpp:25-27,41-42) is unchanged."""
    from .ops.sgm import disparity_with_metadata, sgm_disparity_raw

    s = config.sgm_input_scale
    if s <= 1:
        return compute_disparity(left, right, stereo, config.sgm)
    h0, w0 = left.shape
    hs, ws = h0 // s, w0 // s
    left_s = jax.image.resize(left, (hs, ws), "bilinear")
    right_s = jax.image.resize(right, (hs, ws), "bilinear")
    disp_s = sgm_disparity_raw(left_s, right_s, config.sgm)
    valid = disp_s >= 0
    disp_s = jnp.where(valid, disp_s * float(s), -1.0)
    # Nearest upsample: y -> y // s with trailing rows/cols replicating
    # the last source pixel when h0 % s != 0. Implemented as repeat +
    # edge-pad: a 2D index gather here costs ~4.4 ms at KITTI res (TPU
    # gathers serialize; see PLAN_NEXT "identity-index gathers") vs
    # ~0.17 ms for the repeat, for identical values.
    def _nearest_up(x):
        up = jnp.repeat(jnp.repeat(x, s, axis=0), s, axis=1)
        ph, pw = h0 - hs * s, w0 - ws * s
        if ph or pw:
            up = jnp.pad(up, ((0, ph), (0, pw)), mode="edge")
        return up

    disp = _nearest_up(disp_s)

    # Edge-aware smoothing of the quantized staircase: on SMOOTH fully-
    # valid surfaces (local half-res disparity spread <= 1 px over the
    # 3x3 support) replace the nearest sample with the valid-weighted
    # bilinear one — recovering most of the subpixel depth accuracy the
    # half-res matcher lost. At depth discontinuities or near invalid
    # pixels the spread/validity gates keep the exact nearest winner, so
    # no disparity is ever invented across an occlusion edge and -1
    # survives bit-exactly.
    vf = valid.astype(jnp.float32)
    num = jax.image.resize(jnp.where(valid, disp_s, 0.0) * vf,
                           (h0, w0), "bilinear")
    den = jax.image.resize(vf, (h0, w0), "bilinear")
    bilin = num / jnp.maximum(den, 1e-6)

    def roll2(x, dy, dx, fill):
        return jnp.roll(
            jnp.pad(x, 1, constant_values=fill), (dy, dx), (0, 1)
        )[1:-1, 1:-1]

    lo = hi = jnp.where(valid, disp_s, jnp.inf)
    hi = jnp.where(valid, disp_s, -jnp.inf)
    all_ok = vf
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            lo = jnp.minimum(lo, roll2(jnp.where(valid, disp_s, jnp.inf),
                                       dy, dx, jnp.inf))
            hi = jnp.maximum(hi, roll2(jnp.where(valid, disp_s, -jnp.inf),
                                       dy, dx, -jnp.inf))
            all_ok = all_ok * roll2(vf, dy, dx, 0.0)
    smooth_s = (all_ok > 0.5) & ((hi - lo) <= float(s))
    smooth = _nearest_up(smooth_s)
    disp = jnp.where(smooth & (disp >= 0), bilin, disp)

    meta = disparity_with_metadata(disp, stereo, config.sgm)
    return meta.replace(
        max_disparity=meta.max_disparity * float(s)
    )


def transform_objects(objects: MovingObjects, tf: jnp.ndarray) -> MovingObjects:
    """Transform detections camera -> odom (centers as points, velocities as
    vectors; bounding boxes axis-aligned sizes stay, matching
    moving_objects_tracker.cpp:66-75)."""
    return objects.replace(
        center=geometry.transform_points(tf, objects.center),
        velocity=geometry.rotate_vectors(tf, objects.velocity),
    )


@partial(jax.jit, static_argnames=("config", "flow_model"))
def detect_step(
    flow_params,
    state: PipelineState,
    left: jnp.ndarray,
    right: jnp.ndarray,
    t: jnp.ndarray,
    stereo: StereoModel,
    config: PipelineConfig,
    flow_model: PWCNet | None = None,
    flow_override: jnp.ndarray | None = None,
    disparity_override: DisparityImage | None = None,
    tunables=None,
):
    """One full frame: stereo pair -> disparity, ego-motion, optical flow,
    scene flow, detections, tracks. The single-program equivalent of
    stereoCallback + construct + clusterer + tracker (SURVEY.md §3.1-3.3).

    ``flow_override``/``disparity_override`` swap in externally produced
    perception results: recorded/classical fields (SURVEY.md §7 step 2's
    validation path) or the spatially sharded kernels
    (parallel/spatial.py), which run the heavy stages over several chips
    before the rest of the frame program.
    """
    cam = stereo.cam
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    # Color contract: (H, W) grayscale or (H, W, 3) RGB (config.color).
    # SGM and ego-motion always run on luma (the reference's MONO8
    # conversion before viso2, scene_flow_constructor.cpp:220-221); the
    # flow net sees whatever its weights were trained on (the reference
    # feeds PWC the camera's native image, :279-282).
    gray_left = luma(left)
    gray_right = luma(right)
    t = jnp.asarray(t, jnp.float32)
    if tunables is None:
        # Constants folded at trace time; pass a Tunables pytree to retune
        # at runtime without recompiling (dynamic_reconfigure analog).
        from .tunables import Tunables

        tunables = Tunables.from_config(config)

    # --- Perception fan-out (reference threads A/B/C, one XLA program). ---
    if disparity_override is not None:
        disparity_now = disparity_override
    else:
        disparity_now = _sgm_forward(gray_left, gray_right, stereo, config)

    disparity_prev = state.prev_disparity

    # The flow source is either the PWC network or an externally supplied
    # field (recorded/classical flow — SURVEY.md §7 step 2's validation path,
    # mirroring BASELINE.json configs[0]).
    if flow_override is not None:
        flow = flow_override
    else:
        flow = _flow_forward(
            flow_params, flow_model, state.prev_left, left,
            input_scale=config.flow_input_scale,
        )

    key = jax.random.fold_in(jax.random.PRNGKey(7), state.frame_index)
    motion, ego_ok, _ = estimate_motion(
        luma(state.prev_left),
        gray_left,
        disparity_prev,
        cam,
        key,
        config.egomotion,
        dense_flow=flow if config.egomotion.use_dense_flow else None,
    )
    ego_ok = ego_ok & state.has_prev
    motion = jnp.where(ego_ok, motion, jnp.eye(4, dtype=jnp.float32))

    # --- Scene-flow construction (construct worker thread). ---
    points_now = geometry.disparity_to_points(disparity_now, cam)
    points_prev = geometry.disparity_to_points(disparity_prev, cam)
    points_prev_tf = geometry.transform_points(motion, points_prev)

    dt = jnp.maximum(t - state.prev_time, 1e-3)
    cloud, static_flow = construct_scene_flow(
        points_now,
        points_prev_tf,
        flow,
        disparity_now,
        disparity_prev,
        cam,
        dt,
        tunables.dynamic_flow_diff,
        transform_prev2now=motion,
        config=config.scene_flow,
        dynamic_disparity_rate=tunables.dynamic_disparity_rate,
    )
    # Reference: no velocity cloud without a previous frame AND a successful
    # ego-motion estimate (construct() null checks,
    # scene_flow_constructor.cpp:104-133).
    frame_valid = state.has_prev & ego_ok
    velocity = jnp.where(frame_valid, cloud.velocity, jnp.nan)
    cloud = SceneFlowCloud(points=cloud.points, velocity=velocity)

    # --- Detection (clusterer). ---
    detections, label_image, cluster_overflow = cluster_scene_flow(
        cloud,
        config.clusterer,
        return_overflow=True,
        dynamic_speed=tunables.dynamic_speed,
        depth_diff=tunables.depth_diff,
        cluster_size=tunables.cluster_size,
        neighbor_distance=tunables.neighbor_distance,
    )

    # --- Odometry integration (integrateAndBroadcastTF,
    # scene_flow_constructor.cpp:320-349). The camera-frame motion is
    # conjugated into the base_link frame by the static extrinsic the
    # reference reads from the TF tree (robot_state_publisher URDF,
    # detect_with_zed.launch:36-54; identity fallback :333-342), then
    # integrated into the odom<-base_link pose the reference broadcasts. ---
    t_bc = stereo.base_from_camera
    motion_base = t_bc @ motion @ geometry.se3_inverse(t_bc)
    new_pose = jnp.where(
        ego_ok, state.pose @ geometry.se3_inverse(motion_base), state.pose
    )

    # --- Tracking in the odom frame. The tracker's TF lookup
    # (moving_objects_tracker.cpp:56-64) resolves camera->odom =
    # (odom<-base_link) o (base_link<-camera). ---
    cam_to_odom = new_pose @ t_bc
    det_odom = transform_objects(detections, cam_to_odom)

    def run_tracker(ts):
        return track_step(
            ts,
            t,
            det_odom,
            config.tracker,
            object_radius=tunables.object_radius,
            covariance_trace_limit=tunables.covariance_trace_limit,
            correction_count_limit=tunables.correction_count_limit,
        )

    def skip_tracker(ts):
        empty = MovingObjects.empty(config.tracker.max_tracks)
        return ts, TrackedObjects(
            objects=empty,
            covariance=jnp.zeros(
                (config.tracker.max_tracks, 4, 4), jnp.float32
            ),
        )

    # The reference tracker only receives a message when the clusterer
    # received a scene-flow cloud; skip the update entirely otherwise.
    new_tracker, tracked = jax.lax.cond(
        frame_valid, run_tracker, skip_tracker, state.tracker
    )

    new_state = PipelineState(
        pose=new_pose,
        prev_left=left,
        prev_disparity=disparity_now,
        prev_time=t,
        has_prev=jnp.bool_(True),
        tracker=new_tracker,
        frame_index=state.frame_index + 1,
    )

    output = FrameOutput(
        disparity=disparity_now,
        flow=flow,
        scene_flow=cloud,
        static_flow=static_flow,
        detections=detections,
        label_image=label_image,
        tracked=tracked,
        motion=motion,
        odom_pose=cam_to_odom,
        ego_success=ego_ok,
        frame_valid=frame_valid,
        cluster_overflow=cluster_overflow,
        tracker_saturated=jnp.all(new_tracker.active),
    )
    return new_state, output
