"""End-to-end pipeline tests on a synthetic stereo sequence: a moving block
in front of a static background, static camera.

Covers the full fused frame program (detect_step): SGM disparity ->
ego-motion -> scene flow -> clustering -> tracking, using a ground-truth
flow override (SURVEY.md §7 step 2) plus a smoke test of the PWC path."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.config import (
    ClustererConfig,
    EgoMotionConfig,
    FlowNetConfig,
    PipelineConfig,
    SceneFlowConfig,
    SGMConfig,
    TrackerConfig,
)
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params
from moving_object_detector_tpu.pipeline import PipelineState, detect_step
from moving_object_detector_tpu.types import StereoModel

H, W = 64, 128
FX = 100.0
BASE = 0.48
Z_BG, Z_OBJ = 8.0, 4.0  # disparities 6 and 12
D_BG, D_OBJ = 6, 12
# Background depth strips (column range -> disparity). With only one or two
# background planes the scene is degenerate: a rigid motion exists that
# reproduces zero background flow AND the object's coherent 5 px flow, so
# the ego-motion solver can absorb the moving object (viso2 would too).
# Four depths make the static background uniquely identify the identity.
BG_STRIPS = ((0, 32, 6), (32, 64, 3), (64, 96, 9), (96, 128, 12))
OBJ_W, OBJ_H = 30, 24
OBJ_Y = 20
SHIFT = 5  # object pixel shift per frame
DT = 0.1
# True object velocity: du * z / fx / dt = 5 * 4 / 100 / 0.1 = 2 m/s.
V_TRUE = SHIFT * Z_OBJ / FX / DT

STEREO = StereoModel.create(fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0, baseline=BASE)

CONFIG = PipelineConfig(
    height=H,
    width=W,
    scene_flow=SceneFlowConfig(dynamic_flow_diff=2.0),
    clusterer=ClustererConfig(
        cluster_size=100, depth_diff=0.3, dynamic_speed=0.3,
        neighbor_distance=2, max_objects=4,
    ),
    tracker=TrackerConfig(max_tracks=8, gating_deviation=1.5),
    sgm=SGMConfig(max_disparity=16, census_window=(5, 5)),
    egomotion=EgoMotionConfig(
        max_features=128, nms_radius=2, ransac_hypotheses=16,
        lk_pyramid_levels=2, min_inliers=8,
    ),
    flownet=FlowNetConfig(
        feature_channels=(8, 16, 32), search_range=2,
        use_context_net=False, dtype="float32",
    ),
)


def blocky(rng, h, w, cell=4):
    return np.kron(
        rng.uniform(0.1, 0.9, (h // cell, w // cell)).astype(np.float32),
        np.ones((cell, cell), np.float32),
    )


def noisy(rng, h, w):
    """Non-periodic smoothed noise: periodic textures make LK lock onto
    false matches (a pathology of synthetic scenes, not of real imagery)."""
    img = rng.uniform(0.1, 0.9, (h, w)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25])
    img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, img)
    return img


def make_frame(bg, obj_tex, obj_x):
    """Render a left/right pair: background at disparity 6, object block at
    disparity 12 sitting at column obj_x (left image)."""
    left = bg.copy()
    left[OBJ_Y : OBJ_Y + OBJ_H, obj_x : obj_x + OBJ_W] = obj_tex
    right = np.concatenate(
        [np.roll(bg, -d, axis=1)[:, x0:x1] for x0, x1, d in BG_STRIPS],
        axis=1,
    )
    rx = obj_x - D_OBJ
    right[OBJ_Y : OBJ_Y + OBJ_H, rx : rx + OBJ_W] = obj_tex
    return left, right


def true_flow(obj_x_now, first):
    """Ground-truth flow field of the current frame (now-frame indexed):
    SHIFT inside the object, 0 in the background."""
    f = np.zeros((H, W, 2), np.float32)
    if not first:
        f[OBJ_Y : OBJ_Y + OBJ_H, obj_x_now : obj_x_now + OBJ_W, 0] = SHIFT
    return f


def run_sequence(n_frames=7):
    rng = np.random.default_rng(5)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    state = PipelineState.create(CONFIG)
    outputs = []
    x0 = 30
    for k in range(n_frames):
        obj_x = x0 + SHIFT * k
        left, right = make_frame(bg, obj_tex, obj_x)
        flow = true_flow(obj_x, first=(k == 0))
        state, out = detect_step(
            None,
            state,
            jnp.asarray(left),
            jnp.asarray(right),
            jnp.float32(k * DT),
            STEREO,
            CONFIG,
            flow_override=jnp.asarray(flow),
        )
        outputs.append(out)
    return state, outputs


def test_end_to_end_detection_and_tracking():
    state, outputs = run_sequence(7)

    # Frame 0: no previous frame -> invalid.
    assert not bool(outputs[0].frame_valid)
    assert not np.asarray(outputs[0].detections.valid).any()

    # Frames 1+: exactly one detection, correct velocity and depth.
    for k in range(1, 7):
        out = outputs[k]
        assert bool(out.frame_valid), f"frame {k} invalid"
        valid = np.asarray(out.detections.valid)
        assert valid.sum() == 1, f"frame {k}: {valid.sum()} detections"
        i = valid.argmax()
        vel = np.asarray(out.detections.velocity)[i]
        center = np.asarray(out.detections.center)[i]
        assert abs(vel[0] - V_TRUE) < 0.5, f"frame {k} vx {vel[0]}"
        assert abs(center[2] - Z_OBJ) < 0.5, f"frame {k} z {center[2]}"

    # Ego-motion: static camera. Every per-frame motion estimate must be
    # small (the handful of moving-object features inside the RANSAC gate
    # leaves a ~1 cm/frame bias — the same failure mode viso2 has when a
    # moving object carries trackable corners), and the integrated pose must
    # stay near identity.
    for k in range(1, 7):
        m = np.asarray(outputs[k].motion)
        assert np.linalg.norm(m[:3, 3]) < 0.04, f"frame {k} motion {m[:3, 3]}"
    np.testing.assert_allclose(
        np.asarray(outputs[-1].odom_pose), np.eye(4), atol=0.1
    )

    # Tracking: after >= 3 corrections a track is published with the right
    # velocity.
    tracked = outputs[-1].tracked.objects
    tvalid = np.asarray(tracked.valid)
    assert tvalid.sum() == 1
    tvel = np.asarray(tracked.velocity)[tvalid.argmax()]
    assert abs(tvel[0] - V_TRUE) < 0.5


def test_disparity_quality_in_pipeline():
    _, outputs = run_sequence(2)
    disp = np.asarray(outputs[1].disparity.disparity)
    # Background region inside the first strip (d=6), away from the object
    # and image borders.
    bg_region = disp[4:16, 10:28]
    v = bg_region[bg_region >= 0]
    assert np.abs(np.median(v) - D_BG) <= 1.0


def test_scene_flow_velocity_field():
    _, outputs = run_sequence(3)
    vel = np.asarray(outputs[2].scene_flow.velocity)
    obj_x = 30 + 2 * SHIFT
    inner = vel[OBJ_Y + 6 : OBJ_Y + OBJ_H - 6, obj_x + 8 : obj_x + OBJ_W - 6]
    finite = np.isfinite(inner[..., 0])
    assert finite.mean() > 0.5
    assert abs(np.nanmedian(inner[..., 0]) - V_TRUE) < 0.5


def test_pwc_path_smoke():
    """detect_step with the real flow network: finite outputs, no crash."""
    rng = np.random.default_rng(0)
    bg = blocky(rng, H, W)
    obj = noisy(rng, OBJ_H, OBJ_W)
    model = PWCNet(config=CONFIG.flownet)
    params = init_pwc_params(model, H, W)
    state = PipelineState.create(CONFIG)
    for k in range(2):
        left, right = make_frame(bg, obj, 30 + SHIFT * k)
        state, out = detect_step(
            params,
            state,
            jnp.asarray(left),
            jnp.asarray(right),
            jnp.float32(k * DT),
            STEREO,
            CONFIG,
            flow_model=model,
        )
    assert np.isfinite(np.asarray(out.flow)).all()
    assert out.flow.shape == (H, W, 2)
    assert bool(out.frame_valid)


def test_flow_input_scale_halves_resolution_path():
    """flow_input_scale=2 runs the net at half res and returns full-res
    flow with doubled vectors; on a constant-shift scene the result still
    approximates the true flow."""
    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.config import FlowNetConfig
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward

    cfg = FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                        use_context_net=False, dtype="float32")
    model = PWCNet(config=cfg)
    h, w = 48, 64
    params = init_pwc_params(model, h // 2, w // 2, jax.random.PRNGKey(0))
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (h, w), jnp.float32)
    img2 = img1
    out = _flow_forward(params, model, img1, img2, input_scale=2)
    assert out.shape == (h, w, 2)
    # Identical images -> (near-)zero flow at any scale.
    assert float(jnp.mean(jnp.abs(out))) < 0.5


def test_edge_aware_flow_upsample_no_boundary_blending():
    """The half-res flow upsample must NOT invent intermediate velocities
    along motion boundaries (bilinear blending there merges crossing
    clusters and creates boundary phantoms), while matching bilinear on
    smooth regions."""
    import jax.numpy as jnp
    import numpy as np

    from moving_object_detector_tpu.ops import flow_ops
    from moving_object_detector_tpu.pipeline import edge_aware_flow_upsample

    hs, ws = 16, 24
    # Two regions moving oppositely: +8 px left half, -8 px right half,
    # plus a tiny smooth ramp (well under the 1 px spread gate).
    x = jnp.arange(ws, dtype=jnp.float32)[None, :].repeat(hs, 0)
    ramp = 0.01 * x
    u = jnp.where(x < ws // 2, 8.0, -8.0) + ramp
    flow_s = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
    out = np.asarray(edge_aware_flow_upsample(flow_s, (2 * hs, 2 * ws), 2))
    # Every output u value is (2x) one of the half-res values near its
    # block — never a cross-boundary average. The two motions are ~16
    # apart after scaling; assert nothing lands in the dead band.
    assert not np.any((out[..., 0] > -12.0) & (out[..., 0] < 12.0))
    # Smooth interior (away from the boundary and frame edges): bilinear.
    bilin = np.asarray(
        flow_ops.resize_bilinear(flow_s[None], (2 * hs, 2 * ws))[0] * 2.0
    )
    interior = np.s_[4:-4, 6 : ws - 8]
    np.testing.assert_allclose(
        out[interior], bilin[interior], rtol=0, atol=1e-5
    )


# --- Moving camera: the reference's core competence is ego-motion
# compensation (construct(), scene_flow_constructor.cpp:91-147) — the
# static-camera tests above never exercise it end-to-end. Camera translates
# laterally at TX m/frame; background content shifts per strip by
# s(Z) = fx*TX/Z px/frame (parallax: 2/1/3/4 px for the four depth strips),
# rolled WITHIN each strip so column depth stays exact. The object keeps its
# physical SHIFT px/frame motion, appearing at SHIFT - fx*TX/Z_OBJ px/frame.
TX = 0.16  # m/frame lateral camera translation -> strip shifts 2,1,3,4 px
S_OBJ = int(round(FX * TX / Z_OBJ))  # camera-induced object shift: 4 px
A_OBJ = SHIFT - S_OBJ  # apparent object shift: 1 px/frame
MOBJ_X0 = 33  # object starts inside strip 1


def _strip_shift(d):
    z = FX * BASE / d
    s = FX * TX / z
    assert abs(s - round(s)) < 1e-6
    return int(round(s))


def make_frame_moving(bg, obj_tex, k):
    """Frame k under lateral camera motion: each strip rolled left by
    k*s(Z) within itself, object drawn at its apparent position."""
    bgk = np.concatenate(
        [
            np.roll(bg[:, x0:x1], -_strip_shift(d) * k, axis=1)
            for x0, x1, d in BG_STRIPS
        ],
        axis=1,
    )
    obj_x = MOBJ_X0 + A_OBJ * k
    left = bgk.copy()
    left[OBJ_Y : OBJ_Y + OBJ_H, obj_x : obj_x + OBJ_W] = obj_tex
    right = np.concatenate(
        [np.roll(bgk, -d, axis=1)[:, x0:x1] for x0, x1, d in BG_STRIPS],
        axis=1,
    )
    rx = obj_x - D_OBJ
    right[OBJ_Y : OBJ_Y + OBJ_H, rx : rx + OBJ_W] = obj_tex
    return left, right, obj_x


def true_flow_moving(obj_x_now, first):
    """Now-indexed ground-truth flow: -s(Z) per background strip (content
    moves left as the camera moves +x), apparent A_OBJ inside the object."""
    f = np.zeros((H, W, 2), np.float32)
    if first:
        return f
    for x0, x1, d in BG_STRIPS:
        f[:, x0:x1, 0] = -_strip_shift(d)
    f[OBJ_Y : OBJ_Y + OBJ_H, obj_x_now : obj_x_now + OBJ_W, 0] = A_OBJ
    return f


def test_end_to_end_moving_camera():
    rng = np.random.default_rng(11)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    state = PipelineState.create(CONFIG)
    outputs = []
    for k in range(5):
        left, right, obj_x = make_frame_moving(bg, obj_tex, k)
        flow = true_flow_moving(obj_x, first=(k == 0))
        state, out = detect_step(
            None,
            state,
            jnp.asarray(left),
            jnp.asarray(right),
            jnp.float32(k * DT),
            STEREO,
            CONFIG,
            flow_override=jnp.asarray(flow),
        )
        outputs.append(out)

    for k in range(1, 5):
        out = outputs[k]
        assert bool(out.frame_valid), f"frame {k} invalid"
        # Per-frame ego-motion: p_now = M @ p_prev with the camera moving
        # +x, so M carries -TX in x and ~0 rotation.
        m = np.asarray(out.motion)
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=0.01)
        assert abs(m[0, 3] + TX) < 0.03, f"frame {k} tx {m[0, 3]}"
        assert abs(m[1, 3]) < 0.02 and abs(m[2, 3]) < 0.04, m[:3, 3]
        # Exactly the one moving object despite every background pixel
        # having nonzero optical flow (the compensation is doing the work).
        valid = np.asarray(out.detections.valid)
        assert valid.sum() == 1, f"frame {k}: {valid.sum()} detections"
        i = valid.argmax()
        vel = np.asarray(out.detections.velocity)[i]
        center = np.asarray(out.detections.center)[i]
        assert abs(vel[0] - V_TRUE) < 0.5, f"frame {k} vx {vel[0]}"
        assert abs(center[2] - Z_OBJ) < 0.5, f"frame {k} z {center[2]}"

    # Integrated odometry: +TX per frame in odom x (integrateAndBroadcastTF
    # analog).
    pose = np.asarray(outputs[-1].odom_pose)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=0.02)
    assert abs(pose[0, 3] - 4 * TX) < 0.1, pose[:3, 3]

    # Tracking survives the moving camera (detections are transformed to
    # the odom frame before association).
    tracked = outputs[-1].tracked.objects
    tvalid = np.asarray(tracked.valid)
    assert tvalid.sum() == 1
    tvel = np.asarray(tracked.velocity)[tvalid.argmax()]
    assert abs(tvel[0] - V_TRUE) < 0.5


def test_base_from_camera_extrinsic():
    """A camera mounted off the robot base (static base_link<-camera TF,
    integrateAndBroadcastTF scene_flow_constructor.cpp:320-349 + the
    tracker's camera->odom lookup moving_objects_tracker.cpp:56-64): every
    odom-frame output must be the identity-extrinsic run's output mapped by
    the extrinsic. A z-axis rotation maps the tracker's filtered xy-plane to
    itself and the KF noise is xy-isotropic (kalman_tracker.hpp:42-51), so
    equality is exact up to float tolerance."""
    c, s = 0.0, 1.0  # 90 deg about camera z
    t_bc = np.array(
        [
            [c, -s, 0.0, 0.3],
            [s, c, 0.0, -0.2],
            [0.0, 0.0, 1.0, 0.5],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    stereo_t = StereoModel.create(
        fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0, baseline=BASE,
        base_from_camera=t_bc,
    )

    rng = np.random.default_rng(11)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    outs = {}
    for name, stereo in (("id", STEREO), ("tf", stereo_t)):
        state = PipelineState.create(CONFIG)
        for k in range(5):
            left, right, obj_x = make_frame_moving(bg, obj_tex, k)
            flow = true_flow_moving(obj_x, first=(k == 0))
            state, out = detect_step(
                None, state, jnp.asarray(left), jnp.asarray(right),
                jnp.float32(k * DT), stereo, CONFIG,
                flow_override=jnp.asarray(flow),
            )
        outs[name] = out

    # Camera-frame products are extrinsic-independent.
    np.testing.assert_allclose(
        np.asarray(outs["tf"].motion), np.asarray(outs["id"].motion),
        atol=1e-6,
    )
    # odom<-camera composes the extrinsic once, on the left.
    np.testing.assert_allclose(
        np.asarray(outs["tf"].odom_pose),
        t_bc @ np.asarray(outs["id"].odom_pose),
        atol=1e-4,
    )
    # Tracked objects: centers map as points, velocities as vectors.
    tid, ttf = outs["id"].tracked.objects, outs["tf"].tracked.objects
    vid = np.asarray(tid.valid)
    assert vid.sum() == 1 and (np.asarray(ttf.valid) == vid).all()
    i = vid.argmax()
    c_id = np.asarray(tid.center)[i]
    c_tf = np.asarray(ttf.center)[i]
    np.testing.assert_allclose(c_tf, t_bc[:3, :3] @ c_id + t_bc[:3, 3],
                               atol=1e-3)
    v_id = np.asarray(tid.velocity)[i]
    v_tf = np.asarray(ttf.velocity)[i]
    np.testing.assert_allclose(v_tf, t_bc[:3, :3] @ v_id, atol=1e-3)


def test_prev_disparity_metadata_carry():
    """state.prev_disparity carries the FULL DisparityImage (metadata, not
    just the raw map): a disparity_override's f/T/min/max must survive into
    the next frame's match chain instead of being rebuilt from config.sgm;
    the frame-0 placeholder must gate every pixel invalid (max < min)."""
    from moving_object_detector_tpu.types import DisparityImage

    state = PipelineState.create(CONFIG)
    assert not bool(np.asarray(state.prev_disparity.valid_mask()).any())

    rng = np.random.default_rng(5)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    left, right = make_frame(bg, obj_tex, 30)
    override = DisparityImage.create(
        jnp.full((H, W), 7.0), f=999.0, t=2.5,
        min_disparity=1.0, max_disparity=64.0,
    )
    state, _ = detect_step(
        None, state, jnp.asarray(left), jnp.asarray(right), jnp.float32(0.0),
        STEREO, CONFIG,
        flow_override=jnp.asarray(true_flow(30, first=True)),
        disparity_override=override,
    )
    assert float(state.prev_disparity.f) == 999.0
    assert float(state.prev_disparity.t) == 2.5
    assert float(state.prev_disparity.min_disparity) == 1.0
    assert float(state.prev_disparity.max_disparity) == 64.0
    assert bool(np.asarray(state.prev_disparity.valid_mask()).all())


def test_end_to_end_sgm_input_scale():
    """The half-res SGM serving knob (PipelineConfig.sgm_input_scale=2)
    must preserve the end-to-end detection/tracking result on the oracle
    scene: one detection with correct velocity and depth, no phantoms."""
    import dataclasses as _dc

    config = _dc.replace(CONFIG, sgm_input_scale=2)
    rng = np.random.default_rng(5)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    state = PipelineState.create(config)
    x0 = 30
    outputs = []
    for k in range(5):
        obj_x = x0 + SHIFT * k
        left, right = make_frame(bg, obj_tex, obj_x)
        flow = true_flow(obj_x, first=(k == 0))
        state, out = detect_step(
            None, state, jnp.asarray(left), jnp.asarray(right),
            jnp.float32(k * DT), STEREO, config,
            flow_override=jnp.asarray(flow),
        )
        outputs.append(out)
    for k in range(1, 5):
        out = outputs[k]
        assert bool(out.frame_valid), f"frame {k} invalid"
        valid = np.asarray(out.detections.valid)
        assert valid.sum() == 1, f"frame {k}: {valid.sum()} detections"
        i = valid.argmax()
        vel = np.asarray(out.detections.velocity)[i]
        center = np.asarray(out.detections.center)[i]
        assert abs(vel[0] - V_TRUE) < 0.6, f"frame {k} vx {vel[0]}"
        assert abs(center[2] - Z_OBJ) < 0.6, f"frame {k} z {center[2]}"


def test_end_to_end_gnn_association():
    """detect_step with tracker association="gnn" (the reference's
    available-but-unwired Munkres mode,
    global_nearest_neighbor_association.hpp): same scene as the greedy-NN
    end-to-end test, must produce an equivalent confirmed track."""
    config = dataclasses.replace(
        CONFIG,
        tracker=dataclasses.replace(CONFIG.tracker, association="gnn"),
    )
    rng = np.random.default_rng(5)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    state = PipelineState.create(config)
    outputs = []
    for k in range(7):
        obj_x = 30 + SHIFT * k
        left, right = make_frame(bg, obj_tex, obj_x)
        flow = true_flow(obj_x, first=(k == 0))
        state, out = detect_step(
            None, state,
            jnp.asarray(left), jnp.asarray(right), jnp.float32(k * DT),
            STEREO, config, flow_override=jnp.asarray(flow),
        )
        outputs.append(out)
    # The single moving object is detected and, after
    # correction_count_limit corrections, published as a track with the
    # right velocity — exactly as in the greedy-NN mode.
    last = outputs[-1]
    assert np.asarray(last.detections.valid).sum() == 1
    tr_valid = np.asarray(last.tracked.objects.valid)
    assert tr_valid.sum() == 1
    v = np.asarray(last.tracked.objects.velocity)[tr_valid.argmax()]
    np.testing.assert_allclose(v[0], V_TRUE, atol=0.5)
    np.testing.assert_allclose(v[1:], 0.0, atol=0.3)


def test_end_to_end_cc_crop_parity():
    """The clusterer dynamic-extent crop fast path
    (ClustererConfig.cc_crop_h/w) inside the FULL fused frame program:
    bitwise-identical detections, tracks and label image vs the
    full-frame path on the oracle moving-block scene."""
    import dataclasses as _dc

    import jax

    cfg_crop = _dc.replace(
        CONFIG,
        clusterer=_dc.replace(CONFIG.clusterer, cc_crop_h=40, cc_crop_w=64),
    )
    rng = np.random.default_rng(5)
    bg = blocky(rng, H, W)
    obj_tex = noisy(rng, OBJ_H, OBJ_W)
    x0 = 30
    for config in (CONFIG, cfg_crop):
        state = PipelineState.create(config)
        outs = []
        for k in range(4):
            obj_x = x0 + SHIFT * k
            left, right = make_frame(bg, obj_tex, obj_x)
            flow = true_flow(obj_x, first=(k == 0))
            state, out = detect_step(
                None, state, jnp.asarray(left), jnp.asarray(right),
                jnp.float32(k * DT), STEREO, config,
                flow_override=jnp.asarray(flow),
            )
            outs.append(out)
        if config is CONFIG:
            ref_outs = outs
    for k in range(4):
        a, b = ref_outs[k], outs[k]
        assert bool(np.asarray(a.detections.valid).sum()) == (k >= 1)
        for x, y in zip(
            jax.tree_util.tree_leaves(
                (a.detections, a.tracked, a.label_image)
            ),
            jax.tree_util.tree_leaves(
                (b.detections, b.tracked, b.label_image)
            ),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_color_frames_luma_parity_with_gray_pipeline():
    """(H, W, 3) frames through a 1-channel-weights pipeline must equal
    the (H, W) luma pipeline BITWISE: SGM/ego always see luma (reference
    MONO8 split, scene_flow_constructor.cpp:220-221) and the channel
    adapter collapses the flow input identically."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from moving_object_detector_tpu.config import (
        EgoMotionConfig, FlowNetConfig, PipelineConfig, SGMConfig,
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.pipeline import (
        PipelineState, detect_step, luma,
    )
    from moving_object_detector_tpu.types import StereoModel

    h, w = 64, 96
    config = PipelineConfig(
        height=h, width=w,
        flownet=FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                              use_context_net=False, dtype="float32"),
        sgm=SGMConfig(max_disparity=16, backend="xla"),
        egomotion=EgoMotionConfig(max_features=64, nms_radius=2,
                                  ransac_hypotheses=8, lk_pyramid_levels=1,
                                  min_inliers=4),
    )
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    model = PWCNet(config=config.flownet)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))

    rgb_l = jax.random.uniform(jax.random.PRNGKey(1), (h, w, 3))
    rgb_r = jnp.roll(rgb_l, -4, axis=1)

    cfg_color = _dc.replace(config, color=True)
    st_c = PipelineState.create(cfg_color)
    st_g = PipelineState.create(config)
    for t in (0.1, 0.2):
        st_c, out_c = detect_step(params, st_c, rgb_l, rgb_r,
                                  jnp.float32(t), stereo, cfg_color,
                                  flow_model=model)
        st_g, out_g = detect_step(params, st_g, luma(rgb_l), luma(rgb_r),
                                  jnp.float32(t), stereo, config,
                                  flow_model=model)
    # Not bitwise: the color path computes luma INSIDE the jitted step
    # where XLA may contract the multiply-adds to FMAs, while the gray
    # reference computes it eagerly outside — a ~1-ulp input difference
    # the flow net amplifies slightly. Tight tolerances still pin the
    # semantic parity (same luma, same stages).
    np.testing.assert_allclose(np.asarray(out_c.disparity.disparity),
                               np.asarray(out_g.disparity.disparity),
                               atol=0.26)  # subpixel census ties only
    np.testing.assert_allclose(np.asarray(out_c.flow),
                               np.asarray(out_g.flow), atol=2e-3)
    vc = np.asarray(out_c.scene_flow.velocity)
    vg = np.asarray(out_g.scene_flow.velocity)
    np.testing.assert_array_equal(np.isnan(vc), np.isnan(vg))
    np.testing.assert_allclose(vc[np.isfinite(vc)], vg[np.isfinite(vg)],
                               atol=0.05)
    assert st_c.prev_left.shape == (h, w, 3)


def test_rgb_flow_net_end_to_end():
    """A 3-channel flow net (FlowNetConfig.in_channels=3) initializes,
    round-trips through the npz checkpoint format with in_channels
    inferred back from kernel shapes, and serves color frames in the
    pipeline."""
    import dataclasses as _dc
    import os
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from moving_object_detector_tpu.config import (
        EgoMotionConfig, FlowNetConfig, PipelineConfig, SGMConfig,
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, infer_flow_config, init_pwc_params,
    )
    from moving_object_detector_tpu.pipeline import PipelineState, detect_step
    from moving_object_detector_tpu.types import StereoModel
    from moving_object_detector_tpu.utils.checkpoint import (
        load_flow_checkpoint, save_flow_params_npz,
    )

    h, w = 64, 96
    fcfg = FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                         use_context_net=False, dtype="float32",
                         in_channels=3)
    model = PWCNet(config=fcfg)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))
    first = params["params"]["FeaturePyramid_0"]["ConvBlock_0"]["Conv_0"][
        "kernel"]
    assert first.shape[-2] == 3

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rgb.fp16.npz")
        save_flow_params_npz(path, jax.device_get(params))
        base = FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                             use_context_net=False, dtype="float32")
        loaded, cfg2 = load_flow_checkpoint(path, base)
    assert cfg2.in_channels == 3

    config = PipelineConfig(
        height=h, width=w, color=True, flownet=cfg2,
        sgm=SGMConfig(max_disparity=16, backend="xla"),
        egomotion=EgoMotionConfig(max_features=64, nms_radius=2,
                                  ransac_hypotheses=8, lk_pyramid_levels=1,
                                  min_inliers=4),
    )
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    model2 = PWCNet(config=cfg2)
    rgb_l = jax.random.uniform(jax.random.PRNGKey(1), (h, w, 3))
    rgb_r = jnp.roll(rgb_l, -4, axis=1)
    st = PipelineState.create(config)
    for t in (0.1, 0.2):
        st, out = detect_step(loaded, st, rgb_l, rgb_r, jnp.float32(t),
                              stereo, config, flow_model=model2)
    assert out.flow.shape == (h, w, 2)
    assert np.isfinite(np.asarray(out.flow)).all()
    assert bool(np.asarray(out.frame_valid))
