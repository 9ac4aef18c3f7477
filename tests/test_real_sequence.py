"""Real-imagery SEQUENCE evaluation gates (VERDICT round-2 item 1: the
real-data evaluation, run and gated).

The environment ships no real stereo dataset (zero egress), so the closest
achievable real-data evaluation is the PlanarSceneSequence renderer
(io/scenes.py) textured EXCLUSIVELY with held-out real photographs the
flow net never trained on (``heldout_`` keys of
tests/fixtures/real_textures.npz, excluded from the training bank by
train/data_synth._real_bank): real image statistics over a full moving
sequence — translating + yawing camera, a laterally moving object and a
depth-approaching object — with analytic ground truth for every product.

Every gate value below is the measured 2026-08-20 result (pwc_v5 weights)
with margin; regressions in ANY stage (SGM, flow, ego-motion, scene flow,
clustering, tracking) trip them. Known quality gap carried as a loose
gate: pwc_v5 under-tracks locally-moving objects by ~2 px on real
textures (see scripts/train_flow_v6.sh), so vel_err_median gates at
1.4 m/s; the v6 target is < 0.6.

Scored against the same metrics the reference's operator would check in
rviz (README.md:54-68) — but quantitatively.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "real_textures.npz")


def _heldout_textures():
    data = np.load(FIXTURE)
    return {
        k: data[k].astype(np.float32) / 255.0
        for k in data.files if k.startswith("heldout_")
    }


@pytest.fixture(scope="module")
def flow_net():
    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.models.pwc_net import PWCNet
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        load_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if ckpt is None:
        pytest.skip("no bundled weights")
    params, cfg = load_flow_checkpoint(ckpt, PipelineConfig().flownet)
    model = PWCNet(config=cfg)
    return jax.tree_util.tree_map(jnp.asarray, params), model


def _sequence(h, w, fx):
    from moving_object_detector_tpu.io.scenes import (
        PlaneObject,
        PlanarSceneSequence,
    )

    tex = _heldout_textures()
    return PlanarSceneSequence(
        h, w, fx=fx, bg_depth=12.0, bg_texture=tex["heldout_camera"],
        objects=[
            PlaneObject(
                center0=(-1.2, -0.75, 6.0), size=(2.0, 1.28),
                velocity=(2.0, 0.0, 0.0), texture=tex["heldout_blade"],
            ),
            # Depth-approaching: sized/sped so the expansion flow crosses
            # the (resolution-rescaled) dynamic gate in the last frames.
            PlaneObject(
                center0=(0.55, 0.5, 6.5), size=(1.7, 1.1),
                velocity=(0.2, 0.0, -4.0),
                texture=tex["heldout_freedom"],
            ),
        ],
        cam_velocity=(0.5, 0.0, 0.3), yaw_rate=np.deg2rad(1.5),
        fps=10.0, n_frames=7,
    )


def _run(flow_net, h, w, fx, scale):
    from moving_object_detector_tpu.eval import evaluate_planar_sequence

    params, model = flow_net
    return evaluate_planar_sequence(
        _sequence(h, w, fx), params, model,
        flow_input_scale=scale, sgm_input_scale=scale, details=True,
    )


def _common_gates(m):
    # SGM on real textures: KITTI-style D1 (measured 0.013 / 0.016).
    assert m["d1"] < 0.04, m["d1"]
    assert m["d1_density"] > 0.85, m["d1_density"]
    # Ego-motion under combined translation + yaw (measured <= 0.17 deg,
    # <= 6.3 cm).
    assert m["ego_rot_err_deg"] < 0.35, m["ego_rot_err_deg"]
    assert m["ego_trans_err_m"] < 0.13, m["ego_trans_err_m"]
    assert m["ego_failures"] == 0
    # Detection: at most ONE transient phantom over the sequence, and no
    # phantom may persist across consecutive frames. pwc_v6m3's sharper
    # local-motion response trades v5's zero-phantom record for ~2x
    # velocity accuracy (0.59-0.61 vs 0.95-1.0 m/s) plus one single-frame
    # background-depth phantom (measured 2026-08-21: frame 3 at scale 1,
    # frame 5 at scale 2, >100 px apart); the tracker's
    # correction_count_limit=3 (moving_objects_tracker.cpp:187-196 role)
    # filters exactly this class from published tracks, so persistence is
    # the track-level-honest gate.
    assert m["phantoms"] <= 1, m["phantoms"]
    prev_px = []
    for df in m["detail_frames"]:
        cur_px = [ph["px"] for ph in df.get("phantoms", []) if ph["px"]]
        for p0 in cur_px:
            assert all(
                abs(p0[0] - q[0]) + abs(p0[1] - q[1]) > 60.0
                for q in prev_px
            ), f"persistent phantom near {p0}"
        prev_px = cur_px
    # The lateral object is hit every scored frame; the approach object
    # from when its expansion crosses the gate (>= 2 of the last 3).
    lateral = [df["matched"][0] for df in m["detail_frames"]]
    assert sum(lateral) >= len(lateral) - 1, lateral
    approach = [
        df["matched"][1] for df in m["detail_frames"]
        if len(df["matched"]) > 1
    ]
    assert sum(approach[-3:]) >= 2, approach
    # Velocity: tightened 1.4 -> 0.85 band with the pwc_v6m3 promotion.
    # Measured values on THIS sequence with v6m3: 0.593-0.606 m/s on the
    # TPU (2026-08-21/22, two sessions) but 0.706 on the CPU backend the
    # suite runs on — a ~0.1 m/s backend-numerics drift (bf16 flow net +
    # SGM tie-breaks differ between backends), so the gate carries CPU
    # headroom while still catching pwc_v5-class regressions (~0.95-1.0).
    assert m["vel_err_median"] < 0.85, m["vel_err_median"]
    assert m["center_err_median"] < 0.25, m["center_err_median"]


def test_real_sequence_full_res(flow_net):
    """Scale-1 pipeline at 192x448 on the held-out-texture sequence."""
    m = _run(flow_net, 192, 448, 300.0, 1)
    _common_gates(m)
    # Flow on previously-visible pixels (measured EPE 1.05, Fl 0.070).
    assert m["flow_epe"] < 1.8, m["flow_epe"]
    assert m["flow_fl"] < 0.13, m["flow_fl"]


def test_real_sequence_serving_scale2(flow_net):
    """The SERVING configuration (flow scale 2 + SGM scale 2) at 384x896,
    where the net sees the deployed 192x448 resolution (PLAN_NEXT
    2026-08-19b: scale-2 evaluation must match the served distribution)."""
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        flow_checkpoint_scale2_gated,
    )

    if not flow_checkpoint_scale2_gated(default_flow_checkpoint()):
        pytest.xfail("bundled weights not scale-2 gated")
    m = _run(flow_net, 384, 896, 600.0, 2)
    _common_gates(m)
    # Measured at the serving point: EPE 1.78, Fl 0.130.
    assert m["flow_epe"] < 2.6, m["flow_epe"]
    assert m["flow_fl"] < 0.19, m["flow_fl"]
