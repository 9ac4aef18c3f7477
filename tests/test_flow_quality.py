"""Flow-weight quality regression: the bundled checkpoint must keep its
accuracy on a FIXED held-out synthetic batch (train/data_synth.py family,
seed 0 — the generator the weights were trained on, different draws).

Locks the trained-quality floor the way golden tests lock semantics:
retraining may improve the number, an accidental architecture or
checkpoint-format change that silently degrades it fails here. Baseline at
capture (2026-08-18, after coarse-octave dropout landed in the generator):
mean EPE 3.56 px, zero-flow baseline ~9 px.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

def test_bundled_weights_epe_floor():
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.eval import flow_epe
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward
    from moving_object_detector_tpu.train.data_synth import generate_batch
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        load_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if ckpt is None:
        pytest.skip("no bundled weights")
    if any(v in os.path.basename(ckpt) for v in ("pwc_v2", "pwc_v3")):
        # The held-out batch follows the CURRENT generator distribution
        # (now 35% cell-quantized textures); weights that predate the
        # family are blind on those samples by construction.
        pytest.xfail("pre-cell-texture weights can't meet the floor on "
                     "the widened texture distribution")

    # Shape-self-describing load: the default may carry architecture
    # variants (e.g. pwc_v7's occlusion cue) the static default config
    # does not describe.
    params, flow_cfg = load_flow_checkpoint(ckpt, PipelineConfig().flownet)
    model = PWCNet(config=flow_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    h, w = 192, 448
    batch = generate_batch(jax.random.PRNGKey(0), 4, h, w)
    epes, zero_epes = [], []
    for i in range(4):
        flow = _flow_forward(
            params, model, batch["img1"][i, ..., 0], batch["img2"][i, ..., 0]
        )
        gt = np.asarray(batch["flow"][i])
        epes.append(flow_epe(np.asarray(flow), gt)["epe"])
        zero_epes.append(flow_epe(np.zeros_like(gt), gt)["epe"])

    mean_epe = float(np.mean(epes))
    zero_epe = float(np.mean(zero_epes))
    # Regression floor: captured 3.62 px; margin for benign numeric drift.
    assert mean_epe < 4.5, f"flow quality regressed: EPE {mean_epe:.2f}"
    # Sanity: the predictions are doing real work vs predict-zero.
    assert mean_epe < 0.5 * zero_epe, (mean_epe, zero_epe)


def test_bundled_weights_epe_floor_scale2():
    """The half-res serving knob (flow_input_scale=2) is only a default
    with weights finetuned on the scale-2 serving distribution (stage E,
    scripts/finetune_flow_scale2.sh): pwc_v4 scores EPE 1.06 at scale 1
    but 19+ at scale 2. Locks the scale-2 floor for checkpoints that
    claim the gate (utils.checkpoint.flow_checkpoint_scale2_gated),
    xfails for the rest.

    Scored at 384x896 frames so the net input (192x448 after the
    serving downsample) matches the DEPLOYED distribution: bench runs
    KITTI 376x1242 -> net sees 188x621. A 192x448-frame eval would feed
    the net 96x224 — a resolution regime nothing serves."""
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.eval import flow_epe
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward
    from moving_object_detector_tpu.train.data_synth import generate_batch
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        flow_checkpoint_scale2_gated,
        load_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if ckpt is None:
        pytest.skip("no bundled weights")
    if not flow_checkpoint_scale2_gated(ckpt):
        pytest.xfail("bundled weights predate the stage-E scale-2 "
                     "serving-distribution finetune")

    cfg = PipelineConfig()
    params, flow_cfg = load_flow_checkpoint(ckpt, cfg.flownet)
    model = PWCNet(config=flow_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    h, w = 384, 896
    batch = generate_batch(jax.random.PRNGKey(0), 4, h, w)
    epes, zero_epes = [], []
    for i in range(4):
        flow = _flow_forward(
            params, model, batch["img1"][i, ..., 0],
            batch["img2"][i, ..., 0], input_scale=2,
        )
        gt = np.asarray(batch["flow"][i])
        epes.append(flow_epe(np.asarray(flow), gt)["epe"])
        zero_epes.append(flow_epe(np.zeros_like(gt), gt)["epe"])
    mean_epe = float(np.mean(epes))
    zero_epe = float(np.mean(zero_epes))
    assert mean_epe < 4.5, f"scale-2 flow quality: EPE {mean_epe:.2f}"
    # Sanity: the half-res predictions do real work vs predict-zero.
    assert mean_epe < 0.5 * zero_epe, (mean_epe, zero_epe)


def test_bundled_weights_large_motion_bins():
    """Magnitude-binned EPE gate (VERDICT round-1 item 3): KITTI ego
    flows exceed 100 px near the camera while the historical curriculum
    ceiling left EPE 16+ beyond 24 px of GT (PLAN_NEXT item 4b). On a
    max_shift=112 batch the [24,64) px |gt| bin must score EPE < 5 and
    the [64,160) bin must beat predict-zero by 2x (a net that collapses
    to zero flow on large motions fails both).

    xfails for weights that predate the large-motion curriculum
    (scripts/train_flow_v5.sh)."""
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward
    from moving_object_detector_tpu.train.data_synth import generate_batch
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        load_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if ckpt is None:
        pytest.skip("no bundled weights")
    if os.path.basename(ckpt) not in _LARGE_MOTION_TRAINED:
        pytest.xfail("bundled weights predate the large-motion curriculum "
                     "(max_shift 112+, scripts/train_flow_v5.sh)")

    cfg = PipelineConfig()
    params, flow_cfg = load_flow_checkpoint(ckpt, cfg.flownet)
    model = PWCNet(config=flow_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    h, w = 192, 448
    batch = generate_batch(jax.random.PRNGKey(7), 4, h, w,
                           max_shift=112.0, bg_max_shift=48.0)
    errs, gmags = [], []
    for i in range(4):
        flow = np.asarray(_flow_forward(
            params, model, batch["img1"][i, ..., 0], batch["img2"][i, ..., 0]
        ))
        gt = np.asarray(batch["flow"][i])
        errs.append(np.linalg.norm(flow - gt, axis=-1))
        gmags.append(np.linalg.norm(gt, axis=-1))
    err = np.stack(errs)
    gmag = np.stack(gmags)

    mid = (gmag >= 24.0) & (gmag < 64.0)
    assert mid.sum() > 1000, "batch has too few mid-magnitude pixels"
    mid_epe = float(err[mid].mean())
    assert mid_epe < 5.0, f"[24,64) px bin EPE {mid_epe:.2f}"

    big = (gmag >= 64.0) & (gmag < 160.0)
    if big.sum() > 1000:
        big_epe = float(err[big].mean())
        zero_epe = float(gmag[big].mean())
        # Anti-collapse gate: a net that predicts ~zero on extreme
        # motions scores ~= zero_epe here. Factor 0.65 (was 0.5,
        # calibrated to pwc_v5's 45.2): the v6 line deliberately trades
        # this 1.6%-of-pixels tail for the serving-critical local-motion
        # band (pwc_v6m3: [24,64) EPE 2.38 vs v5's 2.90; [64,160) 53.3
        # vs v5's 45.2 — still 1.68x better than collapse).
        assert big_epe < 0.65 * zero_epe, (
            f"[64,160) bin EPE {big_epe:.2f} vs predict-zero {zero_epe:.2f}"
        )


# Bundled-weight versions trained with the extended magnitude curriculum
# (max_shift >= 112 at 192x448). Add a basename ONLY when the binned gate
# above passes on that exact exported file.
_LARGE_MOTION_TRAINED = frozenset({
    "pwc_v5.fp16.npz",
    "pwc_v6m3.fp16.npz",  # 2026-08-21: [24,64) bin EPE 2.38 at 192x448
    "pwc_v7.fp16.npz",    # 2026-08-22: [24,64) bin EPE 2.19 at 192x448
})


def test_default_weights_static_fine_texture():
    """The DEFAULT bundled weights must not hallucinate flow on a static
    fine-only-texture scene (failure mode 4a, PLAN_NEXT.md: v2 weights put
    36% of static pixels over the 5 px dynamic gate on the CLI synthetic
    background, causing end-to-end phantom detections).

    xfails while the default checkpoint is the known-bad pwc_v2; flips to a
    hard gate the moment a retrained default lands.
    """
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.io.readers import SyntheticStereoSequence
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        load_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if ckpt is None:
        pytest.skip("no bundled weights")
    if "pwc_v2" in os.path.basename(ckpt):
        pytest.xfail("pwc_v2 weights have the measured fine-texture "
                     "hallucination; gate activates with the retrained "
                     "default (scripts/retrain_flow.sh)")

    cfg = PipelineConfig()
    params, flow_cfg = load_flow_checkpoint(ckpt, cfg.flownet)
    model = PWCNet(config=flow_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    h, w = 192, 448
    seq = SyntheticStereoSequence(height=h, width=w, fx=300.0, n_frames=3)
    l0, _, _, _ = seq.frame(0)
    l1, _, _, truth = seq.frame(1)
    flow = np.asarray(
        _flow_forward(params, model, jnp.asarray(l0), jnp.asarray(l1))
    )
    mag = np.linalg.norm(flow, axis=-1)
    static = np.ones((h, w), bool)
    y0, x0, oh, ow = truth["obj_box"]
    static[max(0, y0 - 8):y0 + oh + 8, max(0, x0 - 16):x0 + ow + 8] = False
    sm = mag[static]
    frac_over_gate = float((sm > 5.0).mean())
    median = float(np.median(sm))
    assert frac_over_gate < 0.05, (
        f"{frac_over_gate * 100:.1f}% of static pixels over the 5 px "
        f"dynamic gate (median spurious |flow| {median:.2f} px)"
    )
    assert median < 1.5, f"median spurious |flow| {median:.2f} px"


def test_default_weights_cell_texture_motion():
    """The DEFAULT bundled weights must RECOVER motion on sharp
    cell-quantized textures, not just stay quiet on static ones: pwc_v3
    (trained on octave noise only) read the synthetic scene's 6 px block
    motion as ~1 px — invisible to the 5 px dynamic gate — and failed the
    end-to-end detection gate with 0-4/9 hits. The cell-texture training
    family (data_synth._cell_texture) exists to fix this; this test locks
    it.

    xfails while the default checkpoint predates that family.
    """
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.io.readers import SyntheticStereoSequence
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        load_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if ckpt is None:
        pytest.skip("no bundled weights")
    if any(v in os.path.basename(ckpt) for v in ("pwc_v2", "pwc_v3")):
        pytest.xfail("pre-cell-texture weights are blind to motion on "
                     "cell-quantized textures (scripts/"
                     "retrain_flow_stage_D.sh retrains the default)")

    cfg = PipelineConfig()
    params, flow_cfg = load_flow_checkpoint(ckpt, cfg.flownet)
    model = PWCNet(config=flow_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    h, w = 192, 448
    seq = SyntheticStereoSequence(height=h, width=w, fx=300.0, n_frames=3)
    l0, _, _, _ = seq.frame(0)
    l1, _, _, truth = seq.frame(1)
    flow = np.asarray(
        _flow_forward(params, model, jnp.asarray(l0), jnp.asarray(l1))
    )
    y0, x0, oh, ow = truth["obj_box"]
    # Interior object pixels visible in both frames (skip occlusion edges).
    obj = flow[y0 + 4:y0 + oh - 4, x0 + 10:x0 + ow - 4]
    u_med = float(np.median(obj[..., 0]))
    # True motion is +6 px in u (SyntheticStereoSequence obj_speed_px).
    assert 4.0 < u_med < 8.0, (
        f"object flow not recovered on cell textures: median u {u_med:.2f} "
        f"px (true 6.0)"
    )
    frac_over_gate = float(
        (np.linalg.norm(obj, axis=-1) > 5.0).mean()
    )
    assert frac_over_gate > 0.5, (
        f"only {frac_over_gate * 100:.0f}% of object pixels clear the 5 px "
        f"dynamic gate"
    )
