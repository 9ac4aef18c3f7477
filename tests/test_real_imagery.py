"""Real-imagery regression suite (VERDICT round-1 gap: every quality number
was scored on the train/data_synth.py generator family the net was trained
on; the reference ran on live ZED photographs, README.md:9).

Fixtures are REAL photographs (tests/fixtures/real_textures.npz, built by
scripts/make_real_fixtures.py from system-package sample photos: foliage,
architecture, skin — no synthetic generator involved). Geometry is
controlled (known shifts / disparities / scene composition) so ground truth
is exact while texture statistics are natural; this is precisely the
distribution shift that broke the pwc_v2 weights (36% static-pixel
hallucination on an unseen texture family, PLAN_NEXT item 4a).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "real_textures.npz")

H, W = 192, 448

# Bundled-weight versions trained with real-photo textures in the mixture
# (train/data_synth.py real-texture source). Measured 2026-08-19 on
# pwc_v4e (synthetic-only training): 60.9% of static real-photo pixels
# over the 5 px gate / median 6.0 px on china.jpg; known-shift EPE 6.8 —
# the flow tests xfail for such weights and become hard gates the moment
# a real-texture-trained default lands.
_REAL_TEXTURE_TRAINED = frozenset({
    "pwc_v5.fp16.npz",
    "pwc_v6m3.fp16.npz",  # measured 2026-08-21 on the exported file:
                          # static spurious 0.0% >5px on all 6 photos
                          # (median <= 0.25 px), shift-6 EPE <= 1.10
    "pwc_v7.fp16.npz",    # measured 2026-08-22 on the exported file
                          # (stage-O gate battery): static spurious
                          # 0.0% >5px on all 6 photos (median 0.13-
                          # 0.28 px), shift-6 EPE <= 1.09
})


def _xfail_unless_real_trained():
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if os.path.basename(ckpt or "") not in _REAL_TEXTURE_TRAINED:
        pytest.xfail(
            "bundled weights predate real-photo-texture training "
            "(measured hallucination on real photographs — see "
            "_REAL_TEXTURE_TRAINED note)"
        )


def _textures():
    data = np.load(FIXTURE)
    return {k: data[k].astype(np.float32) / 255.0 for k in data.files}


def _crop(img, h=H, w=W):
    """Center crop/tile a real photo to (h, w)."""
    from moving_object_detector_tpu.io.readers import SyntheticStereoSequence

    return SyntheticStereoSequence._fit_texture(img, h, w)


@pytest.fixture(scope="module")
def flow_net():
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


def test_flow_static_real_photos(flow_net):
    """A static real-photo scene must stay under the 5 px dynamic gate:
    the hallucination failure mode scored on textures the training
    generator never produced."""
    from moving_object_detector_tpu.pipeline import _flow_forward

    _xfail_unless_real_trained()
    params, model = flow_net
    for name, tex in _textures().items():
        img = _crop(tex)
        fl = np.asarray(
            _flow_forward(params, model, jnp.asarray(img), jnp.asarray(img))
        )
        mag = np.linalg.norm(fl, axis=-1)
        frac = float((mag > 5.0).mean())
        med = float(np.median(mag))
        assert frac < 0.05, (
            f"{name}: {frac * 100:.1f}% of static real-photo pixels over "
            f"the 5 px gate (median {med:.2f} px)"
        )
        assert med < 1.5, f"{name}: median spurious |flow| {med:.2f} px"


def test_flow_known_shift_heldout_photo(flow_net):
    """Same known-shift recovery on a HELD-OUT photograph (``heldout_``
    keys are excluded from the training texture bank by
    train/data_synth._real_bank): non-circular evidence the net handles
    natural image statistics rather than memorized textures."""
    from moving_object_detector_tpu.pipeline import _flow_forward

    _xfail_unless_real_trained()
    params, model = flow_net
    shift = 6
    img = _crop(_textures()["heldout_camera"])
    img2 = np.roll(img, shift, axis=1)
    fl = np.asarray(
        _flow_forward(params, model, jnp.asarray(img), jnp.asarray(img2))
    )
    inner = fl[:, shift + 8: W - 8]
    err = np.linalg.norm(
        inner - np.array([shift, 0.0], np.float32), axis=-1
    )
    epe = float(err.mean())
    med_u = float(np.median(inner[..., 0]))
    assert abs(med_u - shift) < 1.0, f"median u {med_u:.2f} vs {shift}"
    assert epe < 4.5, f"held-out real-texture EPE {epe:.2f}"


def test_flow_known_shift_real_photo(flow_net):
    """A global +6 px horizontal shift of a real photo must be recovered
    (EPE floor on real texture; the synthetic-batch floor is 4.5)."""
    from moving_object_detector_tpu.pipeline import _flow_forward

    _xfail_unless_real_trained()
    params, model = flow_net
    shift = 6
    img = _crop(_textures()["china"])
    img2 = np.roll(img, shift, axis=1)
    fl = np.asarray(
        _flow_forward(params, model, jnp.asarray(img), jnp.asarray(img2))
    )
    # Exclude the wrap-around seam column band.
    inner = fl[:, shift + 8: W - 8]
    err = np.linalg.norm(
        inner - np.array([shift, 0.0], np.float32), axis=-1
    )
    epe = float(err.mean())
    med_u = float(np.median(inner[..., 0]))
    assert abs(med_u - shift) < 1.0, f"median u {med_u:.2f} vs {shift}"
    assert epe < 4.5, f"real-texture EPE {epe:.2f}"


def test_sgm_constant_disparity_real_photo():
    """SGM on a fronto-parallel real-photo plane: right = left shifted by a
    constant disparity. Median error < 1 px, < 10% bad pixels (|err| > 3)
    over the mutually-visible region — the D1 metric shape on real
    texture."""
    from moving_object_detector_tpu.config import SGMConfig
    from moving_object_detector_tpu.ops.sgm import sgm_disparity_raw

    d_true = 20
    img = _crop(_textures()["flower"])
    right = np.roll(img, -d_true, axis=1)
    cfg = SGMConfig(max_disparity=64, backend="xla")
    disp = np.asarray(
        sgm_disparity_raw(jnp.asarray(img), jnp.asarray(right), cfg)
    )
    region = disp[:, d_true + 8: W - d_true - 8]
    valid = region >= 0
    assert valid.mean() > 0.7, f"only {valid.mean():.0%} valid disparities"
    err = np.abs(region[valid] - d_true)
    assert np.median(err) < 1.0, f"median |err| {np.median(err):.2f} px"
    bad = float((err > 3.0).mean())
    assert bad < 0.10, f"bad-pixel (D1-style) fraction {bad:.1%}"


def test_end_to_end_real_texture_detection(flow_net):
    """Full fused pipeline on a scene rendered ENTIRELY from real
    photographs (architecture background, portrait object): the moving
    object must be detected with zero phantom detections on the real
    background — the end-to-end form of the hallucination regression."""
    import dataclasses

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.io.readers import SyntheticStereoSequence
    from moving_object_detector_tpu.pipeline import (
        PipelineState,
        detect_step,
    )
    from moving_object_detector_tpu.types import StereoModel

    _xfail_unless_real_trained()
    params, model = flow_net
    tex = _textures()
    fx = 300.0
    config = PipelineConfig(height=H, width=W)
    ref_frac = 2500.0 / (1242.0 * 376.0)
    config = dataclasses.replace(
        config,
        flownet=model.config,
        clusterer=dataclasses.replace(
            config.clusterer, cluster_size=max(50, int(ref_frac * H * W))
        ),
        scene_flow=dataclasses.replace(
            config.scene_flow,
            dynamic_flow_diff=config.scene_flow.dynamic_flow_diff
            * (W / 1242.0),
        ),
    )
    seq = SyntheticStereoSequence(
        height=H, width=W, fx=fx, n_frames=7,
        bg_texture=tex["china"], obj_texture=tex["hopper"],
    )
    stereo = StereoModel.create(
        fx=fx, fy=fx, cx=W / 2.0, cy=H / 2.0, baseline=seq.baseline
    )
    state = PipelineState.create(config)
    step = jax.jit(
        lambda s, l, r, t: detect_step(
            params, s, l, r, t, stereo, config, flow_model=model
        )
    )

    hits, phantoms = 0, 0
    n_frames = 6
    for k in range(n_frames):
        left, right, _, truth = seq.frame(k)
        state, out = step(
            state, jnp.asarray(left), jnp.asarray(right),
            jnp.float32(k / seq.fps),
        )
        if k == 0:
            continue
        valid = np.asarray(out.detections.valid)
        centers = np.asarray(out.detections.center)
        y0, x0, oh, ow = truth["obj_box"]
        for i in np.flatnonzero(valid):
            u = fx * centers[i, 0] / centers[i, 2] + W / 2.0
            v = fx * centers[i, 1] / centers[i, 2] + H / 2.0
            if (x0 - 16 <= u <= x0 + ow + 16
                    and y0 - 16 <= v <= y0 + oh + 16):
                hits += 1
            else:
                phantoms += 1
    scored = n_frames - 1
    assert phantoms == 0, f"{phantoms} phantom detections on real texture"
    assert hits >= 0.6 * scored, f"object detected {hits}/{scored} frames"


# Weight versions that pass the paste-probe gate below (< 1.5 px mean at
# shifts 6/10/16). EMPTY as of 2026-08-21 — the v6 line improved the
# probe (pwc_v5 2.08/2.30/2.22 -> pwc_v6m3 1.00/1.92/2.39 at 6/10/16)
# but three motion-contrast/curriculum stages plateaued above the gate
# at 10/16. Measured structure (column error profiles): the residual is
# concentrated on the OCCLUDING (leading) half of the object, whose
# pixels' true matches disappear behind the leading edge — the
# disoccluding half tracks at ~0.5 px. The end-to-end velocity gates
# (validate_detection_quality 0.263-0.336 m/s, scene-matrix vel <= 0.55
# at both scales) pass because the clusterer's median velocity is robust
# to the occluding-side band. Add a basename ONLY when the probe passes
# on that exact file.
_LOCAL_MOTION_TRAINED = frozenset()


def test_flow_local_object_motion(flow_net):
    """A 100x64 px real-texture rectangle pasted onto a real-photo
    background and shifted by a known amount must be tracked to < 1.5 px
    mean error at shifts 6/10/16 — the LOCAL-motion analog of the global
    known-shift tests above, and the measured pwc_v5 blind spot."""
    from moving_object_detector_tpu.pipeline import _flow_forward
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
    )

    ckpt = default_flow_checkpoint()
    if os.path.basename(ckpt or "") not in _LOCAL_MOTION_TRAINED:
        pytest.xfail(
            "bundled weights predate local-motion training (measured ~2 px "
            "object under-tracking — see _LOCAL_MOTION_TRAINED note)"
        )
    params, model = flow_net
    texs = _textures()
    bg = _crop(texs["heldout_camera"])
    obj = _crop(texs["heldout_blade"], 64, 100)
    y0, x0 = 60, 150
    for shift in (6, 10, 16):
        i1 = bg.copy()
        i1[y0:y0 + 64, x0:x0 + 100] = obj
        i2 = bg.copy()
        i2[y0:y0 + 64, x0 + shift:x0 + shift + 100] = obj
        fl = np.asarray(
            _flow_forward(params, model, jnp.asarray(i1), jnp.asarray(i2))
        )
        m = np.zeros(bg.shape, bool)
        m[y0 + 4:y0 + 60, x0 + shift + 4:x0 + 96] = True
        err = np.abs(fl[m][:, 0] - shift).mean()
        assert err < 1.5, f"shift {shift}: mean |u err| {err:.2f} px"
        assert np.abs(fl[m][:, 1]).mean() < 1.0
