"""On-device synthetic flow data: the generated (img1, img2, flow) triple
must actually satisfy the flow convention img1(x) ~ img2(x + flow(x))
(ops/flow_ops.py warp contract) away from occlusions."""

import jax
import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.ops import flow_ops
from moving_object_detector_tpu.train.data_synth import (
    generate_batch,
    generate_pair,
)


def test_shapes_and_ranges():
    img1, img2, flow = generate_pair(jax.random.PRNGKey(0), 96, 160)
    assert img1.shape == (96, 160, 1) and img2.shape == (96, 160, 1)
    assert flow.shape == (96, 160, 2)
    assert float(img1.min()) >= 0.0 and float(img1.max()) <= 1.0
    assert float(img2.min()) >= 0.0 and float(img2.max()) <= 1.0
    # Motion exists and is bounded by construction.
    mag = jnp.sqrt(jnp.sum(flow**2, axis=-1))
    assert float(mag.max()) > 1.0
    assert float(mag.max()) < 120.0


def test_photometric_consistency():
    """Backward-warping img2 by the GT flow must reproduce img1 except at
    occlusions/out-of-frame (checked via median error, robust to both)."""
    img1, img2, flow = generate_pair(jax.random.PRNGKey(3), 128, 192)
    rewarped = flow_ops.warp(img2[None], flow[None])[0]
    err = np.asarray(jnp.abs(rewarped - img1)[..., 0])
    # interior only (image-border flow may leave the frame)
    interior = err[16:-16, 16:-16]
    assert np.median(interior) < 0.06, np.median(interior)
    # most pixels consistent (occluded ones are the exception)
    assert (interior < 0.15).mean() > 0.75, (interior < 0.15).mean()


def test_batch_and_determinism():
    b1 = generate_batch(jax.random.PRNGKey(7), 3, 64, 96)
    b2 = generate_batch(jax.random.PRNGKey(7), 3, 64, 96)
    assert b1["img1"].shape == (3, 64, 96, 1)
    assert b1["flow"].shape == (3, 64, 96, 2)
    np.testing.assert_array_equal(b1["img2"], b2["img2"])
    # distinct samples within a batch
    assert float(jnp.abs(b1["img1"][0] - b1["img1"][1]).max()) > 0.05


def test_texture_family_includes_sharp_cell_textures():
    """The generator must cover BOTH smooth octave noise and sharp
    cell-quantized textures: a net trained on octave noise alone is blind
    to motion on blocky/tiled imagery (measured: 6 px block motion read as
    1.1 px on the SyntheticStereoSequence textures — the pwc_v3 detection
    gate failure). Sharp textures have ~10x stronger x-gradients."""
    b = generate_batch(jax.random.PRNGKey(11), 32, 64, 96)
    gx = np.abs(np.diff(np.asarray(b["img1"][..., 0]), axis=2)).mean(
        axis=(1, 2)
    )
    assert gx.max() > 3.0 * gx.min(), gx
    assert (gx > 0.02).any(), gx  # sharp family present
    assert (gx < 0.02).any(), gx  # smooth family present


def test_magnitude_mixture_keeps_static_scenes():
    """Every curriculum stage must keep zero/small motion in-distribution
    (the per-sample magnitude mixture with a 10% static floor): a
    large-max_shift stage without it regresses the static fine-texture
    spurious-flow rate (see PLAN_NEXT.md, stage-B 43.4% regression)."""
    b = generate_batch(
        jax.random.PRNGKey(123), 64, 64, 96, max_shift=48.0,
        bg_max_shift=20.0,
    )
    peak = np.asarray(jnp.abs(b["flow"]).max(axis=(1, 2, 3)))
    assert (peak < 0.1).mean() >= 0.03, peak.min()  # exact-static samples
    assert (peak < 8.0).mean() >= 0.2  # dense small-motion coverage
    assert peak.max() > 24.0  # the large-shift tail survives


def test_scale2_samples_match_the_serving_downsample():
    """generate_pair_scale2 must be bitwise the serving path applied to a
    2x-res scene: pipeline._flow_forward downsamples with antialiased
    bilinear jax.image.resize and halves flow magnitudes
    (pipeline.py:124-139). Training on any OTHER downsample would optimize
    a different distribution than the flow_input_scale=2 knob serves."""
    from moving_object_detector_tpu.train.data_synth import (
        generate_pair_scale2,
    )

    key = jax.random.PRNGKey(3)
    h, w = 48, 80
    i1, i2, fl = generate_pair_scale2(key, h, w, max_shift=12.0)
    ri1, ri2, rfl = generate_pair(key, 2 * h, 2 * w, 4, 24.0, 20.0)
    exp1 = jax.image.resize(ri1[..., 0], (h, w), "bilinear")[..., None]
    expf = jax.image.resize(rfl, (h, w, 2), "bilinear") * 0.5
    np.testing.assert_allclose(np.asarray(i1), np.asarray(exp1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(expf), atol=1e-6)
    assert i1.shape == (h, w, 1) and fl.shape == (h, w, 2)
    # Output-pixel flow bounds are preserved: doubled at 2x, halved back.
    assert float(jnp.abs(fl).max()) <= 2.0 * 24.0


def test_batch_downsample_frac_mixes_families():
    """downsample_frac splits the batch between the native and scale-2
    serving distributions with static shapes (jit-stable): the tail
    ``round(frac*batch)`` samples come from generate_pair_scale2 under the
    same per-sample key split, the head from generate_pair."""
    from moving_object_detector_tpu.train.data_synth import (
        generate_pair_scale2,
    )

    key = jax.random.PRNGKey(5)
    b = generate_batch(key, 4, 48, 80, downsample_frac=0.5)
    assert b["img1"].shape == (4, 48, 80, 1)
    keys = jax.random.split(key, 4)
    i1n, _, _ = generate_pair(keys[0], 48, 80, 4, 24.0, 10.0)
    i1d, _, fld = generate_pair_scale2(keys[3], 48, 80, 4, 24.0, 10.0)
    np.testing.assert_allclose(
        np.asarray(b["img1"][0]), np.asarray(i1n), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b["img1"][3]), np.asarray(i1d), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b["flow"][3]), np.asarray(fld), atol=1e-4, rtol=1e-4
    )


def test_local_motion_regime():
    """local_motion_frac=1: near-static background with guaranteed-moving
    objects (the measured pwc_v5 blind spot the v6 curriculum targets),
    and the img1/img2/flow warp contract still holds."""
    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.ops import flow_ops
    from moving_object_detector_tpu.train.data_synth import generate_pair

    h, w = 96, 128
    bg_small = 0
    obj_large = 0
    n = 12
    for s in range(n):
        img1, img2, flow = generate_pair(
            jax.random.PRNGKey(s), h, w, n_objects=2,
            max_shift=24.0, bg_max_shift=10.0, local_motion_frac=1.0,
        )
        fl = np.asarray(flow)
        mag = np.linalg.norm(fl, axis=-1)
        # Background = pixels at the border rows (objects are centered in
        # [0.15, 0.85] of the frame and have radius <= 0.22*min_dim, so a
        # 4-px border band is object-free).
        border = np.concatenate(
            [mag[:2].ravel(), mag[-2:].ravel()]
        )
        if np.median(border) < 1.0:
            bg_small += 1
        if mag.max() > 5.0:
            obj_large += 1
        # Objects are guaranteed non-static: the log-uniform magnitude
        # floor is 0.04 * max_shift (~1 px here).
        assert mag.max() > 0.8, (s, mag.max())
        # Warp contract: img1(x) ~ img2(x + flow(x)) away from occlusions,
        # modulo the generator's global photometric jitter (gain/bias on
        # img2) — remove the best global gain/bias before comparing.
        warped = np.asarray(
            flow_ops.warp(jnp.asarray(img2)[None], jnp.asarray(fl)[None])
        )[0][..., 0]
        i1 = np.asarray(img1)[..., 0]
        a = np.stack([warped.ravel(), np.ones(warped.size)], axis=1)
        coef, *_ = np.linalg.lstsq(a, i1.ravel(), rcond=None)
        err = np.abs(coef[0] * warped + coef[1] - i1)
        # 30th percentile, not median: guaranteed-moving objects over a
        # near-static background sweep object-SIZED occlusion regions
        # (where the contract legitimately fails), which can cover >40%
        # of a small frame.
        assert np.quantile(err, 0.3) < 0.05, (
            s, float(np.quantile(err, 0.3))
        )
    # The regime holds for the large majority of samples (the 10% global
    # static floor still produces some all-static scenes). Object
    # magnitudes are LOG-uniform in [0.04, 1] of max_shift (the small
    # 5-20 px serving band must be trained, see generate_pair), so only
    # ~half the samples exceed 5 px — gate at a quarter.
    assert bg_small >= n * 2 // 3, bg_small
    assert obj_large >= n // 4, obj_large


def test_local_motion_frac_zero_is_identity():
    """frac=0 must reproduce the historical sample stream bit-for-bit
    (running v5 recipes unchanged)."""
    import jax

    from moving_object_detector_tpu.train.data_synth import generate_pair

    key = jax.random.PRNGKey(3)
    a = generate_pair(key, 64, 96, n_objects=3, real_frac=0.0)
    b = generate_pair(key, 64, 96, n_objects=3, real_frac=0.0,
                      local_motion_frac=0.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_motion_contrast_weights():
    """Loss weights for independently-moving pixels: mean exactly 1 per
    image (loss scale preserved), background ~1/(mean raw), saturated
    moving pixels (1+s)x the background weight."""
    from moving_object_detector_tpu.train.flow_trainer import (
        motion_contrast_weights,
    )

    gt = jnp.zeros((2, 32, 48, 2))
    # Image 0: static background + an 8x12 object moving 10 px.
    gt = gt.at[0, 8:16, 10:22, 0].set(10.0)
    # Image 1: uniform global motion (no independent movers).
    gt = gt.at[1, :, :, 0].set(7.0)
    w = np.asarray(motion_contrast_weights(gt, strength=4.0))
    assert np.allclose(w.mean(axis=(1, 2)), 1.0, atol=1e-5)
    # Object pixels saturate (dev 10 px > sat 4): raw 5 vs background 1.
    obj = w[0, 8:16, 10:22]
    bg = w[0, 0, 0]
    assert np.allclose(obj / bg, 5.0, rtol=1e-3)
    # Pure global motion: median == flow everywhere -> uniform weights.
    assert np.allclose(w[1], 1.0, atol=1e-5)


def test_flow_loss_motion_contrast_zero_is_uniform():
    """motion_contrast=0 must reproduce the uniform loss bitwise."""
    from moving_object_detector_tpu.config import FlowNetConfig
    from moving_object_detector_tpu.models.pwc_net import PWCNet
    from moving_object_detector_tpu.train.flow_trainer import flow_loss

    cfg = FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                        use_context_net=False, dtype="float32",
                        estimator_channels=(16, 8))
    model = PWCNet(config=cfg)
    k = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(k, (1, 32, 48, 1))
    img2 = jnp.roll(img1, 2, axis=2)
    params = model.init(jax.random.PRNGKey(1), img1, img2)
    gt = jnp.zeros((1, 32, 48, 2)).at[..., 0].set(-2.0)
    l0, e0 = flow_loss(model, params, img1, img2, gt)
    l1, e1 = flow_loss(model, params, img1, img2, gt, motion_contrast=0.0)
    assert float(l0) == float(l1) and float(e0) == float(e1)
    # And a nonzero strength changes the loss but not the reported EPE.
    l2, e2 = flow_loss(model, params, img1, img2, gt, motion_contrast=4.0)
    assert float(e2) == float(e0)


def test_rgb_generation_same_geometry_as_gray():
    """channels=3 colorizes textures but must not change the scene
    GEOMETRY: same key -> identical ground-truth flow, (h, w, 3) images in
    range, and per-channel content that actually differs (real chroma)."""
    from moving_object_detector_tpu.train.data_synth import generate_pair

    key = jax.random.PRNGKey(12)
    g1, g2, gflow = generate_pair(key, 48, 64, local_motion_frac=0.5)
    c1, c2, cflow = generate_pair(key, 48, 64, local_motion_frac=0.5,
                                  channels=3)
    assert g1.shape == (48, 64, 1) and c1.shape == (48, 64, 3)
    np.testing.assert_array_equal(np.asarray(gflow), np.asarray(cflow))
    for img in (c1, c2):
        arr = np.asarray(img)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
        # chroma present: channels differ somewhere
        assert np.abs(arr[..., 0] - arr[..., 2]).max() > 0.01


def test_rgb_batch_with_downsample_mix():
    from moving_object_detector_tpu.train.data_synth import generate_batch

    data = generate_batch(jax.random.PRNGKey(3), 4, 32, 64,
                          downsample_frac=0.5, channels=3)
    assert data["img1"].shape == (4, 32, 64, 3)
    assert data["flow"].shape == (4, 32, 64, 2)
    assert np.isfinite(np.asarray(data["img1"])).all()
