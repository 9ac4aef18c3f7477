"""SGM stereo tests on synthetic scenes with known disparities."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.config import SGMConfig
from moving_object_detector_tpu.ops import sgm
from moving_object_detector_tpu.types import StereoModel

CFG = SGMConfig(max_disparity=32, census_window=(5, 5))
STEREO = StereoModel.create(fx=100.0, fy=100.0, cx=32.0, cy=24.0, baseline=0.5)


def textured_image(h, w, rng):
    """Smooth random texture so census windows are discriminative."""
    img = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    # light blur to create gradients
    k = np.array([0.25, 0.5, 0.25])
    img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, img)
    return img


def shift_right_image(left, disp):
    """right(x) = left(x + d) for constant integer d (point at left x maps to
    right x - d)."""
    right = np.zeros_like(left)
    d = int(disp)
    if d > 0:
        right[:, :-d] = left[:, d:]
        right[:, -d:] = left[:, -d:]
    else:
        right[:] = left
    return right


def test_constant_disparity_plane(rng):
    h, w, d_true = 48, 64, 7
    left = textured_image(h, w, rng)
    right = shift_right_image(left, d_true)
    out = sgm.compute_disparity(jnp.asarray(left), jnp.asarray(right), STEREO, CFG)
    disp = np.asarray(out.disparity)
    valid = disp >= 0
    # Central crop: borders may fail the LR check.
    crop = disp[8:-8, 12:-12]
    cropv = crop[crop >= 0]
    assert (crop >= 0).mean() > 0.9
    assert np.abs(cropv - d_true).mean() < 0.5
    assert (np.abs(cropv - d_true) <= 1.0).mean() > 0.95


def test_two_depth_layers(rng):
    """Left half at disparity 4, right half at disparity 12."""
    h, w = 48, 96
    d_a, d_b = 4, 12
    left = textured_image(h, w, rng)
    right = np.zeros_like(left)
    # Build right image region-wise from the left (approximation with a
    # seam; evaluate away from the seam).
    right[:, : w // 2] = np.roll(left, -d_a, axis=1)[:, : w // 2]
    right[:, w // 2 :] = np.roll(left, -d_b, axis=1)[:, w // 2 :]
    out = sgm.compute_disparity(jnp.asarray(left), jnp.asarray(right), STEREO, CFG)
    disp = np.asarray(out.disparity)
    region_a = disp[8:-8, 16 : w // 2 - 8]
    region_b = disp[8:-8, w // 2 + 16 : -8]
    va = region_a[region_a >= 0]
    vb = region_b[region_b >= 0]
    assert np.abs(np.median(va) - d_a) <= 1.0
    assert np.abs(np.median(vb) - d_b) <= 1.0


def test_census_transform_properties():
    img = jnp.asarray(
        np.array(
            [[1, 2, 3, 4, 5]] * 5,
            np.float32,
        )
    )
    c = np.asarray(sgm.census_transform(img, (3, 3)))
    # Flat vertical structure: bits only from horizontal comparisons.
    assert c.dtype == np.int32
    # A uniform image has zero census signature everywhere.
    flat = jnp.ones((8, 8), jnp.float32)
    assert (np.asarray(sgm.census_transform(flat, (5, 5))) == 0).all()


def test_hamming_cost_zero_at_true_disparity(rng):
    h, w, d_true = 16, 32, 5
    left = textured_image(h, w, rng)
    right = shift_right_image(left, d_true)
    cl = sgm.census_transform(jnp.asarray(left), (5, 5))
    cr = sgm.census_transform(jnp.asarray(right), (5, 5))
    vol = np.asarray(sgm.hamming_cost_volume(cl, cr, 8))
    # Interior pixels: cost at d_true is minimal (census of shifted image
    # matches except at window borders).
    interior = vol[4:-4, 12:-4, :]
    best = interior.argmin(-1)
    assert (best == d_true).mean() > 0.9


def test_dp_step_penalties():
    """DP recurrence: L(d) = C(d) + min(prev(d), prev(d±1)+P1, min_prev+P2)
    - min_prev, checked against a hand computation."""
    prev = jnp.asarray([[5.0, 1.0, 4.0, 9.0]])
    cost = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    out = np.asarray(sgm._dp_step(prev, cost, p1=2.0, p2=10.0))
    # min_prev = 1.
    # d=0: min(5, 1+2(from d=1), inf, 1+10) = 3 -> 1 + 3 - 1 = 3
    # d=1: min(1, 5+2, 4+2, 11) = 1 -> 1
    # d=2: min(4, 1+2, 9+2, 11) = 3 -> 3
    # d=3: min(9, 4+2, inf, 11) = 6 -> 6
    np.testing.assert_allclose(out[0], [3.0, 1.0, 3.0, 6.0])


def test_lr_check_invalidates_occlusion(rng):
    """A disparity discontinuity creates occluded pixels; LR check must mark
    some pixels invalid near the seam, and the metadata gates them."""
    h, w = 48, 96
    left = textured_image(h, w, rng)
    right = np.zeros_like(left)
    right[:, : w // 2] = np.roll(left, -2, axis=1)[:, : w // 2]
    right[:, w // 2 :] = np.roll(left, -14, axis=1)[:, w // 2 :]
    out = sgm.compute_disparity(jnp.asarray(left), jnp.asarray(right), STEREO, CFG)
    disp = np.asarray(out.disparity)
    assert (disp < 0).any()
    # Invalid pixels fail the DisparityImage validity gate.
    vm = np.asarray(out.valid_mask())
    assert not vm[disp < 0].any()


def test_subpixel_fractional_disparity(rng):
    """A fractional true disparity (bilinear-resampled right image) should
    yield subpixel estimates clustered near it."""
    h, w = 48, 64
    d_true = 6.5
    left = textured_image(h, w, rng)
    x = np.arange(w)
    right = np.stack(
        [np.interp(x + d_true, x, row) for row in left]
    ).astype(np.float32)
    out = sgm.compute_disparity(jnp.asarray(left), jnp.asarray(right), STEREO, CFG)
    disp = np.asarray(out.disparity)
    crop = disp[8:-8, 16:-8]
    v = crop[crop >= 0]
    assert np.abs(np.median(v) - d_true) < 0.5
    # Subpixel: a meaningful share of estimates are non-integer.
    assert (np.abs(v - np.round(v)) > 0.05).mean() > 0.3


def _brute_force_diagonal(cost, dy, dx, p1, p2):
    """O(H*W*D^2) reference diagonal SGM aggregation (path direction
    (dy, dx); predecessor of (y, x) is (y-dy, x-dx))."""
    h, w, d = cost.shape
    agg = np.zeros_like(cost)
    ys = range(h) if dy > 0 else range(h - 1, -1, -1)
    for y in ys:
        for x in range(w):
            py, px = y - dy, x - dx
            if 0 <= py < h and 0 <= px < w:
                prev = agg[py, px]
                pmin = prev.min()
                best = np.empty(d)
                for k in range(d):
                    cands = [prev[k], pmin + p2]
                    if k > 0:
                        cands.append(prev[k - 1] + p1)
                    if k < d - 1:
                        cands.append(prev[k + 1] + p1)
                    best[k] = min(cands)
                agg[y, x] = cost[y, x] + best - pmin
            else:
                agg[y, x] = cost[y, x]
    return agg


def test_diagonal_aggregation_matches_brute_force(rng):
    h, w, d = 10, 12, 6
    cost = rng.uniform(0.0, 20.0, (h, w, d)).astype(np.float32)
    p1, p2 = 2.0, 9.0
    for dy, rev in ((1, False), (-1, True)):
        for dx in (1, -1):
            got = np.asarray(sgm.aggregate_diagonal(
                jnp.asarray(cost), dx=dx, reverse=rev,
                p1=jnp.float32(p1), p2=jnp.float32(p2),
            ))
            want = _brute_force_diagonal(cost, dy, dx, p1, p2)
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"dy={dy} dx={dx}")


def test_eight_path_constant_plane(rng):
    """8-path aggregation (num_paths=8, the full CUDA-SGM-lineage path set,
    SURVEY.md §2.3) still recovers a constant-disparity plane and keeps
    validity coverage."""
    h, w, d_true = 48, 64, 7
    left = textured_image(h, w, rng)
    right = shift_right_image(left, d_true)
    cfg = dataclasses.replace(CFG, num_paths=8, backend="xla")
    disp = np.asarray(
        sgm.sgm_disparity_raw(jnp.asarray(left), jnp.asarray(right), cfg)
    )
    region = disp[2:-2, d_true + 2 : -2]
    valid = region >= 0
    assert valid.mean() > 0.9
    np.testing.assert_allclose(region[valid], d_true, atol=0.51)


def test_eight_path_pallas_raises():
    import pytest as _pytest

    cfg = dataclasses.replace(CFG, num_paths=8, backend="pallas")
    left = jnp.zeros((16, 32), jnp.float32)
    with _pytest.raises(ValueError, match="num_paths"):
        sgm.sgm_disparity_raw(left, left, cfg)


def test_bad_num_paths_raises():
    import pytest as _pytest

    cfg = dataclasses.replace(CFG, num_paths=6)
    left = jnp.zeros((16, 32), jnp.float32)
    with _pytest.raises(ValueError, match="num_paths"):
        sgm.sgm_disparity_raw(left, left, cfg)


def test_sgm_input_scale_half_res(rng):
    """_sgm_forward at sgm_input_scale=2: valid disparities come back in
    FULL-res units (d_full = 2 * d_half) on a constant-disparity plane and
    the -1 invalid marker survives nearest upsampling bit-exactly."""
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.pipeline import _sgm_forward

    h, w, d_true = 64, 96, 12  # even disparity: exact at half res
    left = textured_image(h, w, rng)
    right = shift_right_image(left, d_true)
    config = PipelineConfig(
        height=h, width=w, sgm_input_scale=2,
        sgm=dataclasses.replace(CFG, backend="xla"),
    )
    disp_img = _sgm_forward(
        jnp.asarray(left), jnp.asarray(right), STEREO, config
    )
    disp = np.asarray(disp_img.disparity)
    assert disp.shape == (h, w)
    # Metadata range covers the scaled disparities.
    assert float(disp_img.max_disparity) == 2.0 * (CFG.max_disparity - 1)
    region = disp[4:-4, d_true + 4 : -4]
    valid = region >= 0
    assert valid.mean() > 0.8
    np.testing.assert_allclose(region[valid], d_true, atol=1.1)
    # Invalid pixels are exactly -1 (never blended by the upsample).
    invalid = disp[disp < 0]
    assert invalid.size > 0
    np.testing.assert_array_equal(invalid, -1.0)


def test_sgm_input_scale_odd_resolution(rng):
    """At odd h/w with sgm_input_scale=2 the repeat+edge-pad nearest
    upsample must match the y -> min(y//s, hs-1) index map: the trailing
    full-res row/col replicates the LAST half-res source row/col (which
    rows h-3..h-1 / cols w-3..w-1 all map to)."""
    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.pipeline import _sgm_forward

    h, w, d_true = 65, 97, 12
    left = textured_image(h, w, rng)
    right = shift_right_image(left, d_true)
    config = PipelineConfig(
        height=h, width=w, sgm_input_scale=2,
        sgm=dataclasses.replace(CFG, backend="xla"),
    )
    disp = np.asarray(
        _sgm_forward(
            jnp.asarray(left), jnp.asarray(right), STEREO, config
        ).disparity
    )
    assert disp.shape == (h, w)
    np.testing.assert_array_equal(disp[h - 1], disp[h - 2])
    np.testing.assert_array_equal(disp[h - 2], disp[h - 3])
    np.testing.assert_array_equal(disp[:, w - 1], disp[:, w - 2])
    np.testing.assert_array_equal(disp[:, w - 2], disp[:, w - 3])


def test_uniqueness_semantics_on_crafted_volume():
    """Direct WTA-level check of the libSGM-lineage uniqueness rule
    (min over |d - best| > 1 of total(d), times ratio, must be >= best):
    an ambiguous far-away near-tie invalidates; adjacent near-ties
    (subpixel support) and clear winners do not."""
    h, w, d = 1, 16, 16
    total = np.full((h, w, d), 100.0, np.float32)
    # Columns >= 8 so the x >= d edge-support gate never fires (d=5).
    # Pixel 8: clear winner at d=5 (cost 50), everything else 100.
    total[0, 8, 5] = 50.0
    # Pixel 9: winner d=5 (50), near-tie at d=9 (51): 51*0.95 < 50.
    total[0, 9, 5] = 50.0
    total[0, 9, 9] = 51.0
    # Pixel 10: winner d=5 (50), near-tie only at the ADJACENT d=6 (51):
    # excluded from the test, stays valid.
    total[0, 10, 5] = 50.0
    total[0, 10, 6] = 51.0
    cfg = dataclasses.replace(
        CFG, max_disparity=d, lr_check=False, subpixel=False,
        uniqueness_ratio=0.95,
    )
    disp = np.asarray(sgm.wta_disparity(jnp.asarray(total), cfg))
    assert disp[0, 8] == 5.0
    assert disp[0, 9] == -1.0
    assert disp[0, 10] == 5.0
    # Disabled (0.0): all three valid.
    cfg_off = dataclasses.replace(cfg, uniqueness_ratio=0.0)
    disp_off = np.asarray(sgm.wta_disparity(jnp.asarray(total), cfg_off))
    np.testing.assert_array_equal(disp_off[0, 8:11], [5.0, 5.0, 5.0])


def test_uniqueness_pallas_v2_parity(rng):
    """uniqueness_ratio in the fused Pallas WTA is bitwise-equal to the XLA
    oracle (interpret mode)."""
    h, w, d_true = 24, 160, 5
    left = textured_image(h, w, rng)
    # Half the image periodic so both code paths exercise invalidation.
    xs = np.arange(w)
    left[: h // 2] = ((xs // 4) % 2).astype(np.float32)[None, :]
    right = shift_right_image(left, d_true)
    cfg = SGMConfig(
        max_disparity=128, uniqueness_ratio=0.95, backend="xla"
    )
    ref = np.asarray(
        sgm.sgm_disparity_raw(jnp.asarray(left), jnp.asarray(right), cfg)
    )
    cfg_pl = dataclasses.replace(cfg, backend="pallas_interpret")
    out = np.asarray(
        sgm.sgm_disparity_raw(jnp.asarray(left), jnp.asarray(right), cfg_pl)
    )
    np.testing.assert_array_equal(out, ref)


def test_uniqueness_v1_backend_raises():
    cfg = SGMConfig(uniqueness_ratio=0.95, backend="pallas_v1_interpret")
    left = jnp.zeros((16, 32))
    try:
        sgm.sgm_disparity_raw(left, left, cfg)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "uniqueness" in str(e)
