"""Tests for the alg package (kkl-library equivalents, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moving_object_detector_tpu.alg import boosting, classifiers, gaussian, icf


# ---------------------------------------------------------------------------
# gaussian
# ---------------------------------------------------------------------------


def test_gaussian_prob_uni_matches_closed_form():
    mean, var, x = 1.5, 0.7, 2.3
    expected = (
        1.0 / np.sqrt(2 * np.pi * var) * np.exp(-((x - mean) ** 2) / (2 * var))
    )
    assert np.isclose(float(gaussian.gaussian_prob_uni(mean, var, x)), expected)


def test_gaussian_prob_diag_cov_is_product_of_uni():
    mean = jnp.asarray([0.5, -1.0, 2.0])
    var = jnp.asarray([0.4, 1.2, 0.9])
    x = jnp.asarray([0.1, 0.0, 2.5])
    mul = gaussian.gaussian_prob(mean, jnp.diag(var), x)
    uni = jnp.prod(gaussian.gaussian_prob_uni(mean, var, x))
    assert np.isclose(float(mul), float(uni), rtol=1e-5)


def test_gaussian_prob_batched():
    mean = jnp.zeros((4, 2))
    cov = jnp.broadcast_to(jnp.eye(2), (4, 2, 2))
    x = jnp.zeros((4, 2))
    p = gaussian.gaussian_prob(mean, cov, x)
    assert p.shape == (4,)
    assert np.allclose(np.asarray(p), 1.0 / (2 * np.pi), rtol=1e-5)


def test_mahalanobis_identity_cov_is_sq_distance():
    mean = jnp.asarray([1.0, 2.0])
    x = jnp.asarray([4.0, 6.0])
    d2 = gaussian.squared_mahalanobis(mean, jnp.eye(2), x)
    assert np.isclose(float(d2), 25.0)
    assert np.isclose(
        float(gaussian.squared_mahalanobis_uni(1.0, 4.0, 5.0)), 4.0
    )


def test_fit_gaussian_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(200, 3)).astype(np.float32) @ np.diag(
        [1.0, 2.0, 0.5]
    ).astype(np.float32) + np.asarray([1.0, -2.0, 0.0], np.float32)
    mean, cov = gaussian.fit_gaussian(jnp.asarray(data))
    assert np.allclose(np.asarray(mean), data.mean(0), atol=1e-4)
    d = data - data.mean(0)
    assert np.allclose(np.asarray(cov), d.T @ d / len(data), atol=1e-3)


def test_fit_gaussian_weighted_mask_equals_subset():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(50, 2)).astype(np.float32)
    w = (np.arange(50) < 30).astype(np.float32)
    m1, c1 = gaussian.fit_gaussian(jnp.asarray(data), jnp.asarray(w))
    m2, c2 = gaussian.fit_gaussian(jnp.asarray(data[:30]))
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    assert np.allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_kl_divergence_zero_for_identical_and_uni_consistency():
    mean = jnp.asarray([1.0, 2.0])
    cov = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])
    assert np.isclose(
        float(gaussian.kl_divergence(mean, cov, mean, cov)), 0.0, atol=1e-5
    )
    kl_m = gaussian.kl_divergence(
        jnp.asarray([1.0]), jnp.asarray([[0.5]]),
        jnp.asarray([2.0]), jnp.asarray([[1.5]]),
    )
    kl_u = gaussian.kl_divergence_uni(1.0, 0.5, 2.0, 1.5)
    assert np.isclose(float(kl_m), float(kl_u), rtol=1e-5)


def test_l2_distance_uni_zero_means_close():
    # L2 distance of a density to itself is 0.
    assert np.isclose(
        float(gaussian.l2_distance_uni(0.3, 1.1, 0.3, 1.1)), 0.0, atol=1e-6
    )


def test_max_prob_is_prob_at_mean():
    cov = jnp.asarray([[1.5, 0.2], [0.2, 0.8]])
    mean = jnp.asarray([3.0, -1.0])
    assert np.isclose(
        float(gaussian.max_prob(cov)),
        float(gaussian.gaussian_prob(mean, cov, mean)),
        rtol=1e-5,
    )


def test_incremental_gaussian_uni_matches_batch_moments():
    rng = np.random.default_rng(2)
    xs = rng.normal(2.0, 1.5, size=32).astype(np.float32)
    ws = rng.uniform(0.5, 2.0, size=32).astype(np.float32)
    state = gaussian.incremental_gaussian_uni_init()
    for w, x in zip(ws, xs):
        state = gaussian.incremental_gaussian_uni_add(state, w, x)
    mean = np.sum(ws * xs) / np.sum(ws)
    var = np.sum(ws * xs * xs) / np.sum(ws) - mean * mean
    assert np.isclose(float(gaussian.incremental_gaussian_uni_mean(state)),
                      mean, rtol=1e-4)
    assert np.isclose(float(gaussian.incremental_gaussian_uni_var(state)),
                      var, rtol=1e-3)


def test_incremental_gaussian_matches_reference_recursion():
    # NumPy replica of IncrementalGaussianDistribution::add
    # (gaussian.hpp:355-366): rank-1 term uses the PRE-update mean.
    rng = np.random.default_rng(3)
    xs = rng.normal(size=(16, 2)).astype(np.float32)
    ws = rng.uniform(0.1, 1.0, size=16).astype(np.float32)
    accum_w, accum_mean, accum_cov = 0.0, np.zeros(2), np.zeros((2, 2))
    mean = np.zeros(2)
    for w, x in zip(ws, xs):
        d = x - mean
        accum_mean = accum_mean + w * x
        accum_cov = accum_cov + w * np.outer(d, d)
        accum_w += w
        mean = accum_mean / accum_w
    state = gaussian.incremental_gaussian_init(2)
    for w, x in zip(ws, xs):
        state = gaussian.incremental_gaussian_add(state, w, jnp.asarray(x))
    assert np.allclose(
        np.asarray(gaussian.incremental_gaussian_mean(state)), mean, atol=1e-5
    )
    assert np.allclose(
        np.asarray(gaussian.incremental_gaussian_cov(state)),
        accum_cov / accum_w,
        atol=1e-4,
    )


def test_gaussian_estimater_matches_reference_recursion():
    # NumPy replica of GaussianEstimater::update (gaussian.hpp:669-675).
    P, mean, var = 1000.0, 0.0, 1.0
    state = gaussian.gaussian_estimater_init()
    rng = np.random.default_rng(4)
    for _ in range(20):
        w = rng.uniform(0.2, 1.0)
        f = rng.normal(3.0, 0.5)
        R = 0.01
        K = min(1.0 - 1e-6, w * P / (P + R))
        mean = K * f + (1 - K) * mean
        var = K * (f - mean) ** 2 + (1 - K) * var
        P = (1 - K) * P
        state = gaussian.gaussian_estimater_update(state, w, f)
    assert np.isclose(float(state.mean), mean, rtol=1e-4)
    assert np.isclose(float(state.var), var, rtol=1e-3)
    assert np.isclose(
        float(gaussian.gaussian_estimater_prob(state, mean)),
        1.0 / np.sqrt(2 * np.pi * var),
        rtol=1e-3,
    )


def test_independent_gaussian_estimates_dimensions():
    rng = np.random.default_rng(5)
    xs = rng.normal([1.0, -2.0], [0.3, 0.6], size=(200, 2)).astype(np.float32)
    state = gaussian.independent_gaussian_init(2)
    state = gaussian.scan_add(
        state, gaussian.independent_gaussian_add,
        np.ones(200, np.float32), jnp.asarray(xs),
    )
    assert np.allclose(np.asarray(state.mean), [1.0, -2.0], atol=0.15)
    d2 = gaussian.independent_gaussian_mahalanobis_sq(state, state.mean)
    assert float(d2) < 1e-6
    assert float(gaussian.independent_gaussian_prob(state, state.mean)) > 0


def test_gmm_prob():
    w = jnp.asarray([0.3, 0.7])
    means = jnp.asarray([0.0, 4.0])
    variances = jnp.asarray([1.0, 1.0])
    p = gaussian.gmm_prob_uni(w, means, variances, 0.0)
    expected = 0.3 / np.sqrt(2 * np.pi) + 0.7 * float(
        gaussian.gaussian_prob_uni(4.0, 1.0, 0.0)
    )
    assert np.isclose(float(p), expected, rtol=1e-5)
    # multivariate: two unit-cov components
    p2 = gaussian.gmm_prob(
        w,
        jnp.zeros((2, 2)).at[1].set(4.0),
        jnp.broadcast_to(jnp.eye(2), (2, 2, 2)),
        jnp.zeros(2),
    )
    assert float(p2) > 0.3 / (2 * np.pi) * 0.99


# ---------------------------------------------------------------------------
# classifiers
# ---------------------------------------------------------------------------


def _two_cluster_knn(capacity=32):
    rng = np.random.default_rng(6)
    state = classifiers.knn_init(capacity, 2)
    for _ in range(10):
        state = classifiers.knn_add(
            state, 1, jnp.asarray(rng.normal([2.0, 2.0], 0.2), jnp.float32)
        )
        state = classifiers.knn_add(
            state, 0, jnp.asarray(rng.normal([-2.0, -2.0], 0.2), jnp.float32)
        )
    return state


def test_knn_predict_majority():
    state = _two_cluster_knn()
    assert int(classifiers.knn_predict(state, jnp.asarray([2.0, 1.8]))) == 1
    assert int(classifiers.knn_predict(state, jnp.asarray([-2.0, -1.8]))) == 0


def test_knn_predict_binary_and_confidence():
    state = _two_cluster_knn()
    is_pos, d = classifiers.knn_predict_binary(state, jnp.asarray([2.0, 2.0]))
    assert bool(is_pos) and float(d) < 1.0
    conf, _ = classifiers.knn_predict_binary_real(
        state, jnp.asarray([2.0, 2.0]), k=5
    )
    assert 0.0 < float(conf) <= 1.0
    conf_neg, _ = classifiers.knn_predict_binary_real(
        state, jnp.asarray([-2.0, -2.0]), k=5
    )
    assert -1.0 <= float(conf_neg) < 0.0


def test_knn_ring_wraps():
    state = classifiers.knn_init(4, 1)
    for i in range(6):
        state = classifiers.knn_add(state, i, jnp.asarray([float(i)]))
    # capacity 4: slots now hold samples 2..5 (0 and 1 overwritten by 4, 5)
    assert int(state.count) == 6
    lbl = classifiers.knn_predict(
        state, jnp.asarray([5.0]), k=1, min_label=0, max_label=5
    )
    assert int(lbl) == 5


def test_knn_empty_returns_min_label():
    state = classifiers.knn_init(8, 2)
    lbl = classifiers.knn_predict(
        state, jnp.asarray([0.0, 0.0]), min_label=3, max_label=5
    )
    assert int(lbl) == 3


def test_incremental_nb_separates():
    rng = np.random.default_rng(7)
    state = classifiers.incremental_nb_init()
    for _ in range(50):
        state = classifiers.incremental_nb_add(
            state, 1.0, float(rng.normal(2.0, 0.4))
        )
        state = classifiers.incremental_nb_add(
            state, -1.0, float(rng.normal(-2.0, 0.4))
        )
    assert int(classifiers.incremental_nb_predict(state, 1.8)) == 1
    assert int(classifiers.incremental_nb_predict(state, -1.8)) == -1


def test_independent_nb_sub_indices():
    # informative feature at index 2; indices 0-1 are noise.
    rng = np.random.default_rng(8)
    state = classifiers.independent_nb_init(3, sub_indices=[2])
    for _ in range(60):
        pos = jnp.asarray(
            [rng.normal(), rng.normal(), rng.normal(1.5, 0.3)], jnp.float32
        )
        neg = jnp.asarray(
            [rng.normal(), rng.normal(), rng.normal(-1.5, 0.3)], jnp.float32
        )
        state = classifiers.independent_nb_update(state, 1.0, pos)
        state = classifiers.independent_nb_update(state, -1.0, neg)
    q_pos = jnp.asarray([5.0, -5.0, 1.4], jnp.float32)  # noise dims extreme
    q_neg = jnp.asarray([5.0, -5.0, -1.4], jnp.float32)
    assert int(classifiers.independent_nb_predict(state, q_pos)) == 1
    assert int(classifiers.independent_nb_predict(state, q_neg)) == -1


# ---------------------------------------------------------------------------
# boosting
# ---------------------------------------------------------------------------


def test_online_boosting_learns_separable():
    rng = np.random.default_rng(9)
    state = boosting.online_boosting_init(
        n_selectors=4, n_weak=3, dim=2, subset_size=2, seed=0
    )
    update = jax.jit(boosting.online_boosting_update)
    for _ in range(80):
        pos = jnp.asarray(rng.normal([1.5, 1.5], 0.3), jnp.float32)
        neg = jnp.asarray(rng.normal([-1.5, -1.5], 0.3), jnp.float32)
        state = update(state, 1.0, pos)
        state = update(state, -1.0, neg)
    assert int(
        boosting.online_boosting_predict(state, jnp.asarray([1.4, 1.4]))
    ) == 1
    assert int(
        boosting.online_boosting_predict(state, jnp.asarray([-1.4, -1.4]))
    ) == -1
    conf = float(
        boosting.online_boosting_predict_real(state, jnp.asarray([1.4, 1.4]))
    )
    assert 0.0 < conf < 1.0


# ---------------------------------------------------------------------------
# icf
# ---------------------------------------------------------------------------


def test_integral_box_filter_matches_numpy_mean():
    rng = np.random.default_rng(10)
    img = rng.uniform(size=(40, 60)).astype(np.float32)
    integ = icf.integral_image(jnp.asarray(img))
    # fractional ROI -> pixel rect (x0, y0, w, h) via truncation
    tl = (0.25, 0.5)
    size = (0.5, 0.25)
    x0, y0 = int(0.25 * 60), int(0.5 * 40)
    w, h = int(0.5 * 60), int(0.25 * 40)
    expected = img[y0 : y0 + h, x0 : x0 + w].mean()
    got = float(icf.box_filter(integ, tl, size))
    assert np.isclose(got, expected, rtol=1e-4)


def test_box_filter_small_rect_is_zero():
    img = jnp.ones((40, 60))
    integ = icf.integral_image(img)
    assert float(icf.box_filter(integ, (0.0, 0.0), (0.02, 0.5))) == 0.0


def test_box_filter_bank_and_channel_axis():
    rng = np.random.default_rng(11)
    img = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    integ = icf.integral_image(jnp.asarray(img))
    tls = [(0.0, 0.0), (0.5, 0.5)]
    sizes = [(0.5, 0.5), (0.5, 0.5)]
    out = icf.box_filter_bank(integ, tls, sizes)
    assert out.shape == (2, 3)
    assert np.isclose(
        float(out[0, 1]), img[1, :16, :16].mean(), rtol=1e-4
    )


def test_extract_hsv_known_colors():
    rgb = jnp.asarray(
        [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.5, 0.5, 0.5]]]
    )  # (1, 3, 3)
    h, s, v = np.asarray(icf.extract_hsv(rgb))
    assert np.isclose(h[0, 0], 0.0)          # red hue
    assert np.isclose(h[0, 1], 60.0)         # green: 120 deg / 2
    assert np.isclose(s[0, 0], 255.0)
    assert np.isclose(s[0, 2], 0.0)          # gray: no saturation
    assert np.isclose(v[0, 2], 127.5)


def test_extract_luv_white_and_range():
    rgb = jnp.ones((2, 2, 3))
    l, u, v = np.asarray(icf.extract_luv(rgb))
    assert np.allclose(l, 255.0, atol=1.0)   # white: L* = 100 -> 255
    # u, v at the white point -> offsets map into [0, 255]
    assert np.all((u >= 0) & (u <= 255)) and np.all((v >= 0) & (v <= 255))


def test_extract_grads_vertical_edge():
    img = jnp.concatenate(
        [jnp.zeros((8, 8)), jnp.ones((8, 8))], axis=1
    )  # step along x -> pure horizontal gradient, angle 0 -> bin 0
    ch = np.asarray(icf.extract_grads(img, n_bins=6))
    assert ch.shape == (7, 8, 16)
    col = 7  # at the edge
    assert ch[0, 4, col] > 0          # bin 0 carries the magnitude
    assert np.allclose(ch[1:6, 4, col], 0.0)
    assert np.isclose(ch[6, 4, col], ch[0, 4, col])  # total magnitude


def test_default_channel_bank_shape():
    rng = np.random.default_rng(12)
    rgb = jnp.asarray(rng.uniform(size=(16, 20, 3)).astype(np.float32))
    bank = icf.default_channel_bank()
    out = bank(rgb)
    assert out.shape == (13, 16, 20)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_palette_and_rect_utils():
    pal = icf.create_color_palette(8)
    assert pal.shape == (8, 3)
    assert pal.min() >= 0.0 and pal.max() <= 255.0
    # distinct hues
    assert len({tuple(np.round(c, 3)) for c in pal}) == 8
    assert icf.clip_roi((-5, -5, 20, 20), (12, 10)) == (0, 0, 12, 10)
    assert icf.enlarge_rect((10, 10, 10, 10), 2.0) == (5.0, 5.0, 20.0, 20.0)
    assert icf.shift_rect((1, 2, 3, 4), (10, 20)) == (11, 22, 3, 4)
