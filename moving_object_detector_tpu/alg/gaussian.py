"""Gaussian math toolkit — kkl/math/gaussian.hpp equivalent.

Scalar ("uni") and multivariate densities, Mahalanobis distances,
divergences, batch fitting, and the three stateful estimators
(IncrementalGaussianDistribution, GaussianEstimater,
IndependentGaussianEstimater) as functional pytree states: ``*_init`` makes
the state, ``*_add``/``*_update`` returns a NEW state, queries are pure.
Everything is shape-polymorphic over leading batch axes where noted and
safe under jit/vmap/scan (no data-dependent shapes).

Reference: kkl/include/kkl/math/gaussian.hpp (cited per function).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Densities and distances
# ---------------------------------------------------------------------------

def gaussian_prob_uni(mean, var, x):
    """Scalar normal density N(x; mean, var) (gaussian.hpp:35-38).
    Elementwise over broadcast arguments."""
    mean, var, x = map(jnp.asarray, (mean, var, x))
    d = x - mean
    return jnp.exp(-(d * d) / (2.0 * var)) / jnp.sqrt(2.0 * jnp.pi * var)


def gaussian_prob(mean, cov, x):
    """Multivariate normal density (gaussianProbMul, gaussian.hpp:44-51).

    ``mean``/``x``: (..., p); ``cov``: (..., p, p). Uses a solve rather
    than the reference's explicit inverse (same value, better
    conditioning and an MXU-friendly lowering)."""
    mean = jnp.asarray(mean)
    cov = jnp.asarray(cov)
    x = jnp.asarray(x)
    p = mean.shape[-1]
    d = x - mean
    sol = jnp.linalg.solve(cov, d[..., None])[..., 0]
    quad = jnp.sum(d * sol, axis=-1)
    det = jnp.linalg.det(cov)
    norm = jnp.power(2.0 * jnp.pi, p / 2.0) * jnp.sqrt(det)
    return jnp.exp(-0.5 * quad) / norm


def gaussian_cumulative_prob_uni(mean, var, x):
    """Normal CDF (gaussian.hpp:57-59, the boost::math::erf variant)."""
    from jax.scipy.special import erf

    return 0.5 * (1.0 + erf((x - mean) / jnp.sqrt(2.0 * var)))


def squared_mahalanobis(mean, cov, x):
    """(x-mean)^T cov^-1 (x-mean) (gaussian.hpp:66-71); batched like
    :func:`gaussian_prob`."""
    mean = jnp.asarray(mean)
    d = jnp.asarray(x) - mean
    sol = jnp.linalg.solve(jnp.asarray(cov), d[..., None])[..., 0]
    return jnp.sum(d * sol, axis=-1)


def squared_mahalanobis_uni(mean, var, x):
    """Scalar Mahalanobis^2 (gaussian.hpp:77-80)."""
    d = jnp.asarray(mean) - jnp.asarray(x)
    return d * d / jnp.asarray(var)


def kl_divergence_uni(mean_p, var_p, mean_q, var_q):
    """KL(N_p || N_q), scalar case (gaussian.hpp:126-128)."""
    dm = mean_p - mean_q
    return (
        jnp.log(jnp.sqrt(var_q / var_p))
        + (var_p + dm * dm) / (2.0 * var_q)
        - 0.5
    )


def kl_divergence(mean_p, cov_p, mean_q, cov_q):
    """KL(N_p || N_q), multivariate (klDivergenceMul, gaussian.hpp:134-140)."""
    mean_p = jnp.asarray(mean_p)
    p = mean_p.shape[-1]
    dm = mean_p - jnp.asarray(mean_q)
    cov_q = jnp.asarray(cov_q)
    cov_p = jnp.asarray(cov_p)
    sol = jnp.linalg.solve(cov_q, cov_p)
    trace = jnp.trace(sol, axis1=-2, axis2=-1)
    quad = jnp.sum(dm * jnp.linalg.solve(cov_q, dm[..., None])[..., 0], -1)
    logdet = jnp.log(jnp.linalg.det(cov_q) / jnp.linalg.det(cov_p))
    return 0.5 * (logdet + trace + quad - p)


def l2_distance_uni(mean_p, var_p, mean_q, var_q):
    """Closed-form L2 distance between scalar normal densities
    (gaussian.hpp:146-155)."""
    mean = (var_q * mean_p + var_p * mean_q) / (var_p + var_q)
    var = (var_p * var_q) / (var_p + var_q)
    a = mean * mean - (
        var_q * mean_p * mean_p + var_p * mean_q * mean_q
    ) / (var_p + var_q)
    return (
        1.0 / (2.0 * jnp.sqrt(jnp.pi * var_p))
        + 1.0 / (2.0 * jnp.sqrt(jnp.pi * var_q))
        - jnp.sqrt(2.0 * jnp.pi * var)
        / (jnp.pi * jnp.sqrt(var_p * var_q))
        * jnp.exp(a / (2.0 * var))
    )


def fit_gaussian(data, weights=None):
    """Batch-fit (mean, cov) with 1/N normalization (fitGaussian,
    gaussian.hpp:88-99). ``data``: (n, p); optional ``weights``: (n,) —
    masked/weighted fitting is the fixed-shape substitute for the
    reference's growable std::vector input."""
    data = jnp.asarray(data)
    if weights is None:
        weights = jnp.ones(data.shape[0], data.dtype)
    weights = jnp.asarray(weights)
    wsum = jnp.sum(weights)
    mean = jnp.sum(weights[:, None] * data, axis=0) / wsum
    d = data - mean
    cov = (weights[:, None] * d).T @ d / wsum
    return mean, cov


# ---------------------------------------------------------------------------
# GaussianDistribution(Uni): frozen distributions are just (mean, cov)
# argument pairs here — the reference classes (gaussian.hpp:162-281) only
# precompute the normalizer, which XLA CSEs for free. `gaussian_prob*`
# and `squared_mahalanobis*` are their `prob`/`mahalanobisDistance`.
# ---------------------------------------------------------------------------


def max_prob(cov):
    """Density at the mean (GaussianDistribution::maxProb,
    gaussian.hpp:252-254)."""
    cov = jnp.asarray(cov)
    p = cov.shape[-1]
    return 1.0 / (
        jnp.power(2.0 * jnp.pi, p / 2.0) * jnp.sqrt(jnp.linalg.det(cov))
    )


# ---------------------------------------------------------------------------
# IncrementalGaussianDistribution (gaussian.hpp:283-478)
# ---------------------------------------------------------------------------


class IncrementalGaussian(NamedTuple):
    """Weighted streaming mean/covariance accumulator state."""

    accum_w: jnp.ndarray    # scalar
    accum_mean: jnp.ndarray  # (p,)  == sum w_i x_i
    accum_cov: jnp.ndarray   # (p, p) == sum w_i (x_i - mean_before) d^T


def incremental_gaussian_init(dim: int, dtype=jnp.float32):
    """Zero state (IncrementalGaussianDistribution ctor,
    gaussian.hpp:299-316)."""
    return IncrementalGaussian(
        accum_w=jnp.zeros((), dtype),
        accum_mean=jnp.zeros((dim,), dtype),
        accum_cov=jnp.zeros((dim, dim), dtype),
    )


def incremental_gaussian_add(state: IncrementalGaussian, w, x):
    """Add a weighted sample (add, gaussian.hpp:355-366). Matches the
    reference exactly, including its use of the PRE-update mean in the
    covariance rank-1 term."""
    x = jnp.asarray(x)
    mean_before = jnp.where(
        state.accum_w > 0, state.accum_mean / state.accum_w, 0.0
    )
    d = x - mean_before
    return IncrementalGaussian(
        accum_w=state.accum_w + w,
        accum_mean=state.accum_mean + w * x,
        accum_cov=state.accum_cov + w * jnp.outer(d, d),
    )


def incremental_gaussian_mean(state: IncrementalGaussian):
    return state.accum_mean / state.accum_w


def incremental_gaussian_cov(state: IncrementalGaussian):
    """Lazy covariance (update, gaussian.hpp:443-452)."""
    return state.accum_cov / state.accum_w


def incremental_gaussian_prob(state: IncrementalGaussian, x):
    return gaussian_prob(
        incremental_gaussian_mean(state), incremental_gaussian_cov(state), x
    )


class IncrementalGaussianUni(NamedTuple):
    """Scalar streaming accumulator (IncrementalGaussianDistributionUni,
    gaussian.hpp:480-528): plain weighted first/second moments."""

    accum_w: jnp.ndarray
    accum_wx: jnp.ndarray
    accum_wx_sq: jnp.ndarray


def incremental_gaussian_uni_init(dtype=jnp.float32):
    z = jnp.zeros((), dtype)
    return IncrementalGaussianUni(z, z, z)


def incremental_gaussian_uni_add(state: IncrementalGaussianUni, w, x):
    return IncrementalGaussianUni(
        accum_w=state.accum_w + w,
        accum_wx=state.accum_wx + w * x,
        accum_wx_sq=state.accum_wx_sq + w * x * x,
    )


def incremental_gaussian_uni_mean(state: IncrementalGaussianUni):
    return state.accum_wx / state.accum_w


def incremental_gaussian_uni_var(state: IncrementalGaussianUni):
    m = incremental_gaussian_uni_mean(state)
    return state.accum_wx_sq / state.accum_w - m * m


def incremental_gaussian_uni_prob(state: IncrementalGaussianUni, x):
    return gaussian_prob_uni(
        incremental_gaussian_uni_mean(state),
        incremental_gaussian_uni_var(state),
        x,
    )


# ---------------------------------------------------------------------------
# Mixture models (GaussianMixtureModel(Uni), gaussian.hpp:530-646):
# stacked-component arrays instead of vectors of objects.
# ---------------------------------------------------------------------------


def gmm_prob_uni(weights, means, variances, x):
    """sum_k w_k N(x; mu_k, var_k); components on the leading axis of the
    (k,) parameter arrays, ``x`` any shape (broadcast against components)."""
    x = jnp.asarray(x)[..., None]
    comp = gaussian_prob_uni(means, variances, x)
    return jnp.sum(jnp.asarray(weights) * comp, axis=-1)


def gmm_prob(weights, means, covs, x):
    """Multivariate mixture density; ``means``: (k, p), ``covs``:
    (k, p, p), ``x``: (..., p)."""
    comp = gaussian_prob(means, covs, jnp.asarray(x)[..., None, :])
    return jnp.sum(jnp.asarray(weights) * comp, axis=-1)


# ---------------------------------------------------------------------------
# GaussianEstimater (gaussian.hpp:648-698): scalar Kalman-style recursive
# estimator with fixed measurement noise R=0.01.
# ---------------------------------------------------------------------------


class GaussianEstimater(NamedTuple):
    P: jnp.ndarray
    mean: jnp.ndarray
    var: jnp.ndarray


def gaussian_estimater_init(
    init_mean=0.0, init_var=1.0, init_p=1000.0, dtype=jnp.float32
):
    return GaussianEstimater(
        P=jnp.asarray(init_p, dtype),
        mean=jnp.asarray(init_mean, dtype),
        var=jnp.asarray(init_var, dtype),
    )


def gaussian_estimater_update(state: GaussianEstimater, w, f):
    """update (gaussian.hpp:669-675): gain-clamped recursive mean/var.
    The variance innovation uses the POST-update mean, as the reference
    does."""
    r = 0.01
    k = jnp.minimum(1.0 - 1e-6, w * state.P / (state.P + r))
    mean = k * f + (1.0 - k) * state.mean
    var = k * (f - mean) ** 2 + (1.0 - k) * state.var
    return GaussianEstimater(P=(1.0 - k) * state.P, mean=mean, var=var)


def gaussian_estimater_prob(state: GaussianEstimater, f):
    return gaussian_prob_uni(state.mean, state.var, f)


# ---------------------------------------------------------------------------
# IndependentGaussianEstimater (gaussian.hpp:700-755): per-dimension
# independent recursive estimator ("On-line Boosting and Vision").
# ---------------------------------------------------------------------------


class IndependentGaussianEstimater(NamedTuple):
    P: jnp.ndarray       # scalar
    R: jnp.ndarray       # scalar process noise
    mean: jnp.ndarray    # (p,)
    var: jnp.ndarray     # (p,)


def independent_gaussian_init(
    dim: int, process_noise=0.01, init_mean=None, init_var=None,
    init_p=1000.0, dtype=jnp.float32,
):
    mean = (
        jnp.zeros((dim,), dtype) if init_mean is None
        else jnp.asarray(init_mean, dtype)
    )
    var = (
        jnp.ones((dim,), dtype) if init_var is None
        else jnp.asarray(init_var, dtype)
    )
    return IndependentGaussianEstimater(
        P=jnp.asarray(init_p, dtype),
        R=jnp.asarray(process_noise, dtype),
        mean=mean,
        var=var,
    )


def independent_gaussian_add(state: IndependentGaussianEstimater, w, x):
    """add (gaussian.hpp:725-731): same post-update-mean recursion as
    GaussianEstimater but per-dimension, with configurable process noise
    and an unclamped-to-1.0 gain."""
    k = jnp.minimum(1.0, state.P / (state.P + state.R) * w)
    x = jnp.asarray(x)
    mean = k * x + (1.0 - k) * state.mean
    var = k * (x - mean) ** 2 + (1.0 - k) * state.var
    return state._replace(P=(1.0 - k) * state.P, mean=mean, var=var)


def independent_gaussian_mahalanobis_sq(
    state: IndependentGaussianEstimater, x
):
    return jnp.sum((jnp.asarray(x) - state.mean) ** 2 / state.var, axis=-1)


def independent_gaussian_prob(state: IndependentGaussianEstimater, x):
    """Product of per-dimension densities (gaussian.hpp:740-744)."""
    return jnp.prod(
        gaussian_prob_uni(state.mean, state.var, jnp.asarray(x)), axis=-1
    )


def scan_add(init_state, add_fn, weights, xs):
    """Fold a batch of weighted samples through any of the ``*_add``
    updaters with lax.scan (the TPU form of the reference's per-sample
    method-call loops)."""

    def step(state, wx):
        w, x = wx
        return add_fn(state, w, x), None

    state, _ = lax.scan(step, init_state, (jnp.asarray(weights), xs))
    return state
