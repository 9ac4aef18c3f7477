"""Online AdaBoost — kkl/ml/online_boosting.hpp equivalent.

Grabner/Bischof-style online boosting ("On-line Boosting and Vision"):
``n_selectors`` selectors, each holding ``n_weak`` weak classifiers; a
training sample flows through the selectors sequentially, its importance
weight (lambda) rescaled by each selector's best error rate
(online_boosting.hpp:101-151,266-279).

TPU-native shape: ALL weak classifiers live in one stacked
:class:`~.classifiers.IndependentNB` pytree with leading axes
(n_selectors, n_weak); a selector's weak learners update in parallel
(vmap) while the selector chain itself is a ``lax.scan`` carrying lambda —
the only genuinely sequential dependency in the algorithm.

Weak learners are naive-Bayes stumps over random static feature subsets
(the role of the reference's WeakClassifierGenerator, which downstream
code instantiates with exactly such NB-on-subset learners,
online_boosting.hpp:26-60). Deliberate fixed-shape deviations, documented:

* no weak-classifier replacement (generate/replace,
  online_boosting.hpp:88-96,268-277): the recursive estimators inside each
  stump already adapt online, and regenerating stumps from a sample ring
  is a dynamic-shape operation; the stump POOL is fixed, its PARAMETERS
  are not.
* a "bad selector" (best error > 0.5, online_boosting.hpp:138-142) gets
  voting weight 0 and passes lambda through unchanged instead of
  replace+break.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .classifiers import (
    IndependentNB,
    independent_nb_init,
    independent_nb_predict_real,
    independent_nb_update,
)


class OnlineBoosting(NamedTuple):
    weak: IndependentNB       # stacked, leading axes (S, M)
    lambda_corr: jnp.ndarray  # (S, M)
    lambda_wrong: jnp.ndarray  # (S, M)


def online_boosting_init(
    n_selectors: int,
    n_weak: int,
    dim: int,
    subset_size: int | None = None,
    seed: int = 0,
) -> OnlineBoosting:
    """Build the ensemble: every stump sees a random feature subset of
    ``subset_size`` (default: ceil(sqrt(dim)), the usual stump
    diversity choice)."""
    if subset_size is None:
        subset_size = max(1, int(np.ceil(np.sqrt(dim))))
    rng = np.random.default_rng(seed)
    subs = np.stack(
        [
            np.sort(rng.choice(dim, size=subset_size, replace=False))
            for _ in range(n_selectors * n_weak)
        ]
    ).reshape(n_selectors, n_weak, subset_size)

    def make(sub):
        return independent_nb_init(dim, sub_indices=sub)

    weak = jax.vmap(jax.vmap(make))(jnp.asarray(subs, jnp.int32))
    ones = jnp.ones((n_selectors, n_weak), jnp.float32)
    # errors start at 0.5 via the (1, 1) correct/wrong accumulators
    # (WeakClassifierSelector::push, online_boosting.hpp:81-86).
    return OnlineBoosting(weak=weak, lambda_corr=ones, lambda_wrong=ones)


def online_boosting_update(
    state: OnlineBoosting, label, x
) -> OnlineBoosting:
    """One training sample through the selector chain
    (OnlineBoosting::update, online_boosting.hpp:242-279 +
    WeakClassifierSelector::update, :101-151)."""
    x = jnp.asarray(x)
    label = jnp.asarray(label, jnp.float32)
    sign = jnp.where(label > 0, 1.0, -1.0)

    def selector_step(lam, sel):
        weak, corr, wrong = sel
        signed = sign * jnp.abs(label) * lam  # label * lambda
        w = jnp.abs(signed)

        new_weak = jax.vmap(
            lambda wk: independent_nb_update(wk, signed, x)
        )(weak)
        pred = jax.vmap(
            lambda wk: independent_nb_predict_real(wk, x)
        )(new_weak)
        success = jnp.where(pred > 0, 1.0, -1.0) == sign

        corr = corr + jnp.where(success, w, 0.0)
        wrong = wrong + jnp.where(success, 0.0, w)
        errors = wrong / (corr + wrong)

        best = jnp.argmin(errors)
        best_err = errors[best]
        best_success = success[best]
        bad = (best_err > 0.5) | (best_err <= 0.0)
        next_lam = jnp.where(
            bad,
            lam,
            jnp.where(
                best_success,
                lam / (2.0 * (1.0 - best_err)),
                lam / (2.0 * best_err),
            ),
        )
        return next_lam, (new_weak, corr, wrong)

    _, (weak, corr, wrong) = lax.scan(
        selector_step,
        jnp.abs(label),
        (state.weak, state.lambda_corr, state.lambda_wrong),
    )
    return OnlineBoosting(weak=weak, lambda_corr=corr, lambda_wrong=wrong)


def _selector_votes(state: OnlineBoosting, x):
    """(S,) per-selector vote = voting_weight * best stump's real
    prediction (WeakClassifierSelector::predict,
    online_boosting.hpp:153-160)."""
    x = jnp.asarray(x)
    pred = jax.vmap(
        jax.vmap(lambda wk: independent_nb_predict_real(wk, x))
    )(state.weak)  # (S, M)
    errors = state.lambda_wrong / (state.lambda_corr + state.lambda_wrong)
    best = jnp.argmin(errors, axis=1)  # (S,)
    best_err = jnp.take_along_axis(errors, best[:, None], 1)[:, 0]
    voting_w = jnp.where(
        (best_err > 0.5) | (best_err <= 0.0),
        0.0,
        0.5 * jnp.log((1.0 - best_err) / best_err),
    )
    best_pred = jnp.take_along_axis(pred, best[:, None], 1)[:, 0]
    return voting_w * best_pred


def online_boosting_predict_real(state: OnlineBoosting, x):
    """Sigmoid-squashed ensemble confidence in (-1, 1) (predictReal,
    online_boosting.hpp:293-305)."""
    accum = jnp.sum(_selector_votes(state, x))
    n_sel = state.lambda_corr.shape[0]
    upper = 0.5 * jnp.log((1.0 - 0.05) / 0.05) * n_sel
    gain = 3.0 / upper
    return 2.0 / (1.0 + jnp.exp(-gain * accum)) - 1.0


def online_boosting_predict(state: OnlineBoosting, x):
    """+1/-1 (predict, online_boosting.hpp:312-314)."""
    return jnp.where(
        online_boosting_predict_real(state, x) > 0, 1, -1
    ).astype(jnp.int32)
