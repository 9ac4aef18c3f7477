"""Online classifiers — kkl/ml/{flann_knn_classifier, incremental_naive_
bayes, independent_naive_bayes}.hpp equivalents.

All three are fixed-shape functional states:

* :class:`KNNClassifier` — the FLANN linear-index kNN classifier
  (flann_knn_classifier.hpp:23-180) as a fixed-capacity ring buffer of
  (point, label) rows plus a dense L2 row + ``lax.top_k`` per query —
  brute force IS the TPU-native index (one (n, p)x(p,) matvec on the MXU
  beats tree traversal for any capacity that fits on chip).
* :func:`incremental_nb_*` — scalar two-class naive Bayes over two
  recursive GaussianEstimaters (incremental_naive_bayes.hpp:9-46).
* :func:`independent_nb_*` — vector two-class naive Bayes over
  per-dimension IndependentGaussianEstimaters with an optional static
  feature-subset view (independent_naive_bayes.hpp:16-150).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian import (
    GaussianEstimater,
    IndependentGaussianEstimater,
    gaussian_estimater_init,
    gaussian_estimater_prob,
    gaussian_estimater_update,
    independent_gaussian_add,
    independent_gaussian_init,
    independent_gaussian_prob,
)

# ---------------------------------------------------------------------------
# kNN classifier (FLANN linear index -> dense distances + top_k)
# ---------------------------------------------------------------------------


class KNNClassifier(NamedTuple):
    """Fixed-capacity sample store. ``count`` grows monotonically; once
    past capacity the write cursor wraps (ring) — the reference grows
    without bound, which has no fixed-shape equivalent."""

    points: jnp.ndarray   # (capacity, p)
    labels: jnp.ndarray   # (capacity,) int32
    count: jnp.ndarray    # scalar int32, total points ever added


def knn_init(capacity: int, dim: int, dtype=jnp.float32) -> KNNClassifier:
    return KNNClassifier(
        points=jnp.zeros((capacity, dim), dtype),
        labels=jnp.zeros((capacity,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def knn_add(state: KNNClassifier, label, point) -> KNNClassifier:
    """addPoint (flann_knn_classifier.hpp:40-52)."""
    cap = state.points.shape[0]
    slot = jnp.mod(state.count, cap)
    return KNNClassifier(
        points=state.points.at[slot].set(jnp.asarray(point)),
        labels=state.labels.at[slot].set(jnp.asarray(label, jnp.int32)),
        count=state.count + 1,
    )


def _knn_neighbors(state: KNNClassifier, query, k: int):
    """Top-k nearest valid rows: (labels, sq_dists). Empty slots get +inf
    distance so they never vote (the reference errors on an empty index;
    here the vote set is simply empty-masked)."""
    cap = state.points.shape[0]
    valid = jnp.arange(cap) < state.count
    d = jnp.asarray(query)[None, :] - state.points
    sq = jnp.sum(d * d, axis=-1)
    sq = jnp.where(valid, sq, jnp.inf)
    neg, idx = jax.lax.top_k(-sq, k)
    return state.labels[idx], -neg


def knn_predict(
    state: KNNClassifier, query, k: int = 5,
    min_label: int = 0, max_label: int = 1,
):
    """Majority-vote label over the k nearest points (predict,
    flann_knn_classifier.hpp:57-84). The label range is static here
    (fixed one-hot width) where the reference tracks min/max dynamically."""
    labels, sq = _knn_neighbors(state, query, k)
    votable = jnp.isfinite(sq)
    n_labels = max_label - min_label + 1
    hist = jnp.sum(
        jax.nn.one_hot(labels - min_label, n_labels) * votable[:, None],
        axis=0,
    )
    return min_label + jnp.argmax(hist).astype(jnp.int32)


def knn_predict_binary(state: KNNClassifier, query, k: int = 5):
    """(is_positive, min_sq_dist) (predictBinary,
    flann_knn_classifier.hpp:90-119): positive iff pos votes > neg votes."""
    labels, sq = _knn_neighbors(state, query, k)
    votable = jnp.isfinite(sq)
    pos = jnp.sum((labels > 0) & votable)
    neg = jnp.sum((labels <= 0) & votable)
    return pos > neg, sq[0]


def knn_predict_binary_real(state: KNNClassifier, query, k: int = 5):
    """Signed confidence in (0, 1] (predictBinaryReal,
    flann_knn_classifier.hpp:126-160): sign = majority, magnitude =
    (max_votes - floor((k-1)/2)) / (k - floor((k-1)/2))."""
    labels, sq = _knn_neighbors(state, query, k)
    votable = jnp.isfinite(sq)
    pos = jnp.sum((labels > 0) & votable)
    neg = jnp.sum((labels <= 0) & votable)
    sign = jnp.where(pos > neg, 1.0, -1.0)
    half = (k - 1) // 2
    conf = (jnp.maximum(pos, neg) - half) / float(k - half)
    return sign * conf, sq[0]


# ---------------------------------------------------------------------------
# IncrementalNaiveBayes (scalar feature, incremental_naive_bayes.hpp)
# ---------------------------------------------------------------------------


class IncrementalNB(NamedTuple):
    pos_w: jnp.ndarray
    neg_w: jnp.ndarray
    pos: GaussianEstimater
    neg: GaussianEstimater


def incremental_nb_init(dtype=jnp.float32) -> IncrementalNB:
    return IncrementalNB(
        pos_w=jnp.asarray(1e-6, dtype),
        neg_w=jnp.asarray(1e-6, dtype),
        pos=gaussian_estimater_init(dtype=dtype),
        neg=gaussian_estimater_init(dtype=dtype),
    )


def incremental_nb_add(state: IncrementalNB, label, x) -> IncrementalNB:
    """add (incremental_naive_bayes.hpp:16-24): signed ``label`` is the
    weight; positive updates the pos class, else the neg class. Both
    branches compute (lax.cond-free, select-merged) — the untouched class
    gets a zero-weight update, which is exactly a no-op in the estimator
    recursion (K = 0)."""
    label = jnp.asarray(label)
    w = jnp.abs(label)
    is_pos = label > 0
    pos = gaussian_estimater_update(
        state.pos, jnp.where(is_pos, w, 0.0), x
    )
    neg = gaussian_estimater_update(
        state.neg, jnp.where(is_pos, 0.0, w), x
    )
    return IncrementalNB(
        pos_w=state.pos_w + jnp.where(is_pos, w, 0.0),
        neg_w=state.neg_w + jnp.where(is_pos, 0.0, w),
        pos=pos,
        neg=neg,
    )


def incremental_nb_predict_real(state: IncrementalNB, x):
    """Posterior difference (predict_real,
    incremental_naive_bayes.hpp:30-40)."""
    total = state.pos_w + state.neg_w
    return (
        state.pos_w / total * gaussian_estimater_prob(state.pos, x)
        - state.neg_w / total * gaussian_estimater_prob(state.neg, x)
    )


def incremental_nb_predict(state: IncrementalNB, x):
    """+1/-1 (predict, incremental_naive_bayes.hpp:26-28)."""
    return jnp.where(
        incremental_nb_predict_real(state, x) > 0, 1, -1
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# IndependentNaiveBayes (vector feature, independent_naive_bayes.hpp)
# ---------------------------------------------------------------------------


class IndependentNB(NamedTuple):
    pos_w: jnp.ndarray
    neg_w: jnp.ndarray
    pos: IndependentGaussianEstimater
    neg: IndependentGaussianEstimater
    # Static feature-subset view (sub_indices,
    # independent_naive_bayes.hpp:32-38,135-142); () = all features.
    sub_indices: jnp.ndarray


def independent_nb_init(
    dim: int, sub_indices=None, dtype=jnp.float32
) -> IndependentNB:
    if sub_indices is not None:
        sub_indices = jnp.asarray(sub_indices, jnp.int32)
        dim = int(sub_indices.shape[0])
    else:
        sub_indices = jnp.arange(dim, dtype=jnp.int32)
    return IndependentNB(
        pos_w=jnp.asarray(1e-3, dtype),
        neg_w=jnp.asarray(1e-3, dtype),
        pos=independent_gaussian_init(dim, dtype=dtype),
        neg=independent_gaussian_init(dim, dtype=dtype),
        sub_indices=sub_indices,
    )


def _sub(state: IndependentNB, x):
    return jnp.asarray(x)[state.sub_indices]


def independent_nb_update(state: IndependentNB, label, x) -> IndependentNB:
    """update/add_impl (independent_naive_bayes.hpp:44-51,93-103)."""
    f = _sub(state, x)
    label = jnp.asarray(label)
    w = jnp.abs(label)
    is_pos = label > 0
    pos = independent_gaussian_add(
        state.pos, jnp.where(is_pos, w, 0.0), f
    )
    neg = independent_gaussian_add(
        state.neg, jnp.where(is_pos, 0.0, w), f
    )
    return state._replace(
        pos_w=state.pos_w + jnp.where(is_pos, w, 0.0),
        neg_w=state.neg_w + jnp.where(is_pos, 0.0, w),
        pos=pos,
        neg=neg,
    )


def independent_nb_predict_real(state: IndependentNB, x):
    """Posterior difference (predict_real_impl,
    independent_naive_bayes.hpp:105-113)."""
    f = _sub(state, x)
    total = state.pos_w + state.neg_w
    return (
        state.pos_w / total * independent_gaussian_prob(state.pos, f)
        - state.neg_w / total * independent_gaussian_prob(state.neg, f)
    )


def independent_nb_predict(state: IndependentNB, x):
    return jnp.where(
        independent_nb_predict_real(state, x) > 0, 1, -1
    ).astype(jnp.int32)
