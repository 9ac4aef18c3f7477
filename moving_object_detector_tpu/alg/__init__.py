"""Reusable algorithm library — the kkl (Koide library) equivalent.

The reference vendors `kkl/`, a header-only C++ toolkit (SURVEY.md §2.2).
Its pipeline-critical pieces already live elsewhere in this framework:

* ``kkl/alg/kalman_filter.hpp``            -> tracker.py (batched SoA KF)
* ``kkl/alg/nearest_neighbor_association`` -> tracker.py (greedy NN)
* ``kkl/alg/global_nearest_neighbor`` + ``munkres.hpp``
                                           -> ops/assignment.py (Hungarian)
* ``kkl/math/gaussian.hpp`` (prob/Mahalanobis used by the tracker)
                                           -> tracker.py association cost

This package provides TPU-native equivalents of the REST of kkl — the
general-purpose toolkit a reference user could reach for even though the
moving-object pipeline itself doesn't wire them in:

* ``alg.gaussian``    — kkl/math/gaussian.hpp: densities, Mahalanobis, KL,
  fitting, incremental/recursive estimators, mixture models. Functional
  pytree states; everything jit/vmap-friendly.
* ``alg.classifiers`` — kkl/ml/{flann_knn_classifier, incremental_naive_
  bayes, independent_naive_bayes}.hpp: fixed-capacity brute-force kNN
  (TPU-friendly top-k over a dense distance row — the FLANN linear-index
  role) and online naive-Bayes classifiers.
* ``alg.boosting``    — kkl/ml/online_boosting.hpp: online AdaBoost
  (Grabner/Bischof selector ensemble) over naive-Bayes weak learners,
  as masked fixed-shape array state.
* ``alg.icf``         — kkl/cvk/*: integral-channel-features toolkit
  (HSV/LUV/gradient-histogram channels, integral images, normalized box
  filters) plus the cvutils color-palette/rect helpers.

(kkl/viewer/light_viewer.hpp — an OpenCV debug window — has no on-chip
role; its job is covered by the io/viz.py image/marker exports.)
"""

from . import boosting, classifiers, gaussian, icf  # noqa: F401
