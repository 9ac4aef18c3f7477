"""Multi-object tracking: batched constant-velocity Kalman filters + greedy
nearest-neighbor association, fully under jit.

TPU-native rewrite of moving_object_tracker (moving_objects_tracker.cpp,
kalman_tracker.hpp, kkl/alg/kalman_filter.hpp,
kkl/alg/nearest_neighbor_association.hpp): the reference's
``std::vector<KalmanTracker::Ptr>`` becomes a fixed-capacity SoA tensor bank
with an ``active`` mask; all per-tracker loops become vmapped linear algebra.

Preserved semantics:
* state x = (px, py, vx, vy); transition I with dt injected at (0,2),(1,3),
  dt = max(0.001, t - last_prediction) (kalman_tracker.hpp:65-74);
* fixed noises Q = diag(0.003, 0.003, 0.01, 0.01), R = 0.2 I, P0 = 0.1 I
  (kalman_tracker.hpp:42-51);
* association score = -N(x; mean, cov) with gates sqrt(mahalanobis) > 3 or
  ||mean - x|| > 1.5 (moving_objects_tracker.cpp:14-31), resolved greedily
  best-first with row/col elimination
  (nearest_neighbor_association.hpp:28-58);
* spawn for unmatched detections unless within 2 * object_radius of any
  existing track — including tracks spawned earlier in the same frame, hence
  the sequential scan (moving_objects_tracker.cpp:157-185);
* prune when position or velocity covariance trace >= covariance_trace_limit
  (:187-196);
* publish only tracks with correction_count >= limit corrected at this exact
  stamp, copying the associated detection and overriding (px, py, vx, vy)
  with the filter state — z center and vz stay from the detection
  (:81-103).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .config import TrackerConfig
from .types import MovingObjects, TrackedObjects


@struct.dataclass
class TrackerState:
    """Fixed-capacity SoA tracker bank."""

    mean: jnp.ndarray  # (T, 4) f32: px, py, vx, vy
    cov: jnp.ndarray  # (T, 4, 4) f32
    active: jnp.ndarray  # (T,) bool
    id: jnp.ndarray  # (T,) int32
    correction_count: jnp.ndarray  # (T,) int32
    last_correction_time: jnp.ndarray  # (T,) f32
    last_prediction_time: jnp.ndarray  # (T,) f32
    # Last associated detection, kept so publishing can copy it
    # (moving_objects_tracker.cpp:94-99): center(3) + velocity(3) + bbox(3).
    last_obs: jnp.ndarray  # (T, 9) f32
    next_id: jnp.ndarray  # () int32

    @classmethod
    def create(cls, capacity: int) -> "TrackerState":
        return cls(
            mean=jnp.zeros((capacity, 4), jnp.float32),
            cov=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            active=jnp.zeros((capacity,), bool),
            id=jnp.full((capacity,), -1, jnp.int32),
            correction_count=jnp.zeros((capacity,), jnp.int32),
            last_correction_time=jnp.full((capacity,), -1.0, jnp.float32),
            last_prediction_time=jnp.zeros((capacity,), jnp.float32),
            last_obs=jnp.zeros((capacity, 9), jnp.float32),
            next_id=jnp.int32(0),
        )

    @property
    def capacity(self) -> int:
        return self.mean.shape[0]


def _process_noise(cfg: TrackerConfig) -> jnp.ndarray:
    q = jnp.zeros((4, 4), jnp.float32)
    q = q.at[0, 0].set(cfg.process_noise_pos).at[1, 1].set(cfg.process_noise_pos)
    q = q.at[2, 2].set(cfg.process_noise_vel).at[3, 3].set(cfg.process_noise_vel)
    return q


def predict(state: TrackerState, t: jnp.ndarray, cfg: TrackerConfig) -> TrackerState:
    """KF predict for every active tracker (kalman_tracker.hpp:65-74,
    kalman_filter.hpp:62-71): mean' = A mean, cov' = A cov A^T + Q."""
    dt = jnp.maximum(cfg.min_dt, t - state.last_prediction_time)  # (T,)
    eye = jnp.eye(4, dtype=jnp.float32)
    a = jnp.tile(eye, (state.capacity, 1, 1))
    a = a.at[:, 0, 2].set(dt).at[:, 1, 3].set(dt)
    q = _process_noise(cfg)
    new_mean = jnp.einsum("tij,tj->ti", a, state.mean)
    new_cov = jnp.einsum("tij,tjk,tlk->til", a, state.cov, a) + q
    keep = state.active
    return state.replace(
        mean=jnp.where(keep[:, None], new_mean, state.mean),
        cov=jnp.where(keep[:, None, None], new_cov, state.cov),
        last_prediction_time=jnp.where(keep, t, state.last_prediction_time),
    )


def _chol_inv_det4(a: jnp.ndarray):
    """Batched inverse + determinant of SPD (..., 4, 4) matrices via an
    unrolled Cholesky. jnp.linalg.inv/det lower to LU custom-calls that
    XLA cannot fuse into the surrounding program (~0.1 ms each in-context,
    the same cost egomotion._chol_solve6 removed from the GN solver);
    covariances here are SPD by construction, so closed-form Cholesky is
    exact and fuses into the tracker's elementwise program."""
    eps = jnp.float32(1e-12)
    aij = lambda i, j: a[..., i, j]
    l00 = jnp.sqrt(jnp.maximum(aij(0, 0), eps))
    l10 = aij(1, 0) / l00
    l20 = aij(2, 0) / l00
    l30 = aij(3, 0) / l00
    l11 = jnp.sqrt(jnp.maximum(aij(1, 1) - l10 * l10, eps))
    l21 = (aij(2, 1) - l20 * l10) / l11
    l31 = (aij(3, 1) - l30 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(aij(2, 2) - l20 * l20 - l21 * l21, eps))
    l32 = (aij(3, 2) - l30 * l20 - l31 * l21) / l22
    l33 = jnp.sqrt(
        jnp.maximum(aij(3, 3) - l30 * l30 - l31 * l31 - l32 * l32, eps)
    )
    prod_diag = l00 * l11 * l22 * l33
    det = prod_diag * prod_diag
    # M = inv(L), lower triangular, unrolled forward substitution.
    m00 = 1.0 / l00
    m11 = 1.0 / l11
    m22 = 1.0 / l22
    m33 = 1.0 / l33
    m10 = -(l10 * m00) * m11
    m21 = -(l21 * m11) * m22
    m32 = -(l32 * m22) * m33
    m20 = -(l20 * m00 + l21 * m10) * m22
    m31 = -(l31 * m11 + l32 * m21) * m33
    m30 = -(l30 * m00 + l31 * m10 + l32 * m20) * m33
    z = jnp.zeros_like(m00)
    m = jnp.stack(
        [
            jnp.stack([m00, z, z, z], axis=-1),
            jnp.stack([m10, m11, z, z], axis=-1),
            jnp.stack([m20, m21, m22, z], axis=-1),
            jnp.stack([m30, m31, m32, m33], axis=-1),
        ],
        axis=-2,
    )
    # inv(A) = Mᵀ M
    inv = jnp.einsum("...ki,...kj->...ij", m, m)
    return inv, det


def _association_cost(state: TrackerState, obs4: jnp.ndarray, obs_valid, cfg):
    """(T, O) association cost: -gaussianProbMul(mean, cov, x)
    (moving_objects_tracker.cpp:30, kkl/math/gaussian.hpp:45-51) with the
    mahalanobis/euclidean gates (:27) and inf for gated/invalid pairs.

    Note the reference gates on the *state* covariance, not the innovation
    covariance — preserved as-is.
    """
    inv_cov, det = _chol_inv_det4(state.cov)  # (T, 4, 4), (T,)
    diff = obs4[None, :, :] - state.mean[:, None, :]  # (T, O, 4)
    mahal_sq = jnp.einsum("toi,tij,toj->to", diff, inv_cov, diff)
    eucl = jnp.linalg.norm(diff, axis=-1)
    gate = (mahal_sq <= cfg.gating_mahalanobis**2) & (
        eucl <= cfg.gating_deviation
    )
    norm_const = 1.0 / (
        (2.0 * jnp.pi) ** 2 * jnp.sqrt(jnp.maximum(det, 1e-30))
    )
    prob = norm_const[:, None] * jnp.exp(-0.5 * mahal_sq)
    cost = -prob
    invalid = (
        ~gate | ~state.active[:, None] | ~obs_valid[None, :]
    )
    return jnp.where(invalid, jnp.inf, cost)


def _greedy_associate(cost: jnp.ndarray):
    """Greedy best-first assignment with conflict elimination
    (nearest_neighbor_association.hpp:45-55). Returns, per tracker, the
    matched observation index or -1."""
    n_trackers, n_obs = cost.shape
    max_pairs = min(n_trackers, n_obs)

    def body(_, carry):
        cost, match = carry
        flat = jnp.argmin(cost.reshape(-1))
        r = flat // n_obs
        c = flat % n_obs
        found = jnp.isfinite(cost[r, c])
        match = jnp.where(
            found, match.at[r].set(c.astype(jnp.int32)), match
        )
        cost = jnp.where(found, cost.at[r, :].set(jnp.inf).at[:, c].set(jnp.inf), cost)
        return cost, match

    match0 = jnp.full((n_trackers,), -1, jnp.int32)
    _, match = jax.lax.fori_loop(0, max_pairs, body, (cost, match0))
    return match


def correct(
    state: TrackerState,
    t: jnp.ndarray,
    detections: MovingObjects,
    cfg: TrackerConfig,
    object_radius: jnp.ndarray | None = None,
    covariance_trace_limit: jnp.ndarray | None = None,
) -> TrackerState:
    """Associate + KF-correct + spawn + prune
    (moving_objects_tracker.cpp:142-197). The two hot thresholds can be
    passed as traced scalars (dynamic_reconfigure analog)."""
    object_radius = (
        jnp.float32(cfg.object_radius) if object_radius is None
        else object_radius
    )
    covariance_trace_limit = (
        jnp.float32(cfg.covariance_trace_limit)
        if covariance_trace_limit is None
        else covariance_trace_limit
    )
    obs4 = jnp.concatenate(
        [detections.center[:, :2], detections.velocity[:, :2]], axis=1
    )
    obs_record = jnp.concatenate(
        [detections.center, detections.velocity, detections.bounding_box], axis=1
    )
    obs_valid = detections.valid

    cost = _association_cost(state, obs4, obs_valid, cfg)
    if cfg.association == "gnn":
        from .ops.assignment import auction_assignment

        match = auction_assignment(cost)
    else:
        match = _greedy_associate(cost)  # (T,) obs index or -1
    matched = match >= 0
    midx = jnp.maximum(match, 0)

    # KF correct with C = I, R = 0.2 I (kalman_filter.hpp:77-86).
    z = obs4[midx]  # (T, 4)
    r_noise = jnp.eye(4, dtype=jnp.float32) * cfg.measurement_noise
    innov_cov = state.cov + r_noise
    gain = jnp.einsum(
        "tij,tjk->tik", state.cov, _chol_inv_det4(innov_cov)[0]
    )
    new_mean = state.mean + jnp.einsum(
        "tij,tj->ti", gain, z - state.mean
    )
    eye = jnp.eye(4, dtype=jnp.float32)
    new_cov = jnp.einsum("tij,tjk->tik", eye[None] - gain, state.cov)

    state = state.replace(
        mean=jnp.where(matched[:, None], new_mean, state.mean),
        cov=jnp.where(matched[:, None, None], new_cov, state.cov),
        correction_count=jnp.where(
            matched, state.correction_count + 1, state.correction_count
        ),
        last_correction_time=jnp.where(matched, t, state.last_correction_time),
        last_obs=jnp.where(matched[:, None], obs_record[midx], state.last_obs),
    )

    # Spawn unmatched detections sequentially so later detections see tracks
    # spawned earlier in this frame (moving_objects_tracker.cpp:157-185).
    obs_matched = jnp.zeros((obs4.shape[0],), bool).at[
        jnp.where(matched, midx, obs4.shape[0] - 1)
    ].max(matched)

    def spawn_one(carry, inp):
        st: TrackerState = carry
        obs_i, rec_i, is_cand = inp
        pos = obs_i[:2]
        dist = jnp.linalg.norm(st.mean[:, :2] - pos[None, :], axis=1)
        close = jnp.any(st.active & (dist < object_radius * 2.0))
        free_slot = jnp.argmin(st.active.astype(jnp.int32))
        have_slot = ~st.active[free_slot]
        do = is_cand & ~close & have_slot
        slot = free_slot

        def apply(st):
            return st.replace(
                mean=st.mean.at[slot].set(obs_i),
                cov=st.cov.at[slot].set(
                    jnp.eye(4, dtype=jnp.float32) * cfg.initial_cov
                ),
                active=st.active.at[slot].set(True),
                id=st.id.at[slot].set(st.next_id),
                correction_count=st.correction_count.at[slot].set(0),
                last_correction_time=st.last_correction_time.at[slot].set(t),
                last_prediction_time=st.last_prediction_time.at[slot].set(t),
                last_obs=st.last_obs.at[slot].set(rec_i),
                next_id=st.next_id + 1,
            )

        st = jax.lax.cond(do, apply, lambda s: s, st)
        return st, None

    spawn_cand = obs_valid & ~obs_matched
    state, _ = jax.lax.scan(
        spawn_one, state, (obs4, obs_record, spawn_cand)
    )

    # Prune on covariance traces (:187-196).
    pos_trace = state.cov[:, 0, 0] + state.cov[:, 1, 1]
    vel_trace = state.cov[:, 2, 2] + state.cov[:, 3, 3]
    keep = (pos_trace < covariance_trace_limit) & (
        vel_trace < covariance_trace_limit
    )
    return state.replace(active=state.active & keep)


@partial(jax.jit, static_argnames=("cfg",))
def track_step(
    state: TrackerState,
    t: jnp.ndarray,
    detections: MovingObjects,
    cfg: TrackerConfig = TrackerConfig(),
    object_radius: jnp.ndarray | None = None,
    covariance_trace_limit: jnp.ndarray | None = None,
    correction_count_limit: jnp.ndarray | None = None,
):
    """One full tracking update: predict + correct + publish.

    Returns (new_state, TrackedObjects) where the published set follows the
    correction-count and freshness gates (moving_objects_tracker.cpp:88-92).
    The three dynamic_reconfigure tunables may be traced scalars.
    """
    t = jnp.asarray(t, jnp.float32)
    correction_count_limit = (
        jnp.int32(cfg.correction_count_limit)
        if correction_count_limit is None
        else correction_count_limit
    )
    state = predict(state, t, cfg)
    state = correct(
        state, t, detections, cfg,
        object_radius=object_radius,
        covariance_trace_limit=covariance_trace_limit,
    )

    publish = (
        state.active
        & (state.correction_count >= correction_count_limit)
        & (state.last_correction_time == t)
    )
    center = jnp.concatenate(
        [state.mean[:, :2], state.last_obs[:, 2:3]], axis=1
    )
    velocity = jnp.concatenate(
        [state.mean[:, 2:4], state.last_obs[:, 5:6]], axis=1
    )
    objects = MovingObjects(
        id=jnp.where(publish, state.id, -1),
        center=jnp.where(publish[:, None], center, 0.0),
        velocity=jnp.where(publish[:, None], velocity, 0.0),
        bounding_box=jnp.where(publish[:, None], state.last_obs[:, 6:9], 0.0),
        valid=publish,
    )
    cov = jnp.where(publish[:, None, None], state.cov, 0.0)
    return state, TrackedObjects(objects=objects, covariance=cov)
