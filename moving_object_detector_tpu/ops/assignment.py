"""Assignment solvers for data association.

kkl parity (SURVEY.md §2.2): the reference ships two association modes —
greedy nearest-neighbor (nearest_neighbor_association.hpp:28-58, the wired-in
default) and global nearest neighbor via a Munkres/Hungarian solver
(global_nearest_neighbor_association.hpp + munkres.hpp, available but not
wired). The greedy mode lives in tracker._greedy_associate; this module
provides the optimal mode as the potential-based Hungarian algorithm
(Jonker-Volgenant style shortest augmenting paths, the classical O(n^3)
formulation) expressed with lax loops: static bounds, vectorized inner
relaxations, so it jits cleanly at fixed capacities.

Forbidden pairs (inf cost) follow the reference's HUGE-gating convention
(global_nearest_neighbor_association.hpp:32-61): they participate as large
finite costs and are filtered from the result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The HUGE gate must stay small enough that f32 dual-potential updates at
# BIG scale don't swallow sub-unit cost differences (f32 spacing at 1024 is
# 6e-5); finite costs are normalized to [0, 1] before solving, which
# preserves the optimal assignment (positive affine transform).
_BIG = 1024.0
_INF = 1e18


@jax.jit
def hungarian_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Optimal one-to-one assignment minimizing total cost.

    Args:
      cost: (R, C) f32; +inf marks forbidden pairs.

    Returns:
      (R,) int32: assigned column per row, -1 for unassigned (rows whose
      only partners are forbidden pairs end up unassigned).
    """
    r, c = cost.shape
    n = max(r, c)
    # Normalize finite costs to [0, 1] (preserves the optimum), then pad to
    # square with forbidden/padded entries at the BIG gate.
    finite = jnp.isfinite(cost)
    safe = jnp.where(finite, cost, 0.0)
    mn = jnp.min(jnp.where(finite, safe, jnp.inf))
    mx = jnp.max(jnp.where(finite, safe, -jnp.inf))
    any_finite = jnp.any(finite)
    mn = jnp.where(any_finite, mn, 0.0)
    span = jnp.where(any_finite, jnp.maximum(mx - mn, 1e-9), 1.0)
    normalized = (safe - mn) / span
    sq = jnp.full((n, n), _BIG, jnp.float32)
    sq = sq.at[:r, :c].set(jnp.where(finite, normalized, _BIG))

    # Potentials u (rows), v (columns) and assignment p[j] = row of column
    # j, with a virtual column 0 starting each augmenting path; columns and
    # rows are 1-based internally (0 = none).
    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.zeros((n + 1,), jnp.int32)

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i + 1)
        minv = jnp.full((n + 1,), _INF, jnp.float32)
        used = jnp.zeros((n + 1,), bool)
        way = jnp.zeros((n + 1,), jnp.int32)

        def cond(state):
            _, _, p, _, _, _, j0 = state
            return p[j0] != 0

        def body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            # Relax all unused columns through row i0's reduced costs.
            cur = sq[i0 - 1, :] - u[i0] - v[1:]
            better = (~used[1:]) & (cur < minv[1:])
            minv = minv.at[1:].set(jnp.where(better, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(better, j0, way[1:]))
            # Pick the cheapest unused column.
            masked = jnp.where(used[1:], _INF, minv[1:])
            j1 = (jnp.argmin(masked) + 1).astype(jnp.int32)
            delta = masked[j1 - 1]
            # Dual update: u[p[j]] += delta and v[j] -= delta over used
            # columns (assigned rows are distinct, so the scatter-add hits
            # unique indices; unused columns route to the dead slot 0 —
            # rows are 1-based, u[0] is never read), minv -= delta over
            # unused columns.
            u = u.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, used, way, jnp.int32(0))
        )

        # Unwind the augmenting path: p[j0] <- p[way[j0]] back to the root.
        def unwind_cond(state):
            _, j0 = state
            return j0 != 0

        def unwind_body(state):
            p, j0 = state
            j1 = way[j0]
            return p.at[j0].set(p[j1]), j1

        p, _ = jax.lax.while_loop(unwind_cond, unwind_body, (p, j0))
        return u, v, p

    _, _, p = jax.lax.fori_loop(0, n, assign_row, (u0, v0, p0))

    # Invert: row (1-based) -> column (0-based).
    row_to_col = jnp.full((n + 2,), -1, jnp.int32)
    cols = jnp.arange(1, n + 1, dtype=jnp.int32)
    row_to_col = row_to_col.at[p[1:]].set(cols - 1)
    match = row_to_col[jnp.arange(1, r + 1)]
    # Filter padded columns and forbidden pairs.
    valid = (match >= 0) & (match < c)
    picked = jnp.where(valid, match, 0)
    ok = valid & jnp.isfinite(cost[jnp.arange(r), picked]) & (
        cost[jnp.arange(r), picked] < _BIG / 2
    )
    return jnp.where(ok, match, -1).astype(jnp.int32)


# Name used by the tracker's "gnn" mode.
auction_assignment = hungarian_assignment
