"""Exact linear assignment on device for arbitrary K.

The K! permutation-matmul of ``ops/matching.py`` is the fastest exact
matcher for the reference's K=8, but its cost explodes combinatorially.
For K > 8 this module provides the Jonker-Volgenant shortest-augmenting-
path algorithm (the same algorithm scipy's ``linear_sum_assignment``
implements — ``losses.py:43`` calls it per sample on the CPU) as a fully
jit-compatible ``lax.while_loop`` program: exactly K augmentations, each
a <= K-step Dijkstra over columns with O(K) vectorized relaxation, so the
whole solve is a static-shape O(K^3) device program batched with ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalar: a module-level jnp constant would initialize
# the JAX backend at import time — `import point2cyl_tpu.ops` must not
# touch the (possibly remote) device.
_INF = np.float32(1e30)


def _lap_single(cost: jax.Array) -> jax.Array:
    """Minimize sum(cost[i, col[i]]) over permutations; returns col (K,).

    Shortest-augmenting-path with dual potentials (Jonker & Volgenant,
    1987), structured exactly like scipy's `_lsap.c` so the optimum (not
    necessarily the tie-breaking) matches ``linear_sum_assignment``.
    """
    k = cost.shape[0]
    dtype = cost.dtype

    def assign_one(carry, cur_row):
        u, v, col4row, row4col = carry

        # --- Dijkstra from cur_row over columns ---
        def dij_cond(s):
            (_, _, _, _, sink, _, _) = s
            return sink < 0

        def dij_body(s):
            sp, path, sc, sr, sink, i, min_val = s
            sr = sr.at[i].set(True)
            # relax all unscanned columns through row i
            r = min_val + cost[i] - u[i] - v
            better = (~sc) & (r < sp)
            sp = jnp.where(better, r, sp)
            path = jnp.where(better, i, path)
            # pick the unscanned column with the smallest tentative cost
            masked = jnp.where(sc, _INF, sp)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            owner = row4col[j]
            sink = jnp.where(owner < 0, j, jnp.int32(-1))
            i = jnp.where(owner < 0, i, owner)
            return sp, path, sc, sr, sink, i, min_val

        sp0 = jnp.full((k,), _INF, dtype)
        path0 = jnp.full((k,), -1, jnp.int32)
        sc0 = jnp.zeros((k,), bool)
        sr0 = jnp.zeros((k,), bool)
        sp, path, sc, sr, sink, _, min_val = jax.lax.while_loop(
            dij_cond, dij_body,
            (sp0, path0, sc0, sr0, jnp.int32(-1), cur_row, jnp.zeros((), dtype)),
        )

        # --- dual updates (scanned rows/cols only) ---
        u = u.at[cur_row].add(min_val)
        other_sr = sr & (
            jnp.arange(k, dtype=jnp.int32) != cur_row
        )
        # for scanned rows i != cur_row: u[i] += min_val - sp[col4row[i]]
        sp_at_assigned = jnp.where(
            col4row >= 0, sp[jnp.clip(col4row, 0, k - 1)], 0.0
        )
        u = jnp.where(other_sr, u + (min_val - sp_at_assigned), u)
        v = jnp.where(sc, v - (min_val - sp), v)

        # --- augment backwards from the sink ---
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            col4row, row4col, j, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return col4row, row4col, j_next, i == cur_row

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, False)
        )
        return (u, v, col4row, row4col), None

    u0 = jnp.zeros((k,), dtype)
    v0 = jnp.zeros((k,), dtype)
    c0 = jnp.full((k,), -1, jnp.int32)
    r0 = jnp.full((k,), -1, jnp.int32)
    (_, _, col4row, _), _ = jax.lax.scan(
        assign_one, (u0, v0, c0, r0),
        jnp.arange(k, dtype=jnp.int32),
    )
    return col4row


def solve_lap_min(cost: jax.Array) -> jax.Array:
    """Batched exact minimum-cost assignment.

    Args: cost (B, K, K) float. Returns (B, K) int32 column per row.
    """
    return jax.vmap(_lap_single)(cost.astype(jnp.float32))


def solve_lap_max(cost: jax.Array) -> jax.Array:
    """Batched exact maximum-affinity assignment (scipy's
    ``linear_sum_assignment(-cost)`` as used at ``losses.py:43``)."""
    return solve_lap_min(-cost)
