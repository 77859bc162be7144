"""Jittable Hungarian assignment (Jonker-Volgenant augmenting paths).

The reference solves its per-video assignments with scipy's
``linear_sum_assignment`` on the CPU, forcing a device->host sync in
the middle of every training step and every inference clip
(reference: univs/modeling/video_matcher.py:196,
univs/inference/inference_video_entity.py:597, inference/comm.py:25).
On TPU that sync would dominate the step, so we run the exact same
algorithm on-device: the classic shortest-augmenting-path Hungarian
(O(N^2·M)) with ``lax.while_loop`` / ``lax.scan`` control flow.
Matrices here are tiny (<= 200 x 60), so compute is negligible; the
win is staying inside the jit region.

Returns the optimal assignment (same cost as scipy) for N <= M.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# plain python float, NOT jnp.float32: this module is sometimes first
# imported from inside a traced function (memory_pool.py/vos.py defer
# the import), and a module-level `jnp.float32(...)` executed under an
# active trace becomes a leaked tracer pinned in the module globals —
# every later trace then captures it as a foreign constant and dies at
# dispatch with "Execution supplied N buffers but compiled program
# expected M".
_INF = 1e12


def hungarian(cost: jnp.ndarray, row_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Minimum-cost row->column assignment.

    Args:
        cost: [N, M] float cost matrix, N <= M.
        row_valid: optional [N] bool; invalid rows get constant
            (zero) cost so they never influence valid rows' columns' prices
            asymmetrically, and their output is masked to -1.

    Returns:
        col4row: [N] int32 — assigned column per row (-1 for invalid rows).
    """
    N, M = cost.shape
    assert N <= M, "hungarian expects N (rows) <= M (cols)"
    c = cost.astype(jnp.float32)
    if row_valid is not None:
        c = jnp.where(row_valid[:, None], c, 0.0)

    # 1-indexed potentials; col 0 is the virtual start column.
    # p[j] = row (1-indexed) matched to column j, 0 = unmatched.
    u0 = jnp.zeros((N + 1,), jnp.float32)
    v0 = jnp.zeros((M + 1,), jnp.float32)
    p0 = jnp.zeros((M + 1,), jnp.int32)

    def assign_row(carry, i):
        u, v, p = carry
        i1 = i + 1
        p = p.at[0].set(i1)

        minv = jnp.full((M + 1,), _INF)
        used = jnp.zeros((M + 1,), bool)
        way = jnp.zeros((M + 1,), jnp.int32)

        def phase_cond(state):
            j0, p_, u_, v_, minv_, used_, way_ = state
            return p_[j0] != 0

        def phase_body(state):
            j0, p_, u_, v_, minv_, used_, way_ = state
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            # relax all unused columns
            cur = c[i0 - 1, :] - u_[i0] - v_[1:]  # [M]
            unused = ~used_[1:]
            better = unused & (cur < minv_[1:])
            minv_ = minv_.at[1:].set(jnp.where(better, cur, minv_[1:]))
            way_ = way_.at[1:].set(jnp.where(better, j0, way_[1:]))
            masked = jnp.where(unused, minv_[1:], _INF)
            j1 = jnp.argmin(masked) + 1
            delta = masked[jnp.argmin(masked)]
            # update potentials
            rows_of_used = p_  # p_[j] rows for used cols
            u_ = u_.at[rows_of_used].add(jnp.where(used_, delta, 0.0))
            v_ = v_ - jnp.where(used_, delta, 0.0)
            minv_ = minv_.at[1:].set(jnp.where(unused, minv_[1:] - delta, minv_[1:]))
            return (j1, p_, u_, v_, minv_, used_, way_)

        j0, p, u, v, minv, used, way = jax.lax.while_loop(
            phase_cond, phase_body, (jnp.int32(0), p, u, v, minv, used, way)
        )

        # augment along the path
        def aug_cond(state):
            j0_, p_ = state
            return j0_ != 0

        def aug_body(state):
            j0_, p_ = state
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return (j1, p_)

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return (u, v, p), None

    (u, v, p), _ = jax.lax.scan(assign_row, (u0, v0, p0), jnp.arange(N))

    # invert: col4row[i] = j where p[j] == i+1 (skip virtual col 0)
    cols = jnp.arange(M + 1, dtype=jnp.int32)
    col4row = jnp.zeros((N + 1,), jnp.int32).at[p[1:]].set(cols[1:])[1:] - 1
    if row_valid is not None:
        col4row = jnp.where(row_valid, col4row, -1)
    return col4row
