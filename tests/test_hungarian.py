"""Jittable Hungarian vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

import jax

from univs_tpu.losses.hungarian import hungarian as _hungarian

hungarian = jax.jit(_hungarian)  # library fn is unjitted by design


@pytest.mark.parametrize("n,m,seed", [(1, 1, 0), (3, 3, 1), (5, 12, 2), (20, 200, 3), (40, 200, 4)])
def test_matches_scipy_cost(n, m, seed):
    rng = np.random.RandomState(seed)
    cost = rng.randn(n, m).astype(np.float32) * 10
    got = np.asarray(hungarian(jnp.array(cost)))
    ri, ci = linear_sum_assignment(cost)
    # optimal cost must match (assignment may differ on ties)
    assert len(set(got.tolist())) == n  # valid one-to-one assignment
    np.testing.assert_allclose(
        cost[np.arange(n), got].sum(), cost[ri, ci].sum(), rtol=1e-5, atol=1e-4
    )


def test_row_validity_masking():
    cost = jnp.array([[1.0, 0.0, 5.0], [0.0, 2.0, 5.0], [9.0, 9.0, 0.0]])
    got = np.asarray(hungarian(cost, row_valid=jnp.array([True, True, False])))
    assert got[2] == -1
    assert set(got[:2].tolist()) == {0, 1}
    cost_np = np.asarray(cost)[:2]
    ri, ci = linear_sum_assignment(cost_np)
    assert cost_np[np.arange(2), got[:2]].sum() == cost_np[ri, ci].sum()


def test_degenerate_ties():
    cost = jnp.zeros((4, 6))
    got = np.asarray(hungarian(cost))
    assert len(set(got.tolist())) == 4
    assert all(0 <= g < 6 for g in got)
