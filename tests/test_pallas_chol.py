"""Pallas batched-Cholesky kernel vs numpy (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from apf_quadruped_tpu.ops.pallas_chol import chol_solve_blocked


def _spd(rng, B, n):
    M = rng.normal(size=(B, n, n))
    return np.einsum("bij,bkj->bik", M, M) + n * np.eye(n)


@pytest.mark.slow
def test_matches_numpy_solve(rng):
    B, n, k = 37, 12, 3                        # non-multiple of 128
    H = _spd(rng, B, n)
    rhs = rng.normal(size=(B, n, k))
    out = chol_solve_blocked(jnp.asarray(H, jnp.float32),
                             jnp.asarray(rhs, jnp.float32), interpret=True)
    expected = np.linalg.solve(H, rhs)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4)


def test_single_rhs_and_exact_lane_multiple(rng):
    B, n, k = 256, 5, 1
    H = _spd(rng, B, n)
    rhs = rng.normal(size=(B, n, k))
    out = chol_solve_blocked(jnp.asarray(H, jnp.float32),
                             jnp.asarray(rhs, jnp.float32), interpret=True)
    expected = np.linalg.solve(H, rhs)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4)
