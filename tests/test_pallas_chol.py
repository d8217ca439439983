"""Pallas batched-Cholesky kernel vs numpy (interpret mode on CPU)."""

import jax
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


def test_factor_sub_split_matches_numpy(rng):
    """chol_factor_blocked + chol_sub_blocked (the reuse-the-factor pair
    the condensed WBC IPM routes through) against numpy."""
    from apf_quadruped_tpu.ops.pallas_chol import (chol_factor_blocked,
                                                   chol_sub_blocked)

    B, n, k = 7, 9, 4
    A = rng.normal(size=(B, n, n))
    H = jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(B, n, k)), jnp.float32)
    L, D = chol_factor_blocked(H, interpret=True)
    X = chol_sub_blocked(L, D, rhs, interpret=True)
    ref = np.linalg.solve(np.asarray(H, np.float64),
                          np.asarray(rhs, np.float64))
    np.testing.assert_allclose(np.asarray(X), ref, atol=2e-5)
    Lnp = np.linalg.cholesky(np.asarray(H, np.float64))
    np.testing.assert_allclose(np.asarray(L), Lnp, atol=2e-5)


def test_solve_qp_vmapped_matches_explicit_batch(rng):
    """The custom_vmap routing in ops.qpsolve must make jax.vmap(solve_qp)
    agree with the explicitly-batched call (on CPU both take the plain
    path; on TPU the vmapped one takes the batch-on-lanes kernels — this
    pins the CONTRACT both must satisfy)."""
    from apf_quadruped_tpu.config import SolverConfig
    from apf_quadruped_tpu.ops.qpsolve import QPData, solve_qp

    B, n, p, m = 6, 8, 3, 10
    A_ = rng.normal(size=(B, n, n))
    P = jnp.asarray(A_ @ A_.transpose(0, 2, 1) + n * np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    Aeq = jnp.asarray(rng.normal(size=(B, p, n)), jnp.float32)
    beq = jnp.asarray(rng.normal(size=(B, p)) * 0.1, jnp.float32)
    G = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
    h = jnp.asarray(np.abs(rng.normal(size=(B, m))) + 1.0, jnp.float32)
    qp = QPData(P=P, q=q, A=Aeq, b=beq, G=G, h=h,
                eq_mask=jnp.ones((B, p), jnp.float32),
                ineq_mask=jnp.ones((B, m), jnp.float32))
    cfg = SolverConfig(iters=25, reltol=1e-6, abstol=1e-6)
    explicit = solve_qp(qp, cfg)
    vmapped = jax.vmap(lambda one: solve_qp(one, cfg))(qp)
    assert np.asarray(explicit.converged).all()
    assert np.asarray(vmapped.converged).all()
    np.testing.assert_allclose(np.asarray(vmapped.x),
                               np.asarray(explicit.x), atol=5e-5)
