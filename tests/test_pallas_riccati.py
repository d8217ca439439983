"""Fused Pallas Riccati IPM vs the reference lax.scan implementation.

solve_stage_qp_fused (ops/pallas_riccati.py) must be a drop-in replacement
for ops.riccati.solve_stage_qp: same Mehrotra algorithm, same masks, same
NaN quarantine — only the execution strategy differs (batch-on-lanes fused
kernels vs per-stage scans).  Off-TPU the kernels run in interpret mode, so
these tests exercise the exact kernel bodies that ship to hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from apf_quadruped_tpu.config import SolverConfig
from apf_quadruped_tpu.ops.pallas_riccati import solve_stage_qp_fused
from apf_quadruped_tpu.ops.riccati import StageQP, solve_stage_qp

CFG = SolverConfig(iters=15, reltol=1e-4, abstol=1e-4,
                   static_reg=1e-6, w_clip=1e6)


def make_problem(rng, B=4, H=5, NX=6, NU=4, M=6, mask_frac=0.8,
                 diag_q=True):
    A = np.tile(np.eye(NX), (B, H, 1, 1)) + rng.normal(size=(B, H, NX, NX)) * 0.1
    Bm = rng.normal(size=(B, H, NX, NU)) * 0.3
    if diag_q:
        Q = np.diag(rng.uniform(0.5, 2.0, NX))
        R = np.diag(rng.uniform(0.1, 1.0, NU))
    else:
        # dense SPD costs — exercises the full-matrix Q/R paths in the
        # rollout + factor kernels (a diagonal-only kernel silently
        # returns wrong u here)
        W1 = rng.normal(size=(NX, NX)) * 0.3
        Q = W1 @ W1.T + 0.5 * np.eye(NX)
        W2 = rng.normal(size=(NU, NU)) * 0.3
        R = W2 @ W2.T + 0.2 * np.eye(NU)
    qlin = rng.normal(size=(B, H, NX))
    G = rng.normal(size=(M, NU))
    h = rng.uniform(0.5, 2.0, M)
    mask = (rng.uniform(size=(B, H, M)) < mask_frac).astype(np.float32)
    x0 = rng.normal(size=(B, NX)) * 0.5
    to32 = lambda v: jnp.asarray(v, jnp.float32)
    return StageQP(A=to32(A), B=to32(Bm), Q=to32(Q), qlin=to32(qlin),
                   R=to32(R), G=to32(G), h=to32(h), mask=to32(mask),
                   x0=to32(x0))


def _compare(qp, cfg=CFG, atol=5e-5):
    ref = solve_stage_qp(qp, cfg)
    fus = solve_stage_qp_fused(qp, cfg)
    assert bool(np.all(np.asarray(ref.converged)))
    np.testing.assert_array_equal(np.asarray(fus.converged),
                                  np.asarray(ref.converged))
    np.testing.assert_allclose(np.asarray(fus.u), np.asarray(ref.u),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(fus.x), np.asarray(ref.x),
                               atol=atol)
    return ref, fus


def test_fused_matches_reference(rng):
    _compare(make_problem(rng))


def test_fused_nondiagonal_costs(rng):
    """Dense SPD Q and R: both kernels must apply the FULL matrices."""
    _compare(make_problem(rng, diag_q=False), atol=2e-4)


@pytest.mark.slow
def test_fused_mpc_sized(rng):
    """Production shape: H=20, NX=13, NU=12, M=24 (the planner's QP)."""
    qp = make_problem(rng, B=3, H=20, NX=13, NU=12, M=24)
    _compare(qp, atol=2e-4)


def test_fused_all_masked(rng):
    """All inequality rows masked -> pure LQR on both paths."""
    qp = make_problem(rng, mask_frac=0.0)
    _compare(qp)


def test_fused_active_constraints(rng):
    """Tight bounds: fused solution feasible on real rows."""
    qp = make_problem(rng, B=4, H=5)
    qp = qp._replace(h=jnp.full_like(qp.h, 0.05),
                     qlin=qp.qlin * 5.0)
    sol = solve_stage_qp_fused(qp, CFG)
    viol = (np.einsum("mn,bhn->bhm", np.asarray(qp.G), np.asarray(sol.u))
            - 0.05) * np.asarray(qp.mask)
    assert viol.max() < 1e-4


def test_fused_unbatched(rng):
    """Scalar batch shape () must round-trip through the lane padding."""
    qp = make_problem(rng, B=1)
    qp1 = StageQP(A=qp.A[0], B=qp.B[0], Q=qp.Q, qlin=qp.qlin[0], R=qp.R,
                  G=qp.G, h=qp.h, mask=qp.mask[0], x0=qp.x0[0])
    ref = solve_stage_qp(qp1, CFG)
    fus = solve_stage_qp_fused(qp1, CFG)
    assert fus.u.shape == ref.u.shape
    np.testing.assert_allclose(np.asarray(fus.u), np.asarray(ref.u),
                               atol=5e-5)
    assert np.asarray(fus.converged).shape == ()


def test_fused_nan_quarantine(rng):
    """A poisoned lane comes back zeroed + unconverged; healthy lanes
    unaffected (SURVEY.md §5.3 failure containment)."""
    qp = make_problem(rng, B=4)
    x0 = qp.x0.at[1, 0].set(jnp.nan)
    sol = solve_stage_qp_fused(qp._replace(x0=x0), CFG)
    assert np.all(np.isfinite(np.asarray(sol.u)))
    assert not bool(sol.converged[1])
    ref = solve_stage_qp(qp, CFG)
    for b in (0, 2, 3):
        np.testing.assert_allclose(np.asarray(sol.u[b]),
                                   np.asarray(ref.u[b]), atol=5e-5)


def test_fused_batch_over_lane_boundary(rng):
    """B=130 > LANES=128 exercises the multi-block grid + padding."""
    qp = make_problem(rng, B=130, H=3, NX=4, NU=3, M=4)
    _compare(qp, atol=1e-4)


def test_fused_stage_bf16_storage(rng):
    """SolverConfig.stage_bf16 stores the (A, B) stage streams at bf16
    (HBM-traffic halving, PERF.md roofline) while ALL KKT algebra stays
    f32: solutions must agree with the f32-storage path to the bf16 data
    error (~4e-3 relative) and convergence must be unaffected."""
    import dataclasses

    qp = make_problem(rng, B=4)
    cfg16 = dataclasses.replace(CFG, reltol=1e-2, abstol=1e-2,
                                stage_bf16=True)
    cfg32 = dataclasses.replace(CFG, reltol=1e-2, abstol=1e-2)
    ref = solve_stage_qp_fused(qp, cfg32)
    out = solve_stage_qp_fused(qp, cfg16)
    assert np.asarray(out.converged).all()
    scale = max(1.0, float(np.abs(np.asarray(ref.u)).max()))
    rel = np.abs(np.asarray(out.u) - np.asarray(ref.u)).max() / scale
    assert rel < 2e-2, f"bf16 stage storage deviated {rel}"


def test_resident_matches_scan(rng):
    """The one-kernel VMEM-resident IPM (solve_stage_qp_resident) must
    reproduce the scan reference exactly: same iteration counts, same
    solution to f32 roundoff."""
    from apf_quadruped_tpu.ops.pallas_riccati import solve_stage_qp_resident

    qp = make_problem(rng, B=4)
    ref = solve_stage_qp(qp, CFG)
    out = solve_stage_qp_resident(qp, CFG)
    np.testing.assert_array_equal(np.asarray(out.converged),
                                  np.asarray(ref.converged))
    np.testing.assert_array_equal(np.asarray(out.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=5e-5)


def test_resident_masks_and_quarantine(rng):
    """Masked rows stay inert and a poisoned lane is contained, matching
    the 3-kernel fused path's guarantees."""
    from apf_quadruped_tpu.ops.pallas_riccati import solve_stage_qp_resident

    qp = make_problem(rng, B=4, mask_frac=0.5)
    ref = solve_stage_qp(qp, CFG)
    out = solve_stage_qp_resident(qp, CFG)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               atol=5e-5)
    x0 = qp.x0.at[2, 1].set(jnp.nan)
    bad = solve_stage_qp_resident(qp._replace(x0=x0), CFG)
    assert np.all(np.isfinite(np.asarray(bad.u)))
    assert not bool(bad.converged[2])
    for b in (0, 1, 3):
        np.testing.assert_allclose(np.asarray(bad.u[b]),
                                   np.asarray(ref.u[b]), atol=5e-5)


def test_warm_start_invalid_equals_cold(rng):
    """An all-False WarmStart must reproduce the cold path bit-for-bit
    (the first cycle of a scanned closed loop carries exactly this)."""
    from apf_quadruped_tpu.ops.pallas_riccati import solve_stage_qp_resident
    from apf_quadruped_tpu.ops.riccati import WarmStart

    qp = make_problem(rng, B=4)
    cold = solve_stage_qp_resident(qp, CFG)
    Hh, NU, M = qp.A.shape[-3], qp.B.shape[-1], qp.h.shape[-1]
    off = WarmStart(u=jnp.zeros((4, Hh, NU), jnp.float32),
                    z=jnp.zeros((4, Hh, M), jnp.float32),
                    s=jnp.zeros((4, Hh, M), jnp.float32),
                    valid=jnp.zeros(4, bool))
    out = solve_stage_qp_resident(qp, CFG, warm=off)
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(cold.u))
    np.testing.assert_array_equal(np.asarray(out.iters),
                                  np.asarray(cold.iters))


def test_warm_start_cuts_iterations(rng):
    """Warm-starting from the previous solution must converge in far
    fewer iterations (PERF.md lever 1), agree with the scan backend given
    the same warm start, and still satisfy tolerances."""
    from apf_quadruped_tpu.ops.pallas_riccati import solve_stage_qp_resident
    from apf_quadruped_tpu.ops.riccati import WarmStart

    qp = make_problem(rng, B=4)
    cold = solve_stage_qp_resident(qp, CFG)
    assert np.asarray(cold.converged).all()
    w = WarmStart(u=cold.u, z=cold.z, s=cold.s, valid=jnp.ones(4, bool))
    hot = solve_stage_qp_resident(qp, CFG, warm=w)
    hot_scan = solve_stage_qp(qp, CFG, warm=w)
    assert np.asarray(hot.converged).all()
    assert (np.asarray(hot.iters) <= np.asarray(cold.iters)).all()
    assert np.asarray(hot.iters).mean() < np.asarray(cold.iters).mean()
    np.testing.assert_array_equal(np.asarray(hot.iters),
                                  np.asarray(hot_scan.iters))
    np.testing.assert_allclose(np.asarray(hot.u), np.asarray(hot_scan.u),
                               atol=5e-5)


def test_warm_start_mixed_validity(rng):
    """Per-lane valid flags: warm lanes converge fast, cold lanes follow
    the cold path — in ONE call (the closed-loop sweep shape)."""
    from apf_quadruped_tpu.ops.pallas_riccati import solve_stage_qp_resident
    from apf_quadruped_tpu.ops.riccati import WarmStart

    qp = make_problem(rng, B=4)
    cold = solve_stage_qp_resident(qp, CFG)
    valid = jnp.asarray([True, False, True, False])
    w = WarmStart(u=cold.u, z=cold.z, s=cold.s, valid=valid)
    out = solve_stage_qp_resident(qp, CFG, warm=w)
    its, its_cold = np.asarray(out.iters), np.asarray(cold.iters)
    assert (its[[0, 2]] <= its_cold[[0, 2]]).all()
    np.testing.assert_array_equal(its[[1, 3]], its_cold[[1, 3]])
    np.testing.assert_allclose(np.asarray(out.u[1]), np.asarray(cold.u[1]),
                               atol=1e-6)
