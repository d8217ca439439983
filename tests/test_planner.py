"""Convex SRB MPC tests: stance force distribution, friction cones,
tracking behavior — the golden checks SURVEY.md §7.3 calls for (PR1 slice:
f_z ~ mg/4 at rest, KKT-feasible forces)."""

import jax.numpy as jnp
import numpy as np

from apf_quadruped_tpu import gait, planner
from apf_quadruped_tpu.config import EngineConfig, MpcConfig, SolverConfig
from apf_quadruped_tpu.models import srb
from apf_quadruped_tpu.models.dogbot import nominal_stance

CFG = EngineConfig(
    mpc=MpcConfig(horizon=10, dt=0.05),
    # abstol is an ABSOLUTE duality-gap tolerance; with slacks of O(fz_max)
    # = O(1e3 N) a gap of 1e-4 is ~1e-7 relative — plenty below the
    # reference's runtime 1e-2 (main.cpp:1651-1652).
    solver=SolverConfig(iters=25, reltol=1e-6, abstol=1e-4),
)


def _stand_refs(cfg, com0):
    H = cfg.mpc.horizon
    feet0 = jnp.asarray(nominal_stance(cfg.robot)) + com0
    feet0 = feet0.at[:, 2].set(0.0)
    contacts = jnp.ones((H, 4))
    feet_w = planner.foothold_schedule(feet0, feet0, contacts)
    x_ref = planner.reference_trajectory(
        cfg, jnp.zeros(3), com0, com0, jnp.asarray(0.0),
        jnp.asarray(H * cfg.mpc.dt))
    return planner.MpcRefs(contacts=contacts, feet_w=feet_w, x_ref=x_ref,
                           yaw_ref=jnp.asarray(0.0))


def test_standing_force_distribution():
    """At rest at the reference, forces must be ~mg/4 vertical on each leg."""
    com0 = jnp.array([0.0, 0.0, 0.4])
    refs = _stand_refs(CFG, com0)
    x0 = srb.pack_state(jnp.zeros(3), com0, jnp.zeros(3), jnp.zeros(3))
    out = planner.plan(CFG, x0, refs)
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)                      # (H, 4, 3)
    mg4 = CFG.robot.mass * srb.GRAVITY / 4
    np.testing.assert_allclose(f[..., 2], mg4, rtol=0.05)
    assert np.abs(f[..., 0:2]).max() < 3.0
    # predicted trajectory stays put
    states = np.asarray(out.states)
    np.testing.assert_allclose(
        states[:, 3:6],
        np.broadcast_to(np.asarray(com0), states[:, 3:6].shape), atol=5e-3)


def test_forces_respect_friction_cone():
    """Aggressive lateral goal: planned forces stay inside the pyramid."""
    com0 = jnp.array([0.0, 0.0, 0.4])
    com_des = jnp.array([0.5, 0.3, 0.4])
    feet0 = jnp.asarray(nominal_stance(CFG.robot)) + com0
    feet0 = feet0.at[:, 2].set(0.0)
    H = CFG.mpc.horizon
    contacts = jnp.ones((H, 4))
    refs = planner.MpcRefs(
        contacts=contacts,
        feet_w=planner.foothold_schedule(feet0, feet0, contacts),
        x_ref=planner.reference_trajectory(
            CFG, jnp.zeros(3), com0, com_des, jnp.asarray(0.0),
            jnp.asarray(H * CFG.mpc.dt)),
        yaw_ref=jnp.asarray(0.0))
    x0 = srb.pack_state(jnp.zeros(3), com0, jnp.zeros(3), jnp.zeros(3))
    out = planner.plan(CFG, x0, refs)
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)
    mu = CFG.mpc.mu
    tol = 1e-3
    assert (f[..., 2] >= -tol).all()
    assert (np.abs(f[..., 0]) <= mu * f[..., 2] + 1e-2 + tol).all()
    assert (np.abs(f[..., 1]) <= mu * f[..., 2] + 1e-2 + tol).all()


def test_swing_legs_zero_force():
    """Trot schedule: swing-phase knots carry ~zero force on swing legs."""
    com0 = jnp.array([0.0, 0.0, 0.4])
    feet0 = jnp.asarray(nominal_stance(CFG.robot)) + com0
    feet0 = feet0.at[:, 2].set(0.0)
    H = CFG.mpc.horizon
    cycle = jnp.asarray(H * CFG.mpc.dt)
    contacts = gait.horizon_contacts(
        jnp.asarray(1), jnp.asarray(0.0), CFG.mpc.dt, H, cycle)
    assert float(contacts.min()) == 0.0, "schedule must contain swing knots"
    refs = planner.MpcRefs(
        contacts=contacts,
        feet_w=planner.foothold_schedule(feet0, feet0, contacts),
        x_ref=planner.reference_trajectory(
            CFG, jnp.zeros(3), com0, com0, jnp.asarray(0.0), cycle),
        yaw_ref=jnp.asarray(0.0))
    x0 = srb.pack_state(jnp.zeros(3), com0, jnp.zeros(3), jnp.zeros(3))
    out = planner.plan(CFG, x0, refs)
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)
    c = np.asarray(contacts)
    assert np.abs(f[c == 0.0]).max() < 1e-6
    # stance knots still carry the weight
    total_fz = (f[..., 2] * c).sum(-1)
    assert (total_fz > 0.5 * CFG.robot.mass * srb.GRAVITY).all()


def test_tracking_moves_toward_goal():
    com0 = jnp.array([0.0, 0.0, 0.4])
    com_des = jnp.array([0.2, 0.0, 0.4])
    feet0 = jnp.asarray(nominal_stance(CFG.robot)) + com0
    feet0 = feet0.at[:, 2].set(0.0)
    H = CFG.mpc.horizon
    contacts = jnp.ones((H, 4))
    refs = planner.MpcRefs(
        contacts=contacts,
        feet_w=planner.foothold_schedule(feet0, feet0, contacts),
        x_ref=planner.reference_trajectory(
            CFG, jnp.zeros(3), com0, com_des, jnp.asarray(0.0),
            jnp.asarray(H * CFG.mpc.dt)),
        yaw_ref=jnp.asarray(0.0))
    x0 = srb.pack_state(jnp.zeros(3), com0, jnp.zeros(3), jnp.zeros(3))
    out = planner.plan(CFG, x0, refs)
    states = np.asarray(out.states)
    # CoM x must advance monotonically-ish toward the goal
    assert states[-1, 3] > 0.1
    assert states[-1, 3] < 0.3


def test_batched_plan():
    com0 = jnp.array([0.0, 0.0, 0.4])
    refs1 = _stand_refs(CFG, com0)
    B = 3
    refs = planner.MpcRefs(
        contacts=jnp.tile(refs1.contacts, (B, 1, 1)),
        feet_w=jnp.tile(refs1.feet_w, (B, 1, 1, 1)),
        x_ref=jnp.tile(refs1.x_ref, (B, 1, 1)),
        yaw_ref=jnp.zeros(B))
    x0 = jnp.tile(srb.pack_state(jnp.zeros(3), com0, jnp.zeros(3),
                                 jnp.zeros(3)), (B, 1))
    out = planner.plan(CFG, x0, refs)
    assert out.forces.shape == (B, CFG.mpc.horizon, 4, 3)
    assert bool(np.all(out.sol.converged))
