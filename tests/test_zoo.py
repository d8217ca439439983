"""Robot model zoo: the SRB MPC layer is robot-agnostic — every towr
example model (anymal/hyq/biped/monoped) plans through the same jit
program, with unused foot slots masked."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from apf_quadruped_tpu import planner
from apf_quadruped_tpu.config import EngineConfig, MpcConfig, SolverConfig
from apf_quadruped_tpu.models import srb, zoo

SOLVER = SolverConfig(iters=25, reltol=1e-6, abstol=1e-4)


def _stand_plan(model: zoo.SrbModel):
    cfg = EngineConfig(
        robot=zoo.robot_config_for(model),
        mpc=MpcConfig(horizon=10, dt=0.05),
        solver=SOLVER)
    com0 = jnp.asarray([0.0, 0.0, model.com_height])
    feet0 = jnp.asarray(model.nominal_stance) + com0
    feet0 = feet0.at[:, 2].set(0.0)
    H = cfg.mpc.horizon
    contacts = jnp.tile(jnp.asarray(model.foot_mask), (H, 1))
    refs = planner.MpcRefs(
        contacts=contacts,
        feet_w=planner.foothold_schedule(feet0, feet0, contacts),
        x_ref=planner.reference_trajectory(
            cfg, jnp.zeros(3), com0, com0, jnp.asarray(0.0),
            jnp.asarray(H * cfg.mpc.dt)),
        yaw_ref=jnp.asarray(0.0))
    x0 = srb.pack_state(jnp.zeros(3), com0, jnp.zeros(3), jnp.zeros(3))
    return cfg, planner.plan(cfg, x0, refs), model


@pytest.mark.parametrize("maker", [zoo.anymal, zoo.hyq])
def test_quadruped_models_stand(maker):
    cfg, out, model = _stand_plan(maker())
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)
    expected = model.mass * srb.GRAVITY / 4
    # the last knots show the usual end-of-horizon force dip (stronger for
    # heavy robots where the force regularizer bites); assert the interior
    np.testing.assert_allclose(f[:-2, :, 2], expected, rtol=0.08)


def test_monoped_all_weight_on_one_foot():
    cfg, out, model = _stand_plan(zoo.monoped())
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)
    np.testing.assert_allclose(f[:-1, 0, 2], model.mass * srb.GRAVITY,
                               rtol=0.05)
    np.testing.assert_allclose(f[:, 1:], 0.0, atol=1e-6)


def test_biped_splits_weight():
    cfg, out, model = _stand_plan(zoo.biped())
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)
    np.testing.assert_allclose(f[:-1, 0:2, 2].sum(-1),
                               model.mass * srb.GRAVITY, rtol=0.05)
    np.testing.assert_allclose(f[:, 2:], 0.0, atol=1e-6)


def test_zoo_registry():
    assert set(zoo.ZOO) == {"dogbot", "anymal", "hyq", "biped", "monoped"}
    m = zoo.ZOO["anymal"]()
    assert abs(m.mass - 29.5) < 1e-9


# ---------------------------------------------------------------------------
# Closed-loop: non-DogBot robots through the WHOLE stack (VERDICT r2 #8).
# The leg chain (kinematics + rigid-body dynamics + WBC + sim contact) is
# parametrized through RobotConfig, so anymal walks end-to-end — the zoo is
# no longer planner-only.  Reference role: towr's model family
# (include/towr/models/examples/anymal_model.h) + the closed-loop scenario
# runs (gztest*.launch).
# ---------------------------------------------------------------------------

def test_zoo_full_configs_mass_consistent():
    """Link masses must sum to the SRB mass for every closed-loop robot."""
    from apf_quadruped_tpu.models import rbd

    # 2e-3 tolerance: DogBot's own xacro link masses sum to 21.260 while
    # the towr model header says 21.261 (a genuine reference-data quirk)
    for name in ("dogbot", "anymal", "hyq"):
        cfg = zoo.robot_config_for(zoo.ZOO[name]())
        assert abs(rbd.total_mass(cfg) - cfg.mass) < 2e-3, name


def test_zoo_stance_reachable():
    """stance_ik must hit the towr nominal stance for every full config."""
    from apf_quadruped_tpu.models import kinematics
    from apf_quadruped_tpu.models.dogbot import nominal_stance

    for name in ("anymal", "hyq"):
        cfg = zoo.robot_config_for(zoo.ZOO[name]())
        tgt = nominal_stance(cfg)
        feet = np.asarray(kinematics.fk(cfg, kinematics.stance_ik(cfg, tgt)))
        assert np.abs(feet - tgt).max() < 1e-5, name


@pytest.mark.slow
def test_anymal_walks_closed_loop():
    """ANYmal trots end-to-end: APF -> MPC -> WBC -> sim, 8 cycles (4 s).

    Asserts forward progress toward the goal, no fall, healthy WBC
    convergence at the production solver config."""
    from apf_quadruped_tpu.runtime import loop
    from apf_quadruped_tpu.sim import disturbance, terrain

    cfg = zoo.engine_config_for("anymal")
    st = loop.init(cfg, dtype=jnp.float64)
    terr = terrain.flat(cfg.sim, dtype=jnp.float64)
    st, m = loop.run(cfg, st, terr, jnp.asarray([0.0, 1.5]),
                     disturbance.empty(jnp.float64), n_cycles=8)
    com = np.asarray(m.com)
    assert com[-1, 1] > 0.30, f"no forward progress: {com[:, 1]}"
    assert np.all(com[:, 2] > 0.30), f"fell: z={com[:, 2]}"
    assert np.asarray(m.qp_converged).mean() > 0.9
    assert np.asarray(m.track_err).max() < 0.05


@pytest.mark.slow
def test_hyq_walks_closed_loop():
    """HyQ trots end-to-end like anymal: forward progress, no fall,
    healthy WBC convergence at its tuned engine config (the per-robot
    overrides in zoo.engine_config_for, each one ablated-necessary)."""
    from apf_quadruped_tpu.runtime import loop
    from apf_quadruped_tpu.sim import disturbance, terrain

    cfg = zoo.engine_config_for("hyq")
    st = loop.init(cfg, dtype=jnp.float64)
    terr = terrain.flat(cfg.sim, dtype=jnp.float64)
    st, m = loop.run(cfg, st, terr, jnp.asarray([0.0, 1.5]),
                     disturbance.empty(jnp.float64), n_cycles=8)
    com = np.asarray(m.com)
    assert com[-1, 1] > 0.30, f"no forward progress: {com[:, 1]}"
    assert np.all(com[:, 2] > 0.45), f"fell: z={com[:, 2]}"
    assert np.asarray(m.qp_converged).mean() > 0.9
    assert np.asarray(m.track_err).max() < 0.05
    assert float(st.sim.R_wb[2, 2]) > 0.99
