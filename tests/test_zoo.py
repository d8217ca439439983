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
