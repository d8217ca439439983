"""Momentum-based external-wrench observer (L-aux).

Re-derivation of the reference's estimate_loop (reference main.cpp:843-930;
vestigial duplicate in src/client/estimator_sem.cpp): a first-order
residual observer on the 6D floating-base momentum,
    y_d += ((J_c' f)[0:6] - h[0:6] + w) dt
    w     = K (p - y_d - p_0),        p = (M u)[0:6]
with gain K = 0.5 and dt = 1e-3 in the reference (main.cpp:909-913).  The
reference publishes the estimate but never enables the thread
(main.cpp:2909); here it is a live, batched state machine usable for
disturbance detection in sweeps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import EngineConfig
from ..models import rbd


class ObserverState(NamedTuple):
    y_int: jnp.ndarray    # (6,) integral of known generalized force + w
    w: jnp.ndarray        # (6,) current external-wrench estimate
    p0: jnp.ndarray       # (6,) initial momentum offset


def init(cfg: EngineConfig, p_base, R_wb, q, u) -> ObserverState:
    M = rbd.mass_matrix(cfg.robot, R_wb, q)
    p = (M @ u)[0:6]
    z = jnp.zeros(6, q.dtype)
    return ObserverState(y_int=z, w=z, p0=p)


def update(cfg: EngineConfig, st: ObserverState, p_base, R_wb, q, u,
           contact_forces, dt, gain: float = 0.5) -> ObserverState:
    """One observer tick.  contact_forces: (4,3) world forces at the feet
    (measured, the role of the bumper sensors)."""
    import jax

    M = rbd.mass_matrix(cfg.robot, R_wb, q)
    h = rbd.bias_forces(cfg.robot, p_base, R_wb, q, u)
    Jc = rbd.contact_jacobian_mixed(cfg.robot, p_base, R_wb, q)
    return update_from_dyn(st, M, h, Jc, u, contact_forces, dt, gain,
                           mdot_u=mdot_u(cfg, R_wb, q, u))


def mdot_u(cfg: EngineConfig, R_wb, q, u):
    """(18,) Mdot @ u — the convective momentum term, exact via one jvp
    of the mass matrix along the state velocity (Rdot = skew(omega) R,
    qdot = u[6:18]).

    The momentum identity d/dt(M u) = S'tau + Jc'f - h + Mdot u (from
    the equations of motion M udot + h = forces) makes this term part of
    the observer's "known" flow; the reference realizes the same thing
    as the transposed-Coriolis form C' qdot from iDynTree
    (main.cpp:898-907).  Dropping it leaves a bias ~ Mdot u (measured
    ~5 N on a trotting DogBot — zero only at rest).
    """
    import jax

    from ..ops.rotations import skew

    Rdot = skew(u[3:6]) @ R_wb
    _, Md = jax.jvp(lambda R, qq: rbd.mass_matrix(cfg.robot, R, qq),
                    (R_wb, q), (Rdot, u[6:18]))
    return Md @ u


def update_from_dyn(st: ObserverState, M, h, Jc, u, contact_forces, dt,
                    gain, mdot_u) -> ObserverState:
    """Observer tick against ALREADY-EVALUATED dynamics (M, h, Jc).

    The 400 Hz tracking tick computes exactly these for the WBC
    (wbc._build_qp, one rbd evaluation per tick); the in-loop observer
    reuses them — the reference's estimate_loop re-evaluates the model in
    its own thread (main.cpp:843-930).  The residual update:
        y_int += ((Jc' f + Mdot u)[0:6] - h[0:6] + w) dt
                                                     (main.cpp:898-907)
        w      = gain * ((M u)[0:6] - y_int - p0)    (main.cpp:909-913)
    `u` should be the velocity AFTER the physics step whose measured
    contact forces are passed (the freshest momentum the residual
    explains); M/h/Jc at the pre-step state lag one tick, negligible at
    2.5 ms.  `contact_forces` should be the substep-AVERAGED measurement
    (physics.ContactInfo.forces_avg) — the impulse the momentum actually
    saw; `mdot_u` from mdot_u() above.
    """
    p = (M @ u)[0:6]
    known = (Jc.T @ contact_forces.reshape(12) - h + mdot_u)[0:6]
    y_int = st.y_int + (known + st.w) * dt
    w = gain * (p - y_int - st.p0)
    return ObserverState(y_int=y_int, w=w, p0=st.p0)
