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
    M = rbd.mass_matrix(cfg.robot, R_wb, q)
    h = rbd.bias_forces(cfg.robot, p_base, R_wb, q, u)
    Jc = rbd.contact_jacobian_mixed(cfg.robot, p_base, R_wb, q)
    p = (M @ u)[0:6]
    known = (Jc.T @ contact_forces.reshape(12) - h)[0:6]
    y_int = st.y_int + (known + st.w) * dt
    w = gain * (p - y_int - st.p0)
    return ObserverState(y_int=y_int, w=w, p0=st.p0)
