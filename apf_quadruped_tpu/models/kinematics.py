"""Analytic 3-DoF leg kinematics for DogBot (roll-pitch-knee chains).

Replaces the reference's iDynTree KinDynComputations usage
(reference main.cpp:723-841: computeJac / computeJacDotQDot /
ComputeJaclinear) with closed-form forward kinematics of the xacro chain
(dogbot.xacro:242-345) plus autodiff Jacobians — pure JAX, vmappable over
legs and batch.

Chain per leg (sigma_x = right/left, sigma_y = front/back):
    body --(p_hip)--> roll about (0, sigma_y, 0)
         --(p_shift lateral)--> pitch about (sigma_x, 0, 0)
         --(0,0,-L_upper)--> knee about (-sigma_x, 0, 0)
         --> foot point at (0, -0.035, -L_lower) in lower-leg frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RobotConfig
from ..ops.rotations import rot_x, rot_y, skew
from .dogbot import LEG_SIGNS, hip_positions


def leg_fk(cfg: RobotConfig, signs: jnp.ndarray, hip: jnp.ndarray,
           q: jnp.ndarray) -> jnp.ndarray:
    """Foot position in base frame for one leg. q: (..., 3) = (roll, pitch, knee)."""
    sx, sy = signs[..., 0], signs[..., 1]
    r1 = rot_y(sy * q[..., 0])          # roll about the body's long axis
    r2 = rot_x(sx * q[..., 1])          # pitch
    r3 = rot_x(-sx * q[..., 2])         # knee (opposite sense, dogbot.xacro:337)
    p1 = jnp.stack(
        [(cfg.leg_offset_side - cfg.hip_offset_side) * sx,
         jnp.zeros_like(sx), jnp.zeros_like(sx)], axis=-1)
    p2 = jnp.asarray([0.0, 0.0, -cfg.upper_leg_len], q.dtype)
    p3 = jnp.asarray([0.0, cfg.foot_y_offset, -cfg.lower_leg_len], q.dtype)
    inner = p2 + jnp.einsum("...ij,j->...i", r3, p3)
    mid = p1 + jnp.einsum("...ij,...j->...i", r2, inner)
    return hip + jnp.einsum("...ij,...j->...i", r1, mid)


def fk(cfg: RobotConfig, q: jnp.ndarray) -> jnp.ndarray:
    """All-leg forward kinematics. q: (..., 12) leg-major -> (..., 4, 3) feet in base frame."""
    signs = jnp.asarray(LEG_SIGNS, q.dtype)
    hips = jnp.asarray(hip_positions(cfg), q.dtype)
    qq = q.reshape(q.shape[:-1] + (4, 3))
    f = jax.vmap(lambda s, h, ql: leg_fk(cfg, s, h, ql),
                 in_axes=(0, 0, -2), out_axes=-2)
    return f(signs, hips, qq)


def leg_jacobian(cfg: RobotConfig, leg: int, q_leg: jnp.ndarray) -> jnp.ndarray:
    """3x3 Jacobian d(foot pos)/d(q_leg) in base frame for a static leg index."""
    signs = jnp.asarray(LEG_SIGNS[leg], q_leg.dtype)
    hip = jnp.asarray(hip_positions_static(cfg)[leg], q_leg.dtype)
    return jax.jacfwd(lambda ql: leg_fk(cfg, signs, hip, ql))(q_leg)


def hip_positions_static(cfg: RobotConfig) -> np.ndarray:
    return hip_positions(cfg)


def jacobians(cfg: RobotConfig, q: jnp.ndarray) -> jnp.ndarray:
    """(.., 4, 3, 3) per-leg foot Jacobians in base frame. q: (..., 12)."""
    signs = jnp.asarray(LEG_SIGNS, q.dtype)
    hips = jnp.asarray(hip_positions(cfg), q.dtype)
    qq = q.reshape(q.shape[:-1] + (4, 3))

    def one(s, h, ql):
        return jax.jacfwd(lambda z: leg_fk(cfg, s, h, z))(ql)

    f = jax.vmap(one, in_axes=(0, 0, -2), out_axes=-3)
    return f(signs, hips, qq)


def jdot_qd(cfg: RobotConfig, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """(.., 4, 3) per-leg Jdot @ qd bias (base frame).

    Computed as the directional derivative of q -> J(q) qd along qd, i.e.
    the same quantity iDynTree's getFrameBiasAcc supplies to the reference
    (main.cpp:959-971), restricted to the leg chain.
    """
    signs = jnp.asarray(LEG_SIGNS, q.dtype)
    hips = jnp.asarray(hip_positions(cfg), q.dtype)
    qq = q.reshape(q.shape[:-1] + (4, 3))
    qqd = qd.reshape(qd.shape[:-1] + (4, 3))

    def one(s, h, ql, qld):
        vel = lambda z: jax.jvp(lambda zz: leg_fk(cfg, s, h, zz), (z,), (qld,))[1]
        return jax.jvp(vel, (ql,), (qld,))[1]

    f = jax.vmap(one, in_axes=(0, 0, -2, -2), out_axes=-2)
    return f(signs, hips, qq, qqd)


def contact_jacobian(cfg: RobotConfig, q: jnp.ndarray, R_wb: jnp.ndarray,
                     com_w: jnp.ndarray, base_pos_w: jnp.ndarray) -> jnp.ndarray:
    """(.., 12, 18) stacked linear contact Jacobian in CoM coordinates.

    Row blocks per leg i: v_foot_i = v_com + omega x r_i + R_wb J_leg_i qd_i,
    i.e. columns [0:3] = I, [3:6] = -skew(r_i), [6+3i : 9+3i] = R_wb J_leg_i,
    where r_i = p_foot_i - p_com (world).  This is the role of the
    reference's JacCOM_lin (main.cpp:932-942).
    """
    feet_b = fk(cfg, q)                                   # (..,4,3)
    jl = jacobians(cfg, q)                                # (..,4,3,3)
    feet_w = base_pos_w[..., None, :] + jnp.einsum("...ij,...lj->...li", R_wb, feet_b)
    r = feet_w - com_w[..., None, :]                      # (..,4,3)
    jw = jnp.einsum("...ij,...ljk->...lik", R_wb, jl)     # (..,4,3,3)

    batch = q.shape[:-1]
    J = jnp.zeros(batch + (12, 18), dtype=q.dtype)
    eye3 = jnp.eye(3, dtype=q.dtype)
    for i in range(4):
        rows = slice(3 * i, 3 * i + 3)
        J = J.at[..., rows, 0:3].set(eye3)
        J = J.at[..., rows, 3:6].set(-skew(r[..., i, :]))
        J = J.at[..., rows, 6 + 3 * i:9 + 3 * i].set(jw[..., i, :, :])
    return J


def stance_ik(cfg: RobotConfig, targets_b, iters: int = 30) -> jnp.ndarray:
    """(12,) joint angles whose FK hits `targets_b` ((4,3) base-frame feet).

    Damped-Newton on the analytic FK; used for initial poses (the analogue of
    the reference's spawn joint configuration, dog.launch / main.cpp:2851-2882).
    Knee-bent seed keeps it away from the straight-leg singularity.
    """
    # Mirror the pitch/knee seed per side: the left-leg (sigma_x = -1) chain
    # rotates with opposite sign (leg_fk), and its xacro joint limits are
    # reflected accordingly (dogbot.xacro:286-297, 336-345).
    q = (np.array([0.0, 0.4, 0.8]) * np.array([[1.0, sx, sx] for sx, _ in
                                               np.asarray(LEG_SIGNS)])).reshape(-1)
    qj = jnp.asarray(q)
    tgt = jnp.asarray(targets_b)

    def step(qv, _):
        feet = fk(cfg, qv)
        err = (tgt - feet).reshape(-1)                    # (12,)
        jl = jacobians(cfg, qv)                           # (4,3,3)
        # Solve per-leg 3x3 damped least squares
        def solve_leg(Ji, ei):
            H = Ji.T @ Ji + 1e-6 * jnp.eye(3)
            return jnp.linalg.solve(H, Ji.T @ ei)
        dq = jax.vmap(solve_leg)(jl, err.reshape(4, 3)).reshape(-1)
        return qv + dq, None

    qj, _ = jax.lax.scan(step, qj, None, length=iters)
    return qj       # jnp array: stays traceable when called under jit
