"""Single-rigid-body (centroidal) dynamics: continuous, discrete, linearized.

Re-derivation of the reference's SRB model (towr
src/towr/single_rigid_body_dynamics.cc:79-103: Newton-Euler violation
[I_w wd + w x I_w w - sum((p_i - r) x f_i); m a - sum f_i - m g]) as
  * a continuous-time derivative for the pure-JAX sim harness, and
  * per-knot discrete linearizations (A_k, B_k, d_k) for the convex MPC
    that replaces the TOWR NLP (SURVEY.md §7.2 item 3/6).

State layout (13):  x = [rpy(3), r(3), omega_world(3), v(3), 1]
The trailing constant 1 carries gravity and other affine terms through the
linear dynamics, so x_{k+1} = A_k x_k + B_k u_k with no separate offset —
the standard trick for condensed MPC.

Controls u (12): stacked ground-reaction forces per leg (BR, BL, FL, FR),
world frame.  Swing legs' columns are masked to zero by the caller.

Linearization choices (after the convex-MPC literature; the gyroscopic term
w x I w and the attitude nonlinearity are dropped, the Euler-rate map is
evaluated at the reference yaw):
    d(rpy)/dt ~= Einv(0, 0, yaw) @ omega
    d(omega)/dt ~= I_w^{-1} sum (p_i - r_ref) x f_i
    d(v)/dt = sum f_i / m + g
These are exactly the terms the reference's DynamicConstraint enforces at
its dt_dyn = 0.1 s grid (dynamic_constraint.cc:37-139), minus second-order
terms that vanish at trot-scale angular rates.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RobotConfig
from ..ops.rotations import (euler_rate_to_omega_world, inertia_tensor,
                             omega_world_to_euler_rate, rpy_to_rot, skew)

NX = 13   # state dim (12 + affine carrier)
NU = 12   # 4 legs x 3 force components
GRAVITY = 9.81


def srb_derivative(cfg: RobotConfig, rpy, r, omega, v, feet_w, forces):
    """Exact continuous SRB dynamics (used by the sim integrator).

    rpy (..,3), r (..,3) CoM pos, omega (..,3) world angular velocity,
    v (..,3) CoM velocity, feet_w (..,4,3) world foot positions,
    forces (..,4,3) world contact forces.
    Returns (rpy_dot, r_dot, omega_dot, v_dot).
    """
    m = cfg.mass
    R = rpy_to_rot(rpy)
    I_b = inertia_tensor(jnp.asarray(cfg.inertia, rpy.dtype))
    I_w = R @ I_b @ jnp.swapaxes(R, -1, -2)
    f_tot = jnp.sum(forces, axis=-2)
    tau = jnp.sum(jnp.cross(feet_w - r[..., None, :], forces), axis=-2)
    gyro = jnp.cross(omega, jnp.einsum("...ij,...j->...i", I_w, omega))
    omega_dot = jnp.linalg.solve(I_w, (tau - gyro)[..., None])[..., 0]
    v_dot = f_tot / m + jnp.array([0.0, 0.0, -GRAVITY], rpy.dtype)
    rpy_dot = jnp.einsum("...ij,...j->...i",
                         omega_world_to_euler_rate(rpy), omega)
    return rpy_dot, v, omega_dot, v_dot


def pack_state(rpy, r, omega, v):
    """(.., NX) with the affine carrier appended."""
    one = jnp.ones(rpy.shape[:-1] + (1,), rpy.dtype)
    return jnp.concatenate([rpy, r, omega, v, one], axis=-1)


def unpack_state(x):
    return x[..., 0:3], x[..., 3:6], x[..., 6:9], x[..., 9:12]


def linearize_discrete(cfg: RobotConfig, yaw_ref, r_ref, feet_w,
                       contact, dt: float):
    """Per-knot discrete linearization (A, B) of the SRB dynamics.

    yaw_ref (..,), r_ref (..,3) reference CoM used for the torque lever arms,
    feet_w (..,4,3) foothold positions, contact (..,4) 0/1 stance mask,
    dt static.  Returns A (..,NX,NX), B (..,NX,NU) via forward-Euler on the
    linearized continuous dynamics (adequate at dt <= 0.05 s; the reference
    plans with dt_dyn = 0.1 s, parameters.cc:47).
    """
    import numpy as _np

    dtype = r_ref.dtype
    batch = yaw_ref.shape
    zeros3 = jnp.zeros(batch + (3, 3), dtype)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))

    rpy0 = jnp.stack([jnp.zeros_like(yaw_ref), jnp.zeros_like(yaw_ref),
                      yaw_ref], axis=-1)
    Einv = omega_world_to_euler_rate(rpy0)                # (..,3,3)

    # I_w^{-1} = R I_b^{-1} R' — I_b^{-1} is a compile-time constant, so
    # no batched LU inverse appears in the graph (the jnp.linalg.inv the
    # first version used emitted dozens of tiny strided ops per call and
    # dominated plan() wall time — see PERF.md r3 prep-vs-solve split)
    R = rpy_to_rot(rpy0)
    ixx, iyy, izz, ixy, ixz, iyz = cfg.inertia
    I_b_np = _np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]],
                       _np.float64)
    I_b_inv = jnp.asarray(_np.linalg.inv(I_b_np), dtype)
    I_w_inv = jnp.einsum("...ij,jk,...lk->...il", R, I_b_inv, R)

    # Assemble A = I + dt*Ac by concatenating 3-row bands (no .at[].set
    # scatter chains: each produced exactly one full-size copy of the
    # (B, H, NX, NX) buffer).
    def band(cols):
        # cols: list of (col_start, (..,3,3) block); rest zero
        parts, pos = [], 0
        for cs, blk in cols:
            if cs > pos:
                parts.append(jnp.zeros(batch + (3, cs - pos), dtype))
            parts.append(blk)
            pos = cs + 3
        if pos < NX:
            parts.append(jnp.zeros(batch + (3, NX - pos), dtype))
        return jnp.concatenate(parts, axis=-1)

    dts = jnp.asarray(dt, dtype)
    rows_rpy = band([(0, eye3), (6, dts * Einv)])          # rpy' = Einv w
    rows_r = band([(3, eye3), (9, dts * eye3)])            # r' = v
    rows_w = band([(6, eye3)])                             # w' = (forces)
    # v rows: eye + affine gravity column
    rows_v = jnp.concatenate(
        [jnp.zeros(batch + (3, 9), dtype), eye3,
         jnp.broadcast_to(jnp.asarray([0.0, 0.0, -GRAVITY * dt], dtype)[
             (None,) * len(batch) + (slice(None), None)], batch + (3, 1))],
        axis=-1)
    row_aff = jnp.concatenate(
        [jnp.zeros(batch + (1, 12), dtype),
         jnp.ones(batch + (1, 1), dtype)], axis=-1)
    A = jnp.concatenate([rows_rpy, rows_r, rows_w, rows_v, row_aff],
                        axis=-2)

    # B rows: omega' blocks dt * I_w^{-1} skew(lever_i) * contact_i side
    # by side, and v' blocks dt/m * contact_i * I; zeros elsewhere.
    lever = feet_w - r_ref[..., None, :]                   # (..,4,3)
    sk = skew(lever)                                       # (..,4,3,3)
    wblk = dts * jnp.einsum("...ij,...ljk->...lik", I_w_inv, sk)
    wblk = wblk * contact[..., :, None, None]
    wrows = jnp.concatenate([wblk[..., i, :, :] for i in range(4)], axis=-1)
    vblk = (dts / cfg.mass) * contact[..., :, None, None] * eye3[..., None,
                                                                 :, :]
    vrows = jnp.concatenate([vblk[..., i, :, :] for i in range(4)], axis=-1)
    B = jnp.concatenate(
        [jnp.zeros(batch + (6, NU), dtype), wrows, vrows,
         jnp.zeros(batch + (1, NU), dtype)], axis=-2)
    return A, B
