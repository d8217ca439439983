"""Swing-foot reference trajectories (closed-form splines).

Replaces towr's phase-based end-effector motion nodes + SwingConstraint
(reference src/towr/nodes_variables_phase_based.cc, swing_constraint.cc):
instead of optimizing cubic-Hermite EE nodes inside the NLP, swing motion is
a fixed closed-form spline from liftoff foothold to the APF-chosen target —
smooth cubic in xy (zero end velocities, like towr's node conditions) and a
quartic "lift-cruise-land" profile in z with configurable apex.

All functions are elementwise in the phase variable tau in [0,1] and
broadcast over arbitrary batch/leg dims; position, velocity, and
acceleration are analytic (the tracking QP needs swing-foot acc refs,
reference main.cpp:1983-1992).
"""

from __future__ import annotations

import jax.numpy as jnp


def _cubic_blend(tau):
    """Smoothstep s(tau) = 3 tau^2 - 2 tau^3 with s(0)=0, s(1)=1, s'(0)=s'(1)=0.
    Returns (s, ds/dtau, d2s/dtau2)."""
    s = tau * tau * (3.0 - 2.0 * tau)
    ds = 6.0 * tau * (1.0 - tau)
    dds = 6.0 - 12.0 * tau
    return s, ds, dds


def _z_profile(tau):
    """Normalized vertical profile z(tau) = 16 tau^2 (1-tau)^2 scaled so the
    apex (at tau=0.5) is 1.  z(0)=z(1)=0, z'(0)=z'(1)=0.
    Returns (z, dz/dtau, d2z/dtau2)."""
    u = tau * (1.0 - tau)
    z = 16.0 * u * u
    dz = 32.0 * u * (1.0 - 2.0 * tau)
    ddz = 32.0 * ((1.0 - 2.0 * tau) ** 2 - 2.0 * u)
    return z, dz, ddz


def swing_ref(p0, p1, height, tau, duration):
    """Swing reference at phase tau.

    p0, p1: (.., 3) liftoff / touchdown positions (world).
    height: scalar or (..,) apex height above the chord.
    tau: (..,) phase in [0, 1]; duration: (..,) seconds (for time scaling).
    Returns (pos, vel, acc) each (.., 3), with vel/acc in real time units.
    """
    tau = jnp.clip(tau, 0.0, 1.0)
    s, ds, dds = _cubic_blend(tau)
    z, dz, ddz = _z_profile(tau)
    pos = p0 + (p1 - p0) * s[..., None]
    pos = pos.at[..., 2].add(height * z)
    inv_T = 1.0 / jnp.maximum(duration, 1e-6)
    vel = (p1 - p0) * (ds * inv_T)[..., None]
    vel = vel.at[..., 2].add(height * dz * inv_T)
    acc = (p1 - p0) * (dds * inv_T * inv_T)[..., None]
    acc = acc.at[..., 2].add(height * ddz * inv_T * inv_T)
    return pos, vel, acc
