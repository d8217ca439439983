"""Rotation / Euler-angle utilities (ZYX convention).

Re-derivation of the math in the reference's EulerConverter
(reference src/towr/euler_converter.cc, 312 LoC): mappings between ZYX
Euler angles (roll=x, pitch=y, yaw=z stored as [roll, pitch, yaw]) and
rotation matrices, and between Euler rates and angular velocity.

Everything is a pure function of jnp arrays, shape-polymorphic over leading
batch dims, and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix: skew(v) @ u == cross(v, u). v: (..., 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rot_x(a: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(a: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(a: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_rot(rpy: jnp.ndarray) -> jnp.ndarray:
    """ZYX Euler [roll, pitch, yaw] -> world_R_base. rpy: (..., 3) -> (..., 3, 3)."""
    return rot_z(rpy[..., 2]) @ rot_y(rpy[..., 1]) @ rot_x(rpy[..., 0])


def rot_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rpy_to_rot (pitch in (-pi/2, pi/2))."""
    pitch = jnp.arcsin(-jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_rate_to_omega_world(rpy: jnp.ndarray) -> jnp.ndarray:
    """Matrix E(rpy) with omega_world = E @ d(rpy)/dt  (ZYX convention).

    Same mapping towr's EulerConverter::GetM provides (euler_converter.cc),
    re-derived: omega = yaw_dot * ez + R_z pitch_dot * ey + R_z R_y roll_dot * ex.
    """
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    zero, one = jnp.zeros_like(r), jnp.ones_like(r)
    # columns: [d/droll, d/dpitch, d/dyaw]
    return jnp.stack(
        [
            jnp.stack([cp * cy, -sy, zero], axis=-1),
            jnp.stack([cp * sy, cy, zero], axis=-1),
            jnp.stack([-sp, zero, one], axis=-1),
        ],
        axis=-2,
    )


def omega_world_to_euler_rate(rpy: jnp.ndarray) -> jnp.ndarray:
    """Inverse mapping d(rpy)/dt = Einv @ omega_world (valid |pitch| < pi/2)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    tp = sp / cp
    zero, one = jnp.zeros_like(r), jnp.ones_like(r)
    return jnp.stack(
        [
            jnp.stack([cy / cp, sy / cp, zero], axis=-1),
            jnp.stack([-sy, cy, zero], axis=-1),
            jnp.stack([cy * tp, sy * tp, one], axis=-1),
        ],
        axis=-2,
    )


def inertia_tensor(inertia6: jnp.ndarray) -> jnp.ndarray:
    """(Ixx, Iyy, Izz, Ixy, Ixz, Iyz) -> symmetric 3x3."""
    ixx, iyy, izz, ixy, ixz, iyz = (inertia6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([ixx, ixy, ixz], axis=-1),
            jnp.stack([ixy, iyy, iyz], axis=-1),
            jnp.stack([ixz, iyz, izz], axis=-1),
        ],
        axis=-2,
    )
