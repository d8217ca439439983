"""Scheduled disturbance forces — the force_plugin replacement.

The reference's Gazebo ModelPlugin pushes leg/base links with sinusoidal,
impulsive, or randomized forces per case study (reference
force_plugin/src/force_plugin.cpp:124-494, scenario blocks commented out).
Here a disturbance is DATA: a (n_events, 7) array of
[t_start, t_end, fx, fy, fz, omega, phase] rows, evaluated branch-free at
sim time t and summed — batched over scenarios like everything else.
Rows with omega == 0 are constant pushes over [t_start, t_end) (the
impulse / random-push case studies); rows with omega != 0 modulate the
force by sin(omega*t + phase) — negative omega is a valid phase-reversed
sinusoid (the sinusoidal case-study block, force_plugin.cpp:132-139:
x_dist = 20*sin(t)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def empty(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((1, 7), dtype)


def impulses(events, dtype=jnp.float32) -> jnp.ndarray:
    """events: list of (t_start, t_end, fx, fy, fz)."""
    out = np.zeros((len(events), 7))
    for i, (t0, t1, fx, fy, fz) in enumerate(events):
        out[i, :5] = (t0, t1, fx, fy, fz)
    return jnp.asarray(out, dtype)


def sinusoidal(amp_xyz, omega: float, t0: float = 0.0, t1: float = 1e9,
               phase: float = 0.0, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal push f(t) = amp * sin(omega*t + phase) over [t0, t1).

    Mirrors force_plugin's case-1 block (force_plugin.cpp:132-139:
    x_dist = 20*sin(t) applied continuously)."""
    ax, ay, az = amp_xyz
    return jnp.asarray([[t0, t1, ax, ay, az, omega, phase]], dtype)


def random_pushes(rng: np.random.Generator, horizon_s: float, n=4,
                  f_max=60.0, dur=0.3, batch=1, dtype=jnp.float32):
    """Randomized pushes like force_plugin's case-4 block
    (force_plugin.cpp:200-326: a new random force every couple of
    seconds)."""
    out = np.zeros((batch, n, 7))
    for b in range(batch):
        for i in range(n):
            t0 = rng.uniform(0.5, horizon_s - dur)
            f = rng.uniform(-f_max, f_max, 2)
            out[b, i, :5] = (t0, t0 + dur, f[0], f[1], 0.0)
    return jnp.asarray(out, dtype)


def eval_at(schedule: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(.., 3) total external base force at time t.
    schedule: (.., n_events, 7)."""
    active = ((t[..., None] >= schedule[..., 0])
              & (t[..., None] < schedule[..., 1]))
    omega = schedule[..., 5]
    mod = jnp.where(omega != 0,
                    jnp.sin(omega * t[..., None] + schedule[..., 6]),
                    jnp.ones_like(omega))
    return jnp.sum(schedule[..., 2:5] * (active * mod)[..., None], axis=-2)
