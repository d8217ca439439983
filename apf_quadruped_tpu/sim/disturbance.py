"""Scheduled disturbance forces — the force_plugin replacement.

The reference's Gazebo ModelPlugin pushes BASE and LEG links with
sinusoidal, impulsive, or randomized forces per case study (reference
force_plugin/src/force_plugin.cpp:124-494; AddForceAtRelativePosition on
leg links at :130-189 and :200-326 — the lever arm of a leg push tips
the base, which a base-only force cannot reproduce).  Here a disturbance
is DATA: a (n_events, 8) array of

    [t_start, t_end, fx, fy, fz, omega, phase, link]

rows, evaluated branch-free at sim time t and summed — batched over
scenarios like everything else.  `link` selects the application point:
0 = base origin (force only), 1..4 = the foot of leg link-1 (BL, BR,
FL, FR — applied through that foot's contact Jacobian J_leg' f, so the
full wrench including the lever-arm torque reaches the base).  Rows with
omega == 0 are constant pushes over [t_start, t_end); rows with
omega != 0 modulate by sin(omega*t + phase) (force_plugin.cpp:132-139:
x_dist = 20*sin(t)).  Legacy (n_events, 7) schedules (no link column)
are accepted and treated as all-base.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NCOL = 8


def empty(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((1, NCOL), dtype)


def impulses(events, dtype=jnp.float32) -> jnp.ndarray:
    """events: list of (t_start, t_end, fx, fy, fz) base pushes or
    (t_start, t_end, fx, fy, fz, link) with link 1..4 = leg foot."""
    out = np.zeros((len(events), NCOL))
    for i, ev in enumerate(events):
        out[i, :5] = ev[:5]
        if len(ev) > 5:
            out[i, 7] = ev[5]
    return jnp.asarray(out, dtype)


def sinusoidal(amp_xyz, omega: float, t0: float = 0.0, t1: float = 1e9,
               phase: float = 0.0, link: int = 0,
               dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal push f(t) = amp * sin(omega*t + phase) over [t0, t1).

    Mirrors force_plugin's case-1 block (force_plugin.cpp:132-139:
    x_dist = 20*sin(t) applied continuously); link > 0 applies it at a
    leg foot like the plugin's AddForceAtRelativePosition on leg links."""
    ax, ay, az = amp_xyz
    return jnp.asarray([[t0, t1, ax, ay, az, omega, phase, link]], dtype)


def leg_push(leg: int, amp_xyz, t0: float, t1: float, omega: float = 0.0,
             phase: float = 0.0, dtype=jnp.float32) -> jnp.ndarray:
    """Push leg `leg` (0..3 = BL, BR, FL, FR) at its foot — the
    force_plugin leg-link case blocks (force_plugin.cpp:130-189)."""
    ax, ay, az = amp_xyz
    return jnp.asarray([[t0, t1, ax, ay, az, omega, phase, leg + 1]], dtype)


def random_pushes(rng: np.random.Generator, horizon_s: float, n=4,
                  f_max=60.0, dur=0.3, batch=1, dtype=jnp.float32,
                  p_leg: float = 0.0):
    """Randomized pushes like force_plugin's case-4 block
    (force_plugin.cpp:200-326: a new random force every couple of
    seconds); with probability p_leg a push lands on a random leg link
    instead of the base."""
    out = np.zeros((batch, n, NCOL))
    for b in range(batch):
        for i in range(n):
            t0 = rng.uniform(0.5, horizon_s - dur)
            f = rng.uniform(-f_max, f_max, 2)
            out[b, i, :5] = (t0, t0 + dur, f[0], f[1], 0.0)
            if rng.uniform() < p_leg:
                out[b, i, 7] = rng.integers(1, 5)
    return jnp.asarray(out, dtype)


def _active_forces(schedule: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(.., n_events, 3) per-row force at time t."""
    active = ((t[..., None] >= schedule[..., 0])
              & (t[..., None] < schedule[..., 1]))
    omega = schedule[..., 5]
    mod = jnp.where(omega != 0,
                    jnp.sin(omega * t[..., None] + schedule[..., 6]),
                    jnp.ones_like(omega))
    return schedule[..., 2:5] * (active * mod)[..., None]


def eval_at(schedule: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(.., 3) total BASE force at time t (rows with link != 0 excluded)."""
    f = _active_forces(schedule, t)
    if schedule.shape[-1] > 7:
        f = f * (schedule[..., 7:8] == 0)
    return jnp.sum(f, axis=-2)


def eval_links(schedule: jnp.ndarray, t: jnp.ndarray):
    """Application-point-resolved evaluation at time t.

    Returns (f_base (.., 3), f_feet (.., 4, 3)): the base-origin force
    and the per-leg foot forces (force_plugin's leg-link pushes)."""
    f = _active_forces(schedule, t)                      # (.., E, 3)
    if schedule.shape[-1] <= 7:
        return jnp.sum(f, axis=-2), jnp.zeros(f.shape[:-2] + (4, 3),
                                              f.dtype)
    link = schedule[..., 7].astype(jnp.int32)            # (.., E)
    onehot = (link[..., None] == jnp.arange(5)).astype(f.dtype)
    by_link = jnp.einsum("...ec,...el->...lc", f, onehot)  # (.., 5, 3)
    return by_link[..., 0, :], by_link[..., 1:5, :]
