"""Scheduled disturbance forces — the force_plugin replacement.

The reference's Gazebo ModelPlugin pushes leg/base links with sinusoidal,
impulsive, or randomized forces per case study (reference
force_plugin/src/force_plugin.cpp:124-494, scenario blocks commented out).
Here a disturbance is DATA: a (n_events, 7) array of
[t_start, t_end, fx, fy, fz, _, _] rows, evaluated branch-free at sim time
t and summed — batched over scenarios like everything else.
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
    return jnp.sum(schedule[..., 2:5] * active[..., None], axis=-2)
