"""Device-mesh helpers for scenario-parallel sweeps.

One mesh axis ("scenario") is all this workload needs: the model is a
30-to-360-variable QP, so there is no model-parallel dimension worth
sharding (SURVEY.md §2.6); throughput comes from batching scenarios.
Multi-host expansion: `jax.distributed.initialize` + the same code — the
mesh spans all processes' devices and shard_map keeps each host's shard
local (reductions ride ICI/DCN via psum).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SCENARIO_AXIS = "scenario"


def scenario_mesh(devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (SCENARIO_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Place a batched pytree so its leading axis is sharded over the mesh."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_map(mesh: Mesh, fn: Callable, reduce_stats: bool = True):
    """Wrap a per-shard batched function with shard_map over the scenario
    axis.

    fn: (sharded_tree) -> (sharded_out, stats_tree); stats (scalars) are
    pmean-reduced across the mesh (the psum'd solver-stat reductions of
    SURVEY.md §5.8).
    """
    from jax import shard_map

    def wrapped(tree):
        out, stats = fn(tree)
        if reduce_stats:
            stats = jax.tree.map(
                lambda s: jax.lax.pmean(s, SCENARIO_AXIS), stats)
        return out, stats

    # check_vma=True: the varying-manual-axes checker runs on the
    # production sharding wrapper.  The control stack satisfies it by
    # seeding fresh-constant scan carries / jacfwd basis tangents with
    # varying zeros derived from the sharded data (loop._run_cycle_impl
    # `vfalse`, riccati lam0, rbd._jacfwd_seeded) — see seed_varying.
    return shard_map(wrapped, mesh=mesh,
                     in_specs=(P(SCENARIO_AXIS),),
                     out_specs=(P(SCENARIO_AXIS), P()),
                     check_vma=True)


def seed_varying(tree, seed):
    """Make every leaf of `tree` inherit `seed`'s device-varying axes.

    Under shard_map, freshly-created constants are "unvarying" and trip
    lax.scan's carry-type check when mixed with sharded data; adding a
    zero-valued varying scalar fixes the type without changing values.
    seed must be a zero scalar derived from sharded inputs.
    """
    def f(x):
        if jnp.issubdtype(x.dtype, jnp.bool_):
            return x ^ (seed > 0)
        return x + seed.astype(x.dtype)

    return jax.tree.map(f, tree)


def pad_to_devices(n: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n (scenario batches must divide
    evenly across the mesh)."""
    return ((n + n_devices - 1) // n_devices) * n_devices
