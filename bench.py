"""Headline benchmark: batched MPC solves/s at horizon 20 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 10_000 — the BASELINE.json north-star rate
(>= 10k batched MPC solves/s on one v5e host at horizon 20).

Each "solve" is a full planner.plan: per-knot SRB linearization and the
batched Riccati interior-point solve with friction-pyramid constraints
(the role IPOPT+TOWR fills in the reference with a 20 s budget and the
sim paused, topt.cpp:97 / main.cpp:1250), running the VMEM-resident
one-kernel Pallas backend (ops/pallas_riccati.py::solve_stage_qp_resident
— the measured winner of the r3 device sweep; "auto" resolves to it on
TPU).  Backend x batch exploration lives in benchmarks/backend_sweep.py;
see PERF.md for the recorded sweep.
"""

import json
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compilation cache: remote-compile latency through the
    # tunnel varies wildly between runs; cached executables make the bench
    # measure the solver, not the compiler
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from apf_quadruped_tpu import planner
    from apf_quadruped_tpu.config import EngineConfig, MpcConfig, SolverConfig
    from apf_quadruped_tpu.models import srb
    from apf_quadruped_tpu.models.dogbot import nominal_stance
    from apf_quadruped_tpu import gait

    # THE production solver config: SolverConfig() defaults (iters=15,
    # reltol=abstol=1e-2 — the reference's own runtime tolerance,
    # main.cpp:1651-1652).  bench.py, wbc_latency.py, backend_sweep.py,
    # f32_health.py and the CLI all use the same defaults so every
    # artifact speaks about one config.
    cfg = EngineConfig(mpc=MpcConfig(horizon=20, dt=0.025),
                       solver=SolverConfig())
    dtype = jnp.float32
    # batch 2048 on the resident Pallas backend (the old scan backend hit
    # an XLA batched-small-matmul pathology past B=128; the Pallas kernels
    # sidestep it — full backend x batch sweep recorded in PERF.md)
    B = 2048
    rng = np.random.default_rng(0)

    com0 = jnp.asarray(
        np.array([0.0, 0.0, 0.4]) + rng.normal(size=(B, 3)) * 0.01, dtype)
    yaw = jnp.asarray(rng.normal(size=B) * 0.1, dtype)
    vel = jnp.asarray(rng.normal(size=(B, 3)) * 0.05, dtype)
    feet0 = jnp.asarray(nominal_stance(cfg.robot))[None] + com0[:, None, :]
    feet0 = feet0.at[..., 2].set(0.0).astype(dtype)
    com_des = com0 + jnp.asarray([0.0, 0.06, 0.0], dtype)

    cycle = jnp.full(B, cfg.mpc.horizon * cfg.mpc.dt, dtype)
    contacts = gait.horizon_contacts(
        jnp.ones(B, jnp.int32), jnp.zeros(B, dtype), cfg.mpc.dt,
        cfg.mpc.horizon, cycle, dtype=dtype)
    refs = planner.MpcRefs(
        contacts=contacts,
        feet_w=planner.foothold_schedule(feet0, feet0, contacts),
        x_ref=planner.reference_trajectory(
            cfg, jnp.zeros((B, 3), dtype), com0, com_des, yaw, cycle),
        yaw_ref=yaw)
    x0 = srb.pack_state(
        jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], -1),
        com0, jnp.zeros((B, 3), dtype), vel)

    f = jax.jit(lambda x0, refs: planner.plan(cfg, x0, refs))
    out = f(x0, refs)                                  # compile
    np.asarray(out.forces).sum()                       # force execution
    conv = float(np.mean(np.asarray(out.sol.converged)))

    # Timing: enqueue a burst and force a VALUE READ of the last result.
    # Through the axon tunnel block_until_ready can return at enqueue
    # (observed both behaviors across sessions), so only a read of the
    # final output reliably fences the whole burst; the one read's
    # round-trip (~27 ms) amortizes over the reps.  MEDIAN of 3 bursts:
    # single bursts vary ~+-6% run-to-run on the shared tunnel.
    n_rep = 50
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = f(x0, refs)
        np.asarray(out.forces).sum()
        rates.append(B * n_rep / (time.perf_counter() - t0))
    solves_per_s = float(np.median(rates))

    print(json.dumps({
        "metric": f"batched_mpc_solves_per_s_h{cfg.mpc.horizon}"
                  f"_b{B}_conv{conv:.2f}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 10_000.0, 3),
    }))


if __name__ == "__main__":
    main()
