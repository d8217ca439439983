"""Roofline / cost-analysis account of the headline planner solve.

VERDICT r1 item 2 asked for a *profiled* account of the remaining
performance wall.  This prints, for the fused Pallas Riccati backend at
the bench operating point:

  * XLA's compiled cost analysis (FLOPs, bytes accessed) of one call,
  * measured wall time -> achieved FLOP/s and HBM GB/s,
  * position against the v5e roofline (peak ~197 TFLOP/s bf16 MXU,
    ~819 GB/s HBM) — showing whether the kernel is compute-, bandwidth-,
    or (as PERF.md argues) latency/VPU-chain-bound.

Output: one JSON line per quantity; paste into PERF.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling import build_inputs, build_plan_fn

    B = int(os.environ.get("ROOFLINE_B", "1024"))
    backend = os.environ.get(
        "ROOFLINE_BACKEND",
        "riccati_resident" if jax.default_backend() == "tpu" else "riccati")
    # the production iteration budget (SolverConfig default, shared by
    # bench.py / backend_sweep / wbc_latency / f32_health)
    cfg, _ = build_plan_fn(backend, 15)
    x0, refs = build_inputs(cfg, B)

    from apf_quadruped_tpu import planner
    f = jax.jit(lambda x0, refs: planner.plan(cfg, x0, refs))
    lowered = f.lower(x0, refs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):          # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    out = jax.block_until_ready(f(x0, refs))
    conv = float(np.mean(np.asarray(out.sol.converged)))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x0, refs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    tflops = flops / dt / 1e12
    gbps = bytes_acc / dt / 1e9
    peak_tflops = 197.0      # v5e MXU bf16 peak
    peak_gbps = 819.0        # v5e HBM
    print(json.dumps({
        "backend": backend, "B": B, "conv": round(conv, 4),
        "ms_per_call": round(dt * 1e3, 3),
        "solves_per_s": round(B / dt, 1),
        "xla_flops_per_call": flops,
        "xla_bytes_per_call": bytes_acc,
        "achieved_tflops": round(tflops, 4),
        "achieved_hbm_gbps": round(gbps, 2),
        "pct_mxu_peak": round(100 * tflops / peak_tflops, 3),
        "pct_hbm_peak": round(100 * gbps / peak_gbps, 3),
        "note": "both pct near zero => latency/VPU-chain-bound, matching "
                "PERF.md (sequential per-lane Cholesky in the 12x12 dims); "
                "NB cost_analysis may exclude FLOPs inside custom Pallas "
                "kernels — treat as lower bound",
    }, ), flush=True)


if __name__ == "__main__":
    main()
