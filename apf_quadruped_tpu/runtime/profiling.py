"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference scatters std::chrono spans around its loops (main.cpp:857,
923-926, 1688-1690, mostly commented out) and relies on qpSWIFT's stats
struct.  Here:

  * `trace(name)` — context manager around jax.profiler.TraceAnnotation +
    optional on-disk profile capture (tensorboard-compatible), enabled by
    APF_PROFILE_DIR.
  * `timed(fn)` — wall-clock timing with block_until_ready fencing (the
    only honest way to time dispatched XLA work).
  * `SolverStats.collect(sol)` — batched solver diagnostics (convergence
    fraction, iteration percentiles, residuals), the qpSWIFT stats-struct
    equivalent, reducible across hosts with psum/pmean.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region for the JAX profiler; if APF_PROFILE_DIR is set,
    the first trace() also starts a capture there."""
    prof_dir = os.environ.get("APF_PROFILE_DIR")
    started = False
    if prof_dir and not getattr(trace, "_active", False):
        jax.profiler.start_trace(prof_dir)
        trace._active = True
        started = True
    with jax.profiler.TraceAnnotation(name):
        yield
    if started:
        jax.profiler.stop_trace()
        trace._active = False


def timed(fn: Callable, *args, reps: int = 1, warmup: bool = True,
          **kwargs) -> tuple[Any, float]:
    """(result, seconds/call) with proper device fencing."""
    if warmup:
        out = jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / max(reps, 1)


class SolverStats(NamedTuple):
    """Aggregate solver health for a batch (qpSWIFT stats equivalent:
    Auxilary.h:55-86 tsolve/iters/residuals, batched)."""

    conv_frac: float
    iters_p50: float
    iters_p99: float
    gap_max: float
    res_max: float

    @classmethod
    def collect(cls, sol) -> "SolverStats":
        conv = np.asarray(sol.converged)
        iters = np.asarray(sol.iters)
        return cls(
            conv_frac=float(conv.mean()),
            iters_p50=float(np.percentile(iters, 50)),
            iters_p99=float(np.percentile(iters, 99)),
            gap_max=float(np.asarray(sol.gap).max()),
            res_max=float(np.asarray(sol.res_norm).max()))

    def as_dict(self):
        return dict(self._asdict())


def pmean_stats(stats: dict, axis_name: str) -> dict:
    """Reduce a dict of scalar stats across a mesh axis (inside
    shard_map) — the cross-host solver-stat reduction of SURVEY.md §5.8."""
    return {k: jax.lax.pmean(v, axis_name) for k, v in stats.items()}
