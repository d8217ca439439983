"""Pallas TPU kernel: batched small-matrix Cholesky factor + solve.

The hot primitive of both interior-point solvers is "factor a small SPD
matrix and solve a few right-hand sides" repeated per knot per iteration
(ops/riccati.py, ops/qpsolve.py).  XLA lowers batched (B, n, n) cholesky /
triangular-solve to generic loops whose layouts put the tiny matrix
dimensions on the vector lanes — wasting >90% of each (8, 128) VPU tile at
n = 12.

This kernel flips the layout: BATCH ON THE LANES.  Matrices live as
(n, n, B) with B padded to the 128-lane boundary, every scalar of the
textbook algorithm becomes a (B,)-wide vector op, and the n^3/6 recurrence
is fully unrolled at trace time (n is static and small).  One grid step
processes a 128-scenario block entirely in VMEM.

Exposed ops (all also usable in interpret mode on CPU for tests):
  chol_solve_blocked(H, rhs)  ->  X  solving H X = rhs for SPD H
with H: (B, n, n), rhs: (B, n, k).

Reference for the role this plays upstream: qpSWIFT's ldl.c (sparse LDL'
factor/solve) — here the factorization is dense, tiny, and vectorized
across scenarios instead of sparse within one problem.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _chol_solve_kernel(n: int, k: int):
    """Kernel body: H_ref (n*n, LANES), rhs_ref (n*k, LANES) ->
    out_ref (n*k, LANES).  Unrolled Cholesky + forward/back substitution
    with every element a 128-wide lane vector."""

    def kernel(h_ref, rhs_ref, out_ref):
        # load all elements as (LANES,) vectors
        Hm = [[h_ref[i * n + j, :] for j in range(n)] for i in range(n)]
        L = [[None] * n for _ in range(n)]
        Linv_diag = [None] * n
        for j in range(n):
            s = Hm[j][j]
            for t in range(j):
                s = s - L[j][t] * L[j][t]
            d = jax.lax.rsqrt(s)
            Linv_diag[j] = d
            L[j][j] = s * d                       # sqrt(s)
            for i in range(j + 1, n):
                s = Hm[i][j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                L[i][j] = s * d

        for c in range(k):
            # forward: L y = b
            y = [None] * n
            for i in range(n):
                s = rhs_ref[i * k + c, :]
                for t in range(i):
                    s = s - L[i][t] * y[t]
                y[i] = s * Linv_diag[i]
            # backward: L' x = y
            x = [None] * n
            for i in reversed(range(n)):
                s = y[i]
                for t in range(i + 1, n):
                    s = s - L[t][i] * x[t]
                x[i] = s * Linv_diag[i]
            for i in range(n):
                out_ref[i * k + c, :] = x[i]

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def chol_solve_blocked(H: jnp.ndarray, rhs: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Solve H X = rhs for batched SPD H.

    H: (B, n, n), rhs: (B, n, k) -> (B, n, k).  B is padded to a multiple
    of 128 internally; n, k must be small (fully unrolled).
    """
    B, n, _ = H.shape
    k = rhs.shape[-1]
    dtype = H.dtype
    Bp = ((B + LANES - 1) // LANES) * LANES

    # batch-last layout, flattened matrix dims on sublanes
    Ht = jnp.moveaxis(H, 0, -1).reshape(n * n, B)
    Rt = jnp.moveaxis(rhs, 0, -1).reshape(n * k, B)
    if Bp != B:
        # pad with identity systems so the kernel's rsqrt stays finite
        eye = jnp.tile(jnp.eye(n, dtype=dtype).reshape(n * n, 1),
                       (1, Bp - B))
        Ht = jnp.concatenate([Ht, eye], axis=1)
        Rt = jnp.concatenate([Rt, jnp.zeros((n * k, Bp - B), dtype)], axis=1)

    grid = (Bp // LANES,)
    out = pl.pallas_call(
        _chol_solve_kernel(n, k),
        out_shape=jax.ShapeDtypeStruct((n * k, Bp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n * n, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n * k, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n * k, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Ht, Rt)
    out = out[:, :B].reshape(n, k, B)
    return jnp.moveaxis(out, -1, 0)
