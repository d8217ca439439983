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


# ---------------------------------------------------------------------------
# split factor / substitution kernels — for solvers that REUSE one
# factorization across many right-hand sides per iteration (the condensed
# WBC IPM in ops/qpsolve.py factors H and S_eq once per iteration and
# back-substitutes ~a dozen vectors against each)
# ---------------------------------------------------------------------------

def _factor_kernel(n: int):
    """H_ref (n*n, LANES) -> l_ref (n*n, LANES) packed lower-triangular L,
    d_ref (n, LANES) = 1/diag(L)."""

    def kernel(h_ref, l_ref, d_ref):
        L = [[None] * n for _ in range(n)]
        dinv = [None] * n
        for j in range(n):
            s = h_ref[j * n + j, :]
            for t in range(j):
                s = s - L[j][t] * L[j][t]
            d = jax.lax.rsqrt(s)
            dinv[j] = d
            L[j][j] = s * d
            for i in range(j + 1, n):
                s = h_ref[i * n + j, :]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                L[i][j] = s * d
        for i in range(n):
            d_ref[i, :] = dinv[i]
            for j in range(n):
                l_ref[i * n + j, :] = (L[i][j] if j <= i
                                       else jnp.zeros_like(dinv[i]))

    return kernel


def _sub_kernel(n: int, k: int):
    """Substitution against a stored factor: l_ref (n*n, LANES),
    d_ref (n, LANES), rhs_ref (k, n, LANES) -> out_ref (k, n, LANES).
    The rhs-column loop is a fori_loop (one traced body), the n-recurrence
    is unrolled."""

    def kernel(l_ref, d_ref, rhs_ref, out_ref):
        L = [[l_ref[i * n + j, :] for j in range(n)] for i in range(n)]
        dinv = [d_ref[i, :] for i in range(n)]

        def body(c, _):
            b = rhs_ref[c]                        # (n, LANES)
            y = [None] * n
            for i in range(n):
                s = b[i]
                for t in range(i):
                    s = s - L[i][t] * y[t]
                y[i] = s * dinv[i]
            x = [None] * n
            for i in reversed(range(n)):
                s = y[i]
                for t in range(i + 1, n):
                    s = s - L[t][i] * x[t]
                x[i] = s * dinv[i]
            out_ref[c] = jnp.stack(x)
            return 0

        jax.lax.fori_loop(0, k, body, 0)

    return kernel


def _pad_lanes(x, B, Bp, fill=0.0):
    if Bp == B:
        return x
    pad = jnp.full(x.shape[:-1] + (Bp - B,), fill, x.dtype)
    return jnp.concatenate([x, pad], axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def chol_factor_blocked(H: jnp.ndarray, interpret: bool = False):
    """Factor batched SPD H: (B, n, n) -> (L (B, n, n), dinv (B, n)).

    Padding lanes factor the identity so rsqrt stays finite."""
    B, n, _ = H.shape
    dtype = H.dtype
    Bp = ((B + LANES - 1) // LANES) * LANES
    Ht = jnp.moveaxis(H, 0, -1).reshape(n * n, B)
    if Bp != B:
        eye = jnp.tile(jnp.eye(n, dtype=dtype).reshape(n * n, 1),
                       (1, Bp - B))
        Ht = jnp.concatenate([Ht, eye], axis=1)
    grid = (Bp // LANES,)
    L, D = pl.pallas_call(
        _factor_kernel(n),
        out_shape=[jax.ShapeDtypeStruct((n * n, Bp), dtype),
                   jax.ShapeDtypeStruct((n, Bp), dtype)],
        grid=grid,
        in_specs=[pl.BlockSpec((n * n, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((n * n, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(Ht)
    L = jnp.moveaxis(L[:, :B].reshape(n, n, B), -1, 0)
    D = jnp.moveaxis(D[:, :B], -1, 0)
    return L, D


@partial(jax.jit, static_argnames=("interpret",))
def chol_sub_blocked(L: jnp.ndarray, dinv: jnp.ndarray, rhs: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Solve (L L') X = rhs against a stored chol_factor_blocked factor.

    L: (B, n, n), dinv: (B, n), rhs: (B, n, k) -> (B, n, k)."""
    B, n, _ = L.shape
    k = rhs.shape[-1]
    dtype = L.dtype
    Bp = ((B + LANES - 1) // LANES) * LANES
    Lt = _pad_lanes(jnp.moveaxis(L, 0, -1).reshape(n * n, B), B, Bp)
    Dt = _pad_lanes(jnp.moveaxis(dinv, 0, -1), B, Bp, fill=1.0)
    # rhs -> (k, n, B)
    Rt = _pad_lanes(jnp.moveaxis(rhs, 0, -1).swapaxes(0, 1), B, Bp)
    grid = (Bp // LANES,)
    out = pl.pallas_call(
        _sub_kernel(n, k),
        out_shape=jax.ShapeDtypeStruct((k, n, Bp), dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n * n, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Lt, Dt, Rt)
    return jnp.moveaxis(out[..., :B], -1, 0).swapaxes(1, 2)


def _tri_solve(L, r):
    """Solve (L L') x = r with XLA triangular solves (plain path)."""
    vec = r.ndim == L.ndim - 1
    if vec:
        r = r[..., None]
    w = jax.scipy.linalg.solve_triangular(L, r, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), w, lower=False)
    return x[..., 0] if vec else x

# ---------------------------------------------------------------------------
# SPD factor/solve with a BATCH-ON-LANES fast path under vmap.
#
# The closed loop and the latency/sweep harnesses batch this solver by
# vmapping a single-sample wbc.solve; XLA then lowers the batched (B, n, n)
# cholesky / triangular solves with the tiny matrix dims on the vector
# lanes — the same >90%-waste pathology the planner kernels fixed
# (ops/pallas_chol.py docstring).  jax.custom_batching.custom_vmap lets the
# BATCHED trace swap in the batch-on-lanes Pallas kernels while the
# unbatched/explicitly-batched code path keeps the plain XLA lowering
# (used by the condensed planner backend, whose n = 12H is far too large
# to unroll).  Kernel routing requires: one mapped axis, n <= 64, TPU.
# ---------------------------------------------------------------------------

_KERNEL_MAX_N = 64


def _plain_factor(H):
    L = jnp.linalg.cholesky(H)
    return L, 1.0 / jnp.diagonal(L, axis1=-2, axis2=-1)


@jax.custom_batching.custom_vmap
def spd_factor(H):
    return _plain_factor(H)


@spd_factor.def_vmap
def spd_factor_vmap(axis_size, in_batched, H):
    (hb,) = in_batched
    if (hb and H.ndim == 3 and H.shape[-1] <= _KERNEL_MAX_N
            and jax.default_backend() == "tpu"):
        return chol_factor_blocked(H), (True, True)
    out = jax.vmap(_plain_factor, in_axes=(0 if hb else None,),
                   axis_size=axis_size)(H)
    return out, (True, True)


def _plain_sub(L, dinv, r):
    del dinv
    return _tri_solve(L, r)


@jax.custom_batching.custom_vmap
def _spd_sub(L, dinv, r):
    return _plain_sub(L, dinv, r)


@_spd_sub.def_vmap
def _spd_sub_vmap(axis_size, in_batched, L, dinv, r):
    lb, db, rb = in_batched
    vec = r.ndim == L.ndim - 1
    if (lb and db and rb and L.ndim == 3
            and L.shape[-1] <= _KERNEL_MAX_N
            and jax.default_backend() == "tpu"):
        rk = r[..., None] if vec else r
        out = chol_sub_blocked(L, dinv, rk)
        return (out[..., 0] if vec else out), True
    out = jax.vmap(_plain_sub,
                   in_axes=tuple(0 if b else None for b in in_batched),
                   axis_size=axis_size)(L, dinv, r)
    return out, True


def spd_solve(F, r):
    """Solve against a stored spd_factor (L, dinv) pair."""
    return _spd_sub(F[0], F[1], r)


