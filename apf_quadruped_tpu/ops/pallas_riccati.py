"""Fused Pallas TPU kernels for the Riccati interior-point MPC solver.

ops/riccati.py expresses each IPM iteration as ~7 sequential `lax.scan`s
over the horizon whose bodies are tiny batched matmuls (13x13 @ 13x12 at
batch 128).  XLA executes each scan step as separate kernel dispatches with
the matrix dims on the vector lanes — >90% of every (8,128) VPU tile wasted
and ~140 sequential dispatches per IPM iteration.  This module fuses each
sequential pass into ONE Pallas kernel with the layout flipped to BATCH ON
THE LANES (pallas_guide: lane dim = 128):

  * every small-matrix element is a (128,)-lane vector, matrices are
    (n, m, 128) VMEM tiles;
  * the horizon loop is a `fori_loop` INSIDE the kernel — zero dispatch
    overhead between knots;
  * the constant friction-pyramid Gram matrix contraction
    R_k = R + G' diag(W_k) G  =  GG @ W_k   (144x24 @ 24x128)
    runs on the MXU (GG[i*nu+j, m] = G[m,i]*G[m,j] is static data).

Three kernels per IPM iteration (driven by `solve_stage_qp_fused`, which
mirrors ops.riccati._solve_impl exactly — same Mehrotra algorithm, same
masks, same NaN quarantine — and is validated against it in
tests/test_pallas_riccati.py):

  1. rollout+adjoint: x_{k+1} = A x + B u forward; costate lam backward;
     rx = R u + B'lam + G'(mask*z); gu = G u        (kernel C)
  2. Riccati factor backward pass -> L_k (Cholesky), D_k (inv diag),
     K_k (feedback gains)                            (kernel A)
  3. vector (affine-LQR) pass: rhs = -(rx + G'vm) backward for kff,
     forward for du; gdu = G du                      (kernel B, 2x/iter:
     predictor + corrector against the same factorization — qpSWIFT's
     kktsolve_1/kktsolve_2 split, reference qpSWIFT.c:555/584)

Reference for the role: qpSWIFT's sparse LDL' KKT machinery
(dogbot_controller/src/qpSWIFT/Auxilary.c) — here the factorization is the
banded Riccati recursion matched to the MPC horizon (SURVEY.md §5.7), fully
resident in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SolverConfig
from .riccati import StageQP, StageSolution, WarmStart

LANES = 128

# Horizon-loop unroll for the RESIDENT kernel's fori_loops.  Mosaic
# legalizes only unroll=1 or FULL unroll; fully unrolling the horizon
# lets the scheduler overlap independent work across consecutive knots
# of the serial Riccati chain — measured +11% at B=1024/H=20 on v5e
# (133.3k -> 147.7k solves/s, PERF.md) for ~54 s one-time compile
# (persistent-cached).  Default: FULL on the compiled TPU path, rolled
# in interpret mode (tracing 20 unrolled factor bodies makes the CPU
# cross-check tests crawl).  APF_IPM_UNROLL=1 forces rolled everywhere;
# any other value forces full everywhere.
import os as _os

_IPM_UNROLL_ENV = _os.environ.get("APF_IPM_UNROLL", "")


def _unroll_for(H, interpret):
    if _IPM_UNROLL_ENV == "1":
        return 1
    if _IPM_UNROLL_ENV:
        return H
    return 1 if interpret else H

# v5e has 128 MiB of VMEM; the default 16 MiB scoped limit trips at
# batch >= 256 once double-buffered blocks are counted.  110 MiB leaves
# headroom for XLA's own scratch while admitting the resident kernel's
# sub=8 lane tiles with double-buffered input streams (~45 MB scratch +
# 2 x 32 MB streams at H=20).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _chol_rows(M, n):
    """Unrolled Cholesky of an (n, n, LANES) value.

    Returns (L rows as list-of-lists of (LANES,) vectors, dinv list)."""
    L = [[None] * n for _ in range(n)]
    dinv = [None] * n
    for j in range(n):
        s = M[j, j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        d = jax.lax.rsqrt(s)
        dinv[j] = d
        L[j][j] = s * d
        for i in range(j + 1, n):
            s = M[i, j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * d
    return L, dinv


def _subst_rows(L, dinv, rhs_rows, n):
    """Solve (L L') X = rhs for rhs given as a list of n row vectors
    (each (k, LANES) or (LANES,)).  Returns list of n solution rows."""
    y = [None] * n
    for i in range(n):
        s = rhs_rows[i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s * dinv[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for t in range(i + 1, n):
            s = s - L[t][i] * x[t]
        x[i] = s * dinv[i]
    return x


def _subst_packed(Lv, Dv, rhs, n):
    """Same solve, but L packed as an (n, n, LANES) value and D as
    (n, LANES) — used where the factor comes from a ref."""
    L = [[Lv[i, j] for j in range(n)] for i in range(n)]
    dinv = [Dv[i] for i in range(n)]
    rows = [rhs[i] for i in range(n)]
    return _subst_rows(L, dinv, rows, n)


# ---------------------------------------------------------------------------
# kernel C: rollout + adjoint + stationarity pieces
# ---------------------------------------------------------------------------

def _rollout_kernel(H, nx, nu, m):
    def kernel(g_ref, rmat_ref, qmat_ref, a_ref, b_ref, qlin_ref, u_ref,
               zm_ref, x0_ref, x_ref, rx_ref, gu_ref):
        dt = x0_ref.dtype                       # compute dtype (f32);
        # a_ref/b_ref may be stored bf16 (SolverConfig.stage_bf16) — cast
        # on load, all arithmetic stays f32

        # forward rollout
        def fwd(k, x):
            Ak = a_ref[k].astype(dt)
            Bk = b_ref[k].astype(dt)
            xn = jnp.sum(Ak * x[None, :, :], axis=1) \
                + jnp.sum(Bk * u_ref[k][None, :, :], axis=1)
            x_ref[k] = xn
            return xn
        jax.lax.fori_loop(0, H, fwd, x0_ref[:], unroll=False)

        # backward costates + rx; gu on the MXU.  Q and R are applied as
        # FULL matrices ((nx,nx)/(nu,nu) constants broadcast over lanes) —
        # nx=13 row-sums per knot are cheap, and this keeps the fused path
        # exact for any SPD cost the StageQP interface allows.
        def bwd(kk, lam):
            k = H - 1 - kk
            Ak = a_ref[k].astype(dt)
            Bk = b_ref[k].astype(dt)
            qx = jnp.sum(qmat_ref[:][:, :, None] * x_ref[k][None, :, :],
                         axis=1)
            lam_k = qx + qlin_ref[k] + lam
            # B' lam: (nx, nu, L) * (nx, 1, L) summed over nx
            bt_lam = jnp.sum(Bk * lam_k[:, None, :], axis=0)
            gt_zm = jax.lax.dot_general(
                g_ref[:], zm_ref[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(bt_lam.dtype)
            ru = jnp.sum(rmat_ref[:][:, :, None] * u_ref[k][None, :, :],
                         axis=1)
            rx_ref[k] = ru + bt_lam + gt_zm
            gu_ref[k] = jax.lax.dot_general(
                g_ref[:], u_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(bt_lam.dtype)
            # carry: A_k' lam_k
            return jnp.sum(Ak * lam_k[:, None, :], axis=0)
        lam0 = jnp.zeros((nx, LANES), dt)
        jax.lax.fori_loop(0, H, bwd, lam0, unroll=False)
    return kernel


# ---------------------------------------------------------------------------
# kernel A: Riccati backward matrix pass (factorization)
# ---------------------------------------------------------------------------

def _factor_kernel(H, nx, nu, m):
    def kernel(gg_ref, rmat_ref, qmat_ref, a_ref, b_ref, w_ref,
               l_ref, d_ref, k_ref, pbar_ref):
        dt = rmat_ref.dtype                      # compute dtype (f32)
        pbar_ref[:] = qmat_ref[:][:, :, None] + jnp.zeros((nx, nx, LANES), dt)

        def bwd(kk, _):
            k = H - 1 - kk
            Ak = a_ref[k].astype(dt)               # (nx, nx, L)
            Bk = b_ref[k].astype(dt)               # (nx, nu, L)
            Pb = pbar_ref[:]                       # (nx, nx, L)
            # R_k = R + reg I + GG @ W_k   (MXU: (nu*nu, m) @ (m, L))
            rk_flat = jax.lax.dot_general(
                gg_ref[:], w_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
            Rk = rk_flat.reshape(nu, nu, LANES) + rmat_ref[:][:, :, None]
            # BtP[u, x] = sum_i B[i, u] P[i, x]
            BtP = sum(Bk[i][:, None, :] * Pb[i][None, :, :]
                      for i in range(nx))          # (nu, nx, L)
            Mk = Rk + sum(BtP[:, x, :][:, None, :] * Bk[x][None, :, :]
                          for x in range(nx))      # (nu, nu, L)
            L, dinv = _chol_rows(Mk, nu)
            BtPA = sum(BtP[:, x, :][:, None, :] * Ak[x][None, :, :]
                       for x in range(nx))         # (nu, nx, L)
            Kk = _subst_rows(L, dinv, [BtPA[i] for i in range(nu)], nu)
            # AtP[j, x] = sum_i A[i, j] P[i, x]
            AtP = sum(Ak[i][:, None, :] * Pb[i][None, :, :]
                      for i in range(nx))          # (nx, nx, L)
            Pn = (qmat_ref[:][:, :, None]
                  + sum(AtP[:, x, :][:, None, :] * Ak[x][None, :, :]
                        for x in range(nx))
                  - sum(jnp.stack(Kk)[u][:, None, :] * BtPA[u][None, :, :]
                        for u in range(nu)))
            Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
            pbar_ref[:] = Pn
            l_ref[k] = jnp.stack([jnp.stack(
                [L[i][j] if j <= i else jnp.zeros((LANES,), dt)
                 for j in range(nu)]) for i in range(nu)])
            d_ref[k] = jnp.stack(dinv)
            k_ref[k] = jnp.stack(Kk)
            return 0
        jax.lax.fori_loop(0, H, bwd, 0, unroll=False)
    return kernel


# ---------------------------------------------------------------------------
# kernel B: vector (affine LQR) pass against stored factorization
# ---------------------------------------------------------------------------

def _vector_kernel(H, nx, nu, m):
    def kernel(g_ref, a_ref, b_ref, l_ref, d_ref, k_ref, rx_ref, vm_ref,
               du_ref, gdu_ref, sv_ref):
        dt = l_ref.dtype                         # compute dtype (f32)
        sv_ref[:] = jnp.zeros((nx, LANES), dt)

        def bwd(kk, _):
            k = H - 1 - kk
            sv = sv_ref[:]
            gt_vm = jax.lax.dot_general(
                g_ref[:], vm_ref[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
            rhs_k = -(rx_ref[k] + gt_vm)           # (nu, L)
            g_u = -rhs_k + jnp.sum(b_ref[k].astype(dt) * sv[:, None, :],
                                   axis=0)
            kff = _subst_packed(l_ref[k], d_ref[k], g_u, nu)
            kff_v = jnp.stack(kff)                 # (nu, L)
            Kk = k_ref[k]                          # (nu, nx, L)
            sv_ref[:] = (jnp.sum(a_ref[k].astype(dt) * sv[:, None, :],
                                 axis=0)
                         - jnp.sum(Kk * g_u[:, None, :], axis=0))
            du_ref[k] = kff_v                      # stash kff for fwd pass
            return 0
        jax.lax.fori_loop(0, H, bwd, 0, unroll=False)

        def fwd(k, dx):
            du = (-jnp.sum(k_ref[k] * dx[None, :, :], axis=1)
                  - du_ref[k])
            du_ref[k] = du
            gdu_ref[k] = jax.lax.dot_general(
                g_ref[:], du, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
            return (jnp.sum(a_ref[k].astype(dt) * dx[None, :, :], axis=1)
                    + jnp.sum(b_ref[k].astype(dt) * du[None, :, :], axis=1))
        dx0 = jnp.zeros((nx, LANES), dt)
        jax.lax.fori_loop(0, H, fwd, dx0, unroll=False)
    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers (grid over 128-lane batch blocks)
# ---------------------------------------------------------------------------

def _vspec(shape):
    nd = len(shape)

    def imap(i):
        return (0,) * (nd - 1) + (i,)
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _cspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _rollout_call(G, rmat, qmat, A, B, qlin, u, zm, x0, interpret):
    H, nx, _, Bp = A.shape
    nu = B.shape[2]
    m = G.shape[0]
    dt = x0.dtype
    grid = (Bp // LANES,)
    return pl.pallas_call(
        _rollout_kernel(H, nx, nu, m),
        grid=grid,
        in_specs=[_cspec(G.shape), _cspec(rmat.shape), _cspec(qmat.shape),
                  _vspec((H, nx, nx, LANES)), _vspec((H, nx, nu, LANES)),
                  _vspec((H, nx, LANES)), _vspec((H, nu, LANES)),
                  _vspec((H, m, LANES)), _vspec((nx, LANES))],
        out_specs=[_vspec((H, nx, LANES)), _vspec((H, nu, LANES)),
                   _vspec((H, m, LANES))],
        out_shape=[jax.ShapeDtypeStruct((H, nx, Bp), dt),
                   jax.ShapeDtypeStruct((H, nu, Bp), dt),
                   jax.ShapeDtypeStruct((H, m, Bp), dt)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(G, rmat, qmat, A, B, qlin, u, zm, x0)


def _factor_call(GG, rmat, qmat, A, B, W, interpret):
    H, nx, _, Bp = A.shape
    nu = B.shape[2]
    m = W.shape[1]
    dt = rmat.dtype
    grid = (Bp // LANES,)
    return pl.pallas_call(
        _factor_kernel(H, nx, nu, m),
        grid=grid,
        in_specs=[_cspec(GG.shape), _cspec(rmat.shape), _cspec(qmat.shape),
                  _vspec((H, nx, nx, LANES)), _vspec((H, nx, nu, LANES)),
                  _vspec((H, m, LANES))],
        out_specs=[_vspec((H, nu, nu, LANES)), _vspec((H, nu, LANES)),
                   _vspec((H, nu, nx, LANES))],
        out_shape=[jax.ShapeDtypeStruct((H, nu, nu, Bp), dt),
                   jax.ShapeDtypeStruct((H, nu, Bp), dt),
                   jax.ShapeDtypeStruct((H, nu, nx, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((nx, nx, LANES), dt)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(GG, rmat, qmat, A, B, W)


def _vector_call(G, A, B, L, D, K, rx, vm, interpret):
    H, nx, _, Bp = A.shape
    nu = B.shape[2]
    m = G.shape[0]
    dt = L.dtype
    grid = (Bp // LANES,)
    return pl.pallas_call(
        _vector_kernel(H, nx, nu, m),
        grid=grid,
        in_specs=[_cspec(G.shape),
                  _vspec((H, nx, nx, LANES)), _vspec((H, nx, nu, LANES)),
                  _vspec((H, nu, nu, LANES)), _vspec((H, nu, LANES)),
                  _vspec((H, nu, nx, LANES)),
                  _vspec((H, nu, LANES)), _vspec((H, m, LANES))],
        out_specs=[_vspec((H, nu, LANES)), _vspec((H, m, LANES))],
        out_shape=[jax.ShapeDtypeStruct((H, nu, Bp), dt),
                   jax.ShapeDtypeStruct((H, m, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((nx, LANES), dt)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(G, A, B, L, D, K, rx, vm)


# ---------------------------------------------------------------------------
# driver: the same Mehrotra IPM as ops.riccati._solve_impl, batch-last
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "interpret"))
def solve_stage_qp_fused(qp: StageQP, cfg: SolverConfig = SolverConfig(),
                         interpret: bool | None = None,
                         warm: WarmStart | None = None) -> StageSolution:
    """Drop-in replacement for ops.riccati.solve_stage_qp using the fused
    batch-on-lanes kernels.  Semantics identical (validated in tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.default_matmul_precision("highest"):
        return _solve_fused_impl(qp, cfg, interpret, warm)


def _solve_fused_impl(qp: StageQP, cfg: SolverConfig, interpret: bool,
                      warm: WarmStart | None = None) -> StageSolution:
    assert qp.Cx is None and qp.acc_rhs is None, (
        "the 3-kernel fused cross-check has no state-row / accel-row "
        "support; use solve_stage_qp_resident (planner.effective_backend "
        "reroutes)")
    dt = qp.x0.dtype
    batch = qp.x0.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    Hh = qp.A.shape[-3]
    nx = qp.A.shape[-1]
    nu = qp.B.shape[-1]
    m = qp.h.shape[-1]
    Bp = ((B + LANES - 1) // LANES) * LANES

    # ---- batch-last layouts (H, rows, cols, B) --------------------------
    def to_bl(x):
        """(.., H, *item) -> (H, *item, Bp) with zero padding."""
        x = x.reshape((B,) + x.shape[len(batch):])
        x = jnp.moveaxis(x, 0, -1)
        if Bp != B:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
            x = jnp.pad(x, pad)
        return x

    A_l = to_bl(qp.A)                           # (H, nx, nx, Bp)
    B_l = to_bl(qp.B)                           # (H, nx, nu, Bp)
    if cfg.stage_bf16:
        # HBM-traffic optimization (PERF.md roofline: the solve is
        # HBM-bound and A/B are its dominant stream, re-read by every
        # kernel pass per iteration): store the stage linearizations at
        # bf16, cast to f32 inside the kernels.  ~4e-3 relative error on
        # the DYNAMICS DATA only; all KKT algebra stays f32.
        A_l = A_l.astype(jnp.bfloat16)
        B_l = B_l.astype(jnp.bfloat16)
    q_l = to_bl(qp.qlin)                        # (H, nx, Bp)
    mask = to_bl(qp.mask)                       # (H, m, Bp)
    h_l = to_bl(jnp.broadcast_to(qp.h, batch + (Hh, m)))
    h_l = jnp.where(mask > 0, h_l, jnp.ones_like(h_l))
    x0_l = to_bl(qp.x0[..., None, :])[0]        # (nx, Bp)

    # static small matrices (full Q/R — both kernels are exact for any
    # SPD cost; reg is folded into the factor-pass R only, matching
    # ops.riccati where stationarity residuals use the UNregularized R)
    G = qp.G.astype(dt)                         # (m, nu)
    GG = jnp.einsum("mi,mj->ijm", G, G).reshape(nu * nu, m)
    reg = jnp.asarray(cfg.static_reg, dt)
    rmat = qp.R.astype(dt) + reg * jnp.eye(nu, dtype=dt)
    rmat_res = qp.R.astype(dt)
    qmat = qp.Q.astype(dt)

    m_eff = jnp.maximum(jnp.sum(mask, axis=(0, 1)), 1.0)       # (Bp,)
    min_slack = jnp.asarray(cfg.min_slack, dt)
    w_hi = jnp.asarray(cfg.w_clip, dt)
    frac = jnp.asarray(cfg.frac_to_boundary, dt)

    # ---- initial point ---------------------------------------------------
    u = jnp.zeros((Hh, nu, Bp), dt)
    r0 = -h_l
    shift = jnp.maximum(0.0, jnp.max(r0, axis=(0, 1), keepdims=True)) + 1.0
    s = -r0 + shift
    z = jnp.maximum(r0, 0.0) + 1.0
    if warm is not None:
        floor = jnp.asarray(cfg.warm_floor, dt)
        v = to_bl(warm.valid[..., None, None].astype(dt))[0, 0] > 0.5  # (Bp,)
        u = jnp.where(v, to_bl(warm.u), u)
        z = jnp.where(v, jnp.maximum(to_bl(warm.z), floor), z)
        s = jnp.where(v, jnp.maximum(to_bl(warm.s), floor), s)

    qnorm = 1.0 + jnp.sqrt(jnp.sum(q_l * q_l, axis=(0, 1)))
    hnorm = 1.0 + jnp.sqrt(jnp.sum(h_l * h_l, axis=(0, 1)))

    def steplen(s, ds, z, dz, f):
        def ratio(v, dv):
            neg = (dv < 0) & (mask > 0)
            r = jnp.where(neg, -v / jnp.where(neg, dv, -jnp.ones_like(dv)),
                          jnp.inf)
            return jnp.min(r, axis=(0, 1))
        a = jnp.minimum(ratio(s, ds), ratio(z, dz))
        return jnp.minimum(f * a, 1.0)

    def residuals(u, z):
        zm = mask * z
        x, rx, gu = _rollout_call(G, rmat_res, qmat, A_l, B_l, q_l,
                                  u, zm, x0_l, interpret)
        return x, rx, gu

    def body(carry, it):
        u, z, s, done, it_conv = carry
        x, rx, gu = residuals(u, z)
        rz = mask * gu + s - h_l
        mu = jnp.sum(s * z * mask, axis=(0, 1)) / m_eff
        res = jnp.maximum(
            jnp.sqrt(jnp.sum(rx * rx, axis=(0, 1))) / qnorm,
            jnp.sqrt(jnp.sum((rz * mask) ** 2, axis=(0, 1))) / hnorm)
        now = (res < cfg.reltol) & (mu < cfg.abstol)
        it_conv = jnp.where(now & ~done, it, it_conv)
        done = done | now

        z_safe = jnp.maximum(z, min_slack)
        s_safe = jnp.maximum(s, min_slack)
        W = jnp.clip(z_safe / s_safe, 0.0, w_hi)
        Wm = mask * W
        L, D, K = _factor_call(GG, rmat, qmat, A_l, B_l, Wm, interpret)

        def newton(rc):
            vm = mask * (W * rz + rc / s_safe)
            du, gdu = _vector_call(G, A_l, B_l, L, D, K, rx, vm, interpret)
            ds = -rz - mask * gdu
            dz = (rc - z * ds) / s_safe
            return du, dz, ds

        du_a, dz_a, ds_a = newton(-s * z)
        a_a = steplen(s, ds_a, z, dz_a, jnp.asarray(1.0, dt))
        mu_aff = jnp.sum((s + a_a * ds_a) * (z + a_a * dz_a) * mask,
                         axis=(0, 1)) / m_eff
        sigma = jnp.clip(mu_aff / jnp.maximum(mu, min_slack), 0.0,
                         1.0) ** cfg.sigma_pow
        rc = -(s * z + ds_a * dz_a - sigma * mu)
        du, dz, ds = newton(rc)

        a = steplen(s, ds, z, dz, frac)
        a = jnp.where(done, 0.0, a)
        u = u + a * du
        z = jnp.maximum(z + a * dz, min_slack)
        s = jnp.maximum(s + a * ds, min_slack)
        return (u, z, s, done, it_conv), None

    seed0 = qnorm + hnorm
    done0 = seed0 < 0.0
    it0 = cfg.iters + (0.0 * seed0).astype(jnp.int32)
    (u, z, s, done, it_conv), _ = jax.lax.scan(
        body, (u, z, s, done0, it0), jnp.arange(cfg.iters, dtype=jnp.int32))

    x, rx, gu = residuals(u, z)
    rz = mask * gu + s - h_l
    mu = jnp.sum(s * z * mask, axis=(0, 1)) / m_eff
    res = jnp.maximum(
        jnp.sqrt(jnp.sum(rx * rx, axis=(0, 1))) / qnorm,
        jnp.sqrt(jnp.sum((rz * mask) ** 2, axis=(0, 1))) / hnorm)
    conv = done | ((res < cfg.reltol) & (mu < cfg.abstol))

    # ---- back to batch-first, unpad, quarantine -------------------------
    def to_bf(v):
        v = jnp.moveaxis(v[..., :B], -1, 0)                 # (B, H, rows)
        return v.reshape(batch + v.shape[1:])

    u_bf = to_bf(u)
    x_bf = to_bf(x)
    lane_ok = (jnp.all(jnp.isfinite(u_bf), axis=(-1, -2))
               & jnp.all(jnp.isfinite(x_bf), axis=(-1, -2)))
    fix = lambda v: jnp.where(lane_ok[..., None, None], jnp.nan_to_num(v),
                              0.0)

    def scal(v):
        v = v[:B]
        return v.reshape(batch) if batch else v[0]

    return StageSolution(
        u=fix(u_bf), x=fix(x_bf), z=fix(to_bf(z)), s=fix(to_bf(s)),
        converged=scal(conv) & lane_ok, iters=scal(it_conv),
        gap=jnp.nan_to_num(scal(mu), nan=jnp.inf),
        res_norm=jnp.nan_to_num(scal(res), nan=jnp.inf))


# ---------------------------------------------------------------------------
# VMEM-resident one-kernel IPM: the ENTIRE fixed-iteration Mehrotra loop in
# a single pallas_call.  Motivation (PERF.md roofline + stage_bf16 probe):
# the 3-kernel pipeline is HBM-bound on the INTER-KERNEL traffic — L/D/K
# round-trip HBM between the factor and the two vector passes every
# iteration, and A/B re-stream 4x per iteration.  Here every per-iteration
# array lives in VMEM scratch for the whole solve; HBM sees one read of the
# problem data and one write of the solution per 128-lane block
# (~10 MB VMEM per block at H=20, well under the 96 MiB limit).
# ---------------------------------------------------------------------------

def _ipm_kernel(H, nx, nu, m, mc, iters, reltol, abstol, sigma_pow, frac,
                w_clip, min_slack, warm_floor, has_warm, sub,
                g_static=None, c_static=None, acc_static=None,
                unroll=1):
    """Whole-IPM kernel body.  Algorithm identical to the 3-kernel driver
    (and to ops.riccati._solve_impl): Mehrotra predictor-corrector,
    sigma = clamp(rho)^pow, fraction-to-boundary, converged lanes freeze.

    Additions over the 3-kernel pipeline:
      * WARM START (PERF.md lever 1): per-lane valid flag selects a
        previous solve's (u, z, s) — floored to warm_floor — over the
        cold init.  has_warm is STATIC: a cold call (warm=None, e.g.
        open-loop benchmarks) omits the three (H, ., LANES) warm input
        streams and their init selects entirely — the r4 small-batch
        regression was exactly this plumbing at <= 2 grid blocks;
      * EARLY EXIT (lever 3): once EVERY lane of the 128-lane block has
        converged, the remaining iterations' factor + two vector passes
        are skipped via pl.when (one scalar reduction per iteration);
      * optional STATE rows Cx x_{k+1} <= cx (mc > 0; towr
        BaseMotionConstraint on the production path): per-knot barrier
        Cx' diag(Wx) Cx folds into the Riccati cost-to-go via the same
        MXU Gram trick as the input rows (CC @ Wx), the costates get
        Cx' zx, and the vector passes get the state rows' rhs at the
        value gradient.  mc = 0 / has_warm = False generate
        byte-identical code to a row-free / cold kernel (every block is
        under `if mc:` / `if has_warm:`).
    """

    macc = acc_static is not None

    def kernel(*refs):
        (g_ref, gg_ref, rmatf_ref, rmatr_ref, qmat_ref, a_ref, b_ref,
         qlin_ref, mask_ref, h_ref, x0_ref) = refs[:11]
        i = 11
        if has_warm:
            wu_ref, wz_ref, ws_ref, wv_ref = refs[i:i + 4]
            i += 4
            if macc:
                wza_ref, wsa_ref = refs[i:i + 2]
                i += 2
        if mc:
            cmat_ref, ccg_ref, cx_ref, maskx_ref = refs[i:i + 4]
            i += 4
        u_ref, x_ref, z_ref, s_ref, stat_ref = refs[i:i + 5]
        i += 5
        if mc:
            zx_ref, sx_ref = refs[i:i + 2]
            i += 2
        if macc:
            za_ref, sa_ref = refs[i:i + 2]
            i += 2
        (l_ref, d_ref, k_ref, rx_ref, rz_ref, w_ref, kff_ref,
         dua_ref, dza_ref, dsa_ref, mures_ref) = refs[i:i + 11]
        i += 11
        if mc:
            wx_ref, rzx_ref, dzxa_ref, dsxa_ref = refs[i:i + 4]
            i += 4
        if macc:
            wa_ref, rza_ref, dzaa_ref, dsaa_ref = refs[i:i + 4]

        dt = x0_ref.dtype
        # Lane tile `lt`: (LANES,) for sub=1 (the flat layout: matrix
        # row dims sit on the vreg sublanes), or (sub, LANES) for sub>1,
        # which STACKS `sub` 128-LANE BATCH BLOCKS ON THE SUBLANE AXIS
        # (PERF.md lever 2): every per-lane "scalar" in the Cholesky /
        # substitution recurrences — a 1/8-occupancy (LANES,) value in
        # the flat layout — becomes a (sub, LANES) tile at sub/8
        # occupancy, and at sub=8 EVERY value in the kernel is a full
        # (8, 128) vreg.  The cost is that constant-matrix contractions
        # can no longer use the MXU (the contraction dim is not on the
        # sublanes); with a STATIC G (g_static — the friction pyramid is
        # config data) they become sparse scalar-immediate FMAs instead.
        lt = (LANES,) if sub == 1 else (sub, LANES)
        fone = jnp.ones(lt, dt)
        if has_warm:
            valid = wv_ref[0] > 0.5               # lt warm lanes

        def _static_mul(Mnp, v):
            """Static (r, c) @ v ((c,) + lt) as sparse scalar-immediate
            broadcast-FMAs — full-vreg ops, zero entries skipped at
            trace time, no MXU staging/relayouts."""
            r, c = Mnp.shape
            outs = []
            for i in range(r):
                acc = None
                for j in range(c):
                    g = float(Mnp[i][j] if isinstance(Mnp, tuple)
                              else Mnp[i, j])
                    if g == 0.0:
                        continue
                    t = g * v[j] if g != 1.0 else v[j]
                    acc = t if acc is None else acc + t
                outs.append(acc if acc is not None
                            else jnp.zeros(lt, dt))
            return jnp.stack(outs)

        def const_mul(mat_ref, v, transpose=False, static=None):
            """(r, c) constant @ v ((c,) + lt) -> (r,) + lt."""
            if static is not None and sub > 1:
                Mnp = np.asarray(static)
                return _static_mul(Mnp.T if transpose else Mnp, v)
            mat = mat_ref[:]
            dims = ((((0,) if transpose else (1,)), (0,)), ((), ()))
            return jax.lax.dot_general(
                mat, v, dims,
                preferred_element_type=jnp.float32).astype(dt)

        gg_static = None
        if g_static is not None:
            g_np = np.asarray(g_static)
            gg_static = np.einsum("mi,mj->ijm", g_np,
                                  g_np).reshape(nu * nu, m)
        cc_static = None
        if c_static is not None and mc:
            c_np = np.asarray(c_static)
            cc_static = np.einsum("mi,mj->ijm", c_np,
                                  c_np).reshape(nx * nx, mc)

        def cmat_vec(v):
            """C @ v: (mc, nx) x ((nx,) + lt) -> (mc,) + lt."""
            return const_mul(cmat_ref, v, static=c_static)

        def cmat_t_vec(v):
            """C' @ v: contract row dim -> (nx,) + lt."""
            return const_mul(cmat_ref, v, transpose=True, static=c_static)

        # ---- base-acceleration rows (StageQP.acc_rhs; macc) -----------
        # per-knot input rows +-B_k[6:12,:] u <= acc_rhs -+ A_k[6:12,12],
        # derived from the A/B streams the kernel already carries
        if macc:
            ha_const = jnp.stack(
                [jnp.full(lt, float(v), dt)
                 for v in (list(acc_static) + list(acc_static))])

            def acc_rows(Ak, Bk, u):
                """(12,) + lt signed row values [v; -v],
                v = B[6:12,:] u + A[6:12,12]."""
                bu = jnp.sum(Bk[6:12] * u[None], axis=1)
                v = bu + Ak[6:12, 12]
                return jnp.concatenate([v, -v], axis=0)

            def acc_t_vec(Bk, v12):
                """Ga' v for the signed rows: sum_d B[6+d,:] (v+ - v-)."""
                dv = v12[0:6] - v12[6:12]
                return jnp.sum(Bk[6:12] * dv[:, None], axis=0)

        # ---- init (whole-array: no per-knot loops) --------------------
        if has_warm:
            vb = valid[None, None]
            u_ref[:] = jnp.where(vb, wu_ref[:],
                                 jnp.zeros((H, nu) + lt, dt))
        else:
            u_ref[:] = jnp.zeros((H, nu) + lt, dt)
        h_all = h_ref[:]
        shift = jnp.maximum(0.0, jnp.max(-h_all, axis=(0, 1))) + 1.0
        s_cold = h_all + shift[None, None]
        z_cold = jnp.maximum(-h_all, 0.0) + 1.0
        if has_warm:
            s_ref[:] = jnp.where(vb, jnp.maximum(ws_ref[:], warm_floor),
                                 s_cold)
            z_ref[:] = jnp.where(vb, jnp.maximum(wz_ref[:], warm_floor),
                                 z_cold)
        else:
            s_ref[:] = s_cold
            z_ref[:] = z_cold

        if mc:
            # state-row init needs the ZERO-control rollout (scan parity:
            # r0x is evaluated at u = 0 even for warm lanes)
            def fwd0(k, x):
                xn = jnp.sum(a_ref[k].astype(dt) * x[None], axis=1)
                rzx_ref[k] = maskx_ref[k] * cmat_vec(xn) - cx_ref[k]
                return xn
            jax.lax.fori_loop(0, H, fwd0, x0_ref[:], unroll=False)
            r0x = rzx_ref[:]
            shiftx = jnp.maximum(0.0, jnp.max(r0x, axis=(0, 1))) + 1.0
            sx_ref[:] = -r0x + shiftx[None, None]
            zx_ref[:] = jnp.maximum(r0x, 0.0) + 1.0

        if macc:
            # accel-row init at u = 0: r0a = [off; -off] - ha
            def fwd0a(k, _):
                off = a_ref[k].astype(dt)[6:12, 12]
                rza_ref[k] = (jnp.concatenate([off, -off], axis=0)
                              - ha_const)
                return 0
            jax.lax.fori_loop(0, H, fwd0a, 0, unroll=False)
            r0a = rza_ref[:]
            shifta = jnp.maximum(0.0, jnp.max(r0a, axis=(0, 1))) + 1.0
            sa_cold = -r0a + shifta[None, None]
            za_cold = jnp.maximum(r0a, 0.0) + 1.0
            if has_warm:
                sa_ref[:] = jnp.where(vb, jnp.maximum(wsa_ref[:],
                                                      warm_floor), sa_cold)
                za_ref[:] = jnp.where(vb, jnp.maximum(wza_ref[:],
                                                      warm_floor), za_cold)
            else:
                sa_ref[:] = sa_cold
                za_ref[:] = za_cold

        qn2 = jnp.sum(qlin_ref[:] * qlin_ref[:], axis=(0, 1))
        hn2 = jnp.sum(h_all * h_all, axis=(0, 1))
        m_eff = jnp.sum(mask_ref[:], axis=(0, 1))
        if mc:
            hn2 = hn2 + jnp.sum(cx_ref[:] * cx_ref[:], axis=(0, 1))
            m_eff = m_eff + jnp.sum(maskx_ref[:], axis=(0, 1))
        if macc:
            hn2 = hn2 + float(2.0 * H * sum(v * v for v in acc_static))
            m_eff = m_eff + 12.0 * H
        qnorm = 1.0 + jnp.sqrt(qn2)
        hnorm = 1.0 + jnp.sqrt(hn2)
        m_eff = jnp.maximum(m_eff, 1.0)

        # ---- shared passes --------------------------------------------
        def rollout_residuals():
            """fwd rollout -> x_ref; bwd costates -> rx_ref,
            rz_ref, w_ref (+ rzx_ref, wx_ref); returns (mu, res)."""
            def fwd(k, x):
                Ak = a_ref[k].astype(dt)
                Bk = b_ref[k].astype(dt)
                xn = (jnp.sum(Ak * x[None], axis=1)
                      + jnp.sum(Bk * u_ref[k][None], axis=1))
                x_ref[k] = xn
                return xn
            jax.lax.fori_loop(0, H, fwd, x0_ref[:], unroll=False)

            def bwd(kk, carry):
                lam, rx2, rz2, sz = carry
                k = H - 1 - kk
                Ak = a_ref[k].astype(dt)
                Bk = b_ref[k].astype(dt)
                mk = mask_ref[k]
                zk = z_ref[k]
                sk = s_ref[k]
                qx = jnp.sum(qmat_ref[:] * x_ref[k][None], axis=1)
                lam_k = qx + qlin_ref[k] + lam
                if mc:
                    mxk = maskx_ref[k]
                    zxk = zx_ref[k]
                    sxk = sx_ref[k]
                    lam_k = lam_k + cmat_t_vec(mxk * zxk)
                    rzxk = mxk * cmat_vec(x_ref[k]) + sxk - cx_ref[k]
                    rzx_ref[k] = rzxk
                    wx_ref[k] = mxk * jnp.clip(
                        jnp.maximum(zxk, min_slack)
                        / jnp.maximum(sxk, min_slack), 0.0, w_clip)
                    rz2 = rz2 + jnp.sum((rzxk * mxk) ** 2, axis=0)
                    sz = sz + jnp.sum(sxk * zxk * mxk, axis=0)
                bt_lam = jnp.sum(Bk * lam_k[:, None], axis=0)
                gt_zm = const_mul(g_ref, mk * zk, transpose=True, static=g_static)
                ru = jnp.sum(rmatr_ref[:] * u_ref[k][None], axis=1)
                rxk = ru + bt_lam + gt_zm
                if macc:
                    zak = za_ref[k]
                    sak = sa_ref[k]
                    rzak = acc_rows(Ak, Bk, u_ref[k]) + sak - ha_const
                    rza_ref[k] = rzak
                    wa_ref[k] = jnp.clip(
                        jnp.maximum(zak, min_slack)
                        / jnp.maximum(sak, min_slack), 0.0, w_clip)
                    rxk = rxk + acc_t_vec(Bk, zak)
                    rz2 = rz2 + jnp.sum(rzak * rzak, axis=0)
                    sz = sz + jnp.sum(sak * zak, axis=0)
                rx_ref[k] = rxk
                guk = const_mul(g_ref, u_ref[k], static=g_static)
                rzk = mk * guk + sk - h_ref[k]
                rz_ref[k] = rzk
                w_ref[k] = mk * jnp.clip(
                    jnp.maximum(zk, min_slack) / jnp.maximum(sk, min_slack),
                    0.0, w_clip)
                rx2 = rx2 + jnp.sum(rxk * rxk, axis=0)
                rz2 = rz2 + jnp.sum((rzk * mk) ** 2, axis=0)
                sz = sz + jnp.sum(sk * zk * mk, axis=0)
                return (jnp.sum(Ak * lam_k[:, None], axis=0),
                        rx2, rz2, sz)
            lam0 = jnp.zeros((nx,) + lt, dt)
            _, rx2, rz2, sz = jax.lax.fori_loop(
                0, H, bwd, (lam0, 0.0 * fone, 0.0 * fone, 0.0 * fone),
                unroll=False)
            mu = sz / m_eff
            res = jnp.maximum(jnp.sqrt(rx2) / qnorm, jnp.sqrt(rz2) / hnorm)
            return mu, res

        def knot_factor(Ak, Bk, Pb, wk, wxk, wak=None):
            """One Riccati factor step at a knot: barrier fold-in,
            Cholesky of M_k, gains K_k.  Pure function of in-register
            values; returns (L rows, dinv, Kk list, Pn).  wak: optional
            accel-row barrier weights (12,) + lt — their Gram is rank-6
            in rows of B, added to M_k only (the rows touch u, not x)."""
            if mc:
                # state-row barrier: Pb += C' diag(wx) C = CC @ wx
                px_flat = const_mul(ccg_ref, wxk, static=cc_static)
                Pb = Pb + px_flat.reshape((nx, nx) + lt)
            rk_flat = const_mul(gg_ref, wk, static=gg_static)
            Rk = rk_flat.reshape((nu, nu) + lt) + rmatf_ref[:]
            BtP = sum(Bk[i][:, None] * Pb[i][None]
                      for i in range(nx))
            Mk = Rk + sum(BtP[:, xx][:, None] * Bk[xx][None]
                          for xx in range(nx))
            if macc and wak is not None:
                # M_k += sum_d (wa+_d + wa-_d) B[6+d,:] B[6+d,:]'
                da = wak[0:6] + wak[6:12]
                Mk = Mk + sum(Bk[6 + d][:, None]
                              * (da[d][None] * Bk[6 + d])[None]
                              for d in range(6))
            L, dinv = _chol_rows(Mk, nu)
            BtPA = sum(BtP[:, xx][:, None] * Ak[xx][None]
                       for xx in range(nx))
            Kk = _subst_rows(L, dinv, [BtPA[i] for i in range(nu)], nu)
            AtP = sum(Ak[i][:, None] * Pb[i][None]
                      for i in range(nx))
            Pn = (qmat_ref[:]
                  + sum(AtP[:, xx][:, None] * Ak[xx][None]
                        for xx in range(nx))
                  - sum(jnp.stack(Kk)[uu][:, None]
                        * BtPA[uu][None] for uu in range(nu)))
            Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
            return L, dinv, Kk, Pn

        def vector_bwd(rc_of_k, rcx_of_k, rca_of_k):
            """Backward half of the affine-LQR solve against the STORED
            factorization (corrector pass; the predictor's backward half
            is fused into the residual+factor sweep)."""
            def bwd(kk, sv):
                k = H - 1 - kk
                if mc:
                    rcxk = rcx_of_k(k)
                    sx_safe = jnp.maximum(sx_ref[k], min_slack)
                    vmxk = maskx_ref[k] * (wx_ref[k] * rzx_ref[k]
                                           + rcxk / sx_safe)
                    sv = sv + cmat_t_vec(vmxk)
                rck = rc_of_k(k)
                s_safe = jnp.maximum(s_ref[k], min_slack)
                vmk = mask_ref[k] * (w_ref[k] * rz_ref[k] + rck / s_safe)
                gt_vm = const_mul(g_ref, vmk, transpose=True, static=g_static)
                if macc:
                    sa_safe = jnp.maximum(sa_ref[k], min_slack)
                    vmak = (wa_ref[k] * rza_ref[k]
                            + rca_of_k(k) / sa_safe)
                    gt_vm = gt_vm + acc_t_vec(b_ref[k].astype(dt), vmak)
                rhs_k = -(rx_ref[k] + gt_vm)
                g_u = -rhs_k + jnp.sum(b_ref[k].astype(dt)
                                       * sv[:, None], axis=0)
                kff = _subst_packed(l_ref[k], d_ref[k], g_u, nu)
                kff_ref[k] = jnp.stack(kff)
                return (jnp.sum(a_ref[k].astype(dt) * sv[:, None],
                                axis=0)
                        - jnp.sum(k_ref[k] * g_u[:, None], axis=0))
            jax.lax.fori_loop(0, H, bwd, jnp.zeros((nx,) + lt, dt),
                              unroll=unroll)

        def ratio(v, dv, cur, mk):
            neg = (dv < 0) & (mk > 0)
            r = jnp.where(neg,
                          -v / jnp.where(neg, dv, -jnp.ones_like(dv)),
                          jnp.inf)
            return jnp.minimum(cur, jnp.min(r, axis=0))

        def vector_fwd(rc_of_k, rcx_of_k, rca_of_k):
            """Forward half of the affine-LQR solve: du from the gains +
            kff_ref, step components into the (dua, dza, dsa) scratch,
            returning the per-lane steplen ratio mins over all row
            sets."""
            ones_a = jnp.ones(lt, dt)

            def fwd(k, carry):
                dx, rs, rz_ = carry
                du = (-jnp.sum(k_ref[k] * dx[None], axis=1)
                      - kff_ref[k])
                dua_ref[k] = du
                gduk = const_mul(g_ref, du, static=g_static)
                rck = rc_of_k(k)
                s_safe = jnp.maximum(s_ref[k], min_slack)
                dsk = -rz_ref[k] - mask_ref[k] * gduk
                dzk = (rck - z_ref[k] * dsk) / s_safe
                dsa_ref[k] = dsk
                dza_ref[k] = dzk
                rs = ratio(s_ref[k], dsk, rs, mask_ref[k])
                rz_ = ratio(z_ref[k], dzk, rz_, mask_ref[k])
                if macc:
                    Bk = b_ref[k].astype(dt)
                    bu = jnp.sum(Bk[6:12] * du[None], axis=1)
                    dva = jnp.concatenate([bu, -bu], axis=0)
                    rcak = rca_of_k(k)
                    sa_safe = jnp.maximum(sa_ref[k], min_slack)
                    dsak = -rza_ref[k] - dva
                    dzak = (rcak - za_ref[k] * dsak) / sa_safe
                    dsaa_ref[k] = dsak
                    dzaa_ref[k] = dzak
                    rs = ratio(sa_ref[k], dsak, rs, ones_a[None])
                    rz_ = ratio(za_ref[k], dzak, rz_, ones_a[None])
                dxn = (jnp.sum(a_ref[k].astype(dt) * dx[None], axis=1)
                       + jnp.sum(b_ref[k].astype(dt) * du[None],
                                 axis=1))
                if mc:
                    rcxk = rcx_of_k(k)
                    sx_safe = jnp.maximum(sx_ref[k], min_slack)
                    dsxk = -rzx_ref[k] - maskx_ref[k] * cmat_vec(dxn)
                    dzxk = (rcxk - zx_ref[k] * dsxk) / sx_safe
                    dsxa_ref[k] = dsxk
                    dzxa_ref[k] = dzxk
                    rs = ratio(sx_ref[k], dsxk, rs, maskx_ref[k])
                    rz_ = ratio(zx_ref[k], dzxk, rz_, maskx_ref[k])
                return (dxn, rs, rz_)
            dx0 = jnp.zeros((nx,) + lt, dt)
            inf0 = jnp.full(lt, jnp.inf, dt)
            _, rs, rz_ = jax.lax.fori_loop(0, H, fwd, (dx0, inf0, inf0),
                                           unroll=unroll)
            return rs, rz_

        # ---- IPM iterations -------------------------------------------
        # NOTE: the loop carry must be f32 vectors — Mosaic cannot
        # legalize scf.for with vector<i1>/vector<i32> iter_args (observed
        # on v5e), so done/it_conv ride as floats and are compared/cast
        # at the use sites.  The heavy per-iteration work is wrapped in
        # pl.when(not all done): once every lane in the block converges,
        # remaining iterations cost one scalar check each.  mures_ref
        # carries (mu, res) out of the predicated region; on skipped
        # iterations it holds the converged values, so the carry update
        # below is a no-op exactly as if the iteration had run.
        def body(it, carry):
            done_f, it_conv = carry
            done = done_f > 0.5

            @pl.when(jnp.min(done_f) < 0.5)
            def _work():
                # stage 1: forward rollout
                def fwd(k, x):
                    xn = (jnp.sum(a_ref[k].astype(dt) * x[None],
                                  axis=1)
                          + jnp.sum(b_ref[k].astype(dt)
                                    * u_ref[k][None], axis=1))
                    x_ref[k] = xn
                    return xn
                jax.lax.fori_loop(0, H, fwd, x0_ref[:],
                                  unroll=unroll)

                # stage 2: ONE fused backward sweep = residuals/costates
                # + Riccati factor + predictor backward half.  All three
                # recursions (costate lam, cost-to-go P, value gradient
                # sv) ride one loop; A_k/B_k load once per knot instead
                # of three times, and the factor's (L, dinv, K) feed the
                # predictor solve from registers.
                def fused(kk, carry):
                    lam, Pb, sv, rx2, rz2, sz = carry
                    k = H - 1 - kk
                    Ak = a_ref[k].astype(dt)
                    Bk = b_ref[k].astype(dt)
                    mk = mask_ref[k]
                    zk = z_ref[k]
                    sk = s_ref[k]
                    # --- residuals (gradients at x_{k+1} / u_k) ---
                    qx = jnp.sum(qmat_ref[:] * x_ref[k][None], axis=1)
                    lam_k = qx + qlin_ref[k] + lam
                    if mc:
                        mxk = maskx_ref[k]
                        zxk = zx_ref[k]
                        sxk = sx_ref[k]
                        lam_k = lam_k + cmat_t_vec(mxk * zxk)
                        rzxk = mxk * cmat_vec(x_ref[k]) + sxk - cx_ref[k]
                        rzx_ref[k] = rzxk
                        wxk = mxk * jnp.clip(
                            jnp.maximum(zxk, min_slack)
                            / jnp.maximum(sxk, min_slack), 0.0, w_clip)
                        wx_ref[k] = wxk
                        rz2 = rz2 + jnp.sum((rzxk * mxk) ** 2, axis=0)
                        sz = sz + jnp.sum(sxk * zxk * mxk, axis=0)
                    else:
                        wxk = None
                    bt_lam = jnp.sum(Bk * lam_k[:, None], axis=0)
                    gt_zm = const_mul(g_ref, mk * zk, transpose=True, static=g_static)
                    ru = jnp.sum(rmatr_ref[:] * u_ref[k][None], axis=1)
                    rxk = ru + bt_lam + gt_zm
                    if macc:
                        zak = za_ref[k]
                        sak = sa_ref[k]
                        rzak = (acc_rows(Ak, Bk, u_ref[k]) + sak
                                - ha_const)
                        rza_ref[k] = rzak
                        wak = jnp.clip(
                            jnp.maximum(zak, min_slack)
                            / jnp.maximum(sak, min_slack), 0.0, w_clip)
                        wa_ref[k] = wak
                        rxk = rxk + acc_t_vec(Bk, zak)
                        rz2 = rz2 + jnp.sum(rzak * rzak, axis=0)
                        sz = sz + jnp.sum(sak * zak, axis=0)
                    else:
                        wak = None
                    rx_ref[k] = rxk
                    guk = const_mul(g_ref, u_ref[k], static=g_static)
                    rzk = mk * guk + sk - h_ref[k]
                    rz_ref[k] = rzk
                    wk = mk * jnp.clip(
                        jnp.maximum(zk, min_slack)
                        / jnp.maximum(sk, min_slack), 0.0, w_clip)
                    w_ref[k] = wk
                    rx2 = rx2 + jnp.sum(rxk * rxk, axis=0)
                    rz2 = rz2 + jnp.sum((rzk * mk) ** 2, axis=0)
                    sz = sz + jnp.sum(sk * zk * mk, axis=0)
                    lam_new = jnp.sum(Ak * lam_k[:, None], axis=0)
                    # --- factor (consumes wk/wxk/wak in registers) ---
                    L, dinv, Kk, Pn = knot_factor(Ak, Bk, Pb, wk, wxk,
                                                  wak)
                    l_ref[k] = jnp.stack([jnp.stack(
                        [L[i][j] if j <= i else jnp.zeros(lt, dt)
                         for j in range(nu)]) for i in range(nu)])
                    d_ref[k] = jnp.stack(dinv)
                    Kk_v = jnp.stack(Kk)
                    k_ref[k] = Kk_v
                    # --- predictor backward half (rc = -s z), against
                    # the factor still in registers ---
                    if mc:
                        sx_safe = jnp.maximum(sxk, min_slack)
                        vmxk = mxk * (wxk * rzxk
                                      + (-sxk * zxk) / sx_safe)
                        sv = sv + cmat_t_vec(vmxk)
                    s_safe = jnp.maximum(sk, min_slack)
                    vmk = mk * (wk * rzk + (-sk * zk) / s_safe)
                    gt_vm = const_mul(g_ref, vmk, transpose=True, static=g_static)
                    if macc:
                        sa_safe = jnp.maximum(sak, min_slack)
                        vmak = wak * rzak + (-sak * zak) / sa_safe
                        gt_vm = gt_vm + acc_t_vec(Bk, vmak)
                    rhs_k = -(rxk + gt_vm)
                    g_u = -rhs_k + jnp.sum(Bk * sv[:, None], axis=0)
                    kff = _subst_rows(L, dinv, [g_u[i] for i in range(nu)],
                                      nu)
                    kff_ref[k] = jnp.stack(kff)
                    sv_new = (jnp.sum(Ak * sv[:, None], axis=0)
                              - jnp.sum(Kk_v * g_u[:, None], axis=0))
                    return (lam_new, Pn, sv_new, rx2, rz2, sz)
                lam0 = jnp.zeros((nx,) + lt, dt)
                P0 = qmat_ref[:] + jnp.zeros((nx, nx) + lt, dt)
                sv0 = jnp.zeros((nx,) + lt, dt)
                _, _, _, rx2, rz2, sz = jax.lax.fori_loop(
                    0, H, fused,
                    (lam0, P0, sv0, 0.0 * fone, 0.0 * fone, 0.0 * fone),
                    unroll=unroll)
                mu = sz / m_eff
                res = jnp.maximum(jnp.sqrt(rx2) / qnorm,
                                  jnp.sqrt(rz2) / hnorm)
                mures_ref[0] = mu
                mures_ref[1] = res
                now_in = (res < reltol) & (mu < abstol)
                frozen = done | now_in

                # stage 3: predictor forward half
                rs, rzr = vector_fwd(
                    lambda k: -s_ref[k] * z_ref[k],
                    (lambda k: -sx_ref[k] * zx_ref[k]) if mc else None,
                    (lambda k: -sa_ref[k] * za_ref[k]) if macc else None)
                a_a = jnp.minimum(jnp.minimum(rs, rzr), 1.0)

                # stage 4: mu_aff as a whole-array reduction (no loop)
                ab = a_a[None, None]
                mu_aff = jnp.sum(
                    (s_ref[:] + ab * dsa_ref[:])
                    * (z_ref[:] + ab * dza_ref[:]) * mask_ref[:],
                    axis=(0, 1))
                if mc:
                    mu_aff = mu_aff + jnp.sum(
                        (sx_ref[:] + ab * dsxa_ref[:])
                        * (zx_ref[:] + ab * dzxa_ref[:]) * maskx_ref[:],
                        axis=(0, 1))
                if macc:
                    mu_aff = mu_aff + jnp.sum(
                        (sa_ref[:] + ab * dsaa_ref[:])
                        * (za_ref[:] + ab * dzaa_ref[:]), axis=(0, 1))
                mu_aff = mu_aff / m_eff
                sigma = jnp.clip(mu_aff / jnp.maximum(mu, min_slack),
                                 0.0, 1.0) ** sigma_pow
                sig_mu = sigma * mu

                def rc_corr(k):
                    return -(s_ref[k] * z_ref[k] + dsa_ref[k] * dza_ref[k]
                             - sig_mu[None])

                def rcx_corr(k):
                    return -(sx_ref[k] * zx_ref[k]
                             + dsxa_ref[k] * dzxa_ref[k] - sig_mu[None])

                def rca_corr(k):
                    return -(sa_ref[k] * za_ref[k]
                             + dsaa_ref[k] * dzaa_ref[k] - sig_mu[None])
                # stages 5+6: corrector solve (overwrites the predictor
                # direction scratch; rc_corr reads the predictor's
                # dsa/dza at knot k before the fwd pass overwrites them)
                vector_bwd(rc_corr, rcx_corr if mc else None,
                           rca_corr if macc else None)
                rs, rzr = vector_fwd(rc_corr, rcx_corr if mc else None,
                                     rca_corr if macc else None)
                a = jnp.minimum(frac * jnp.minimum(rs, rzr), 1.0)
                a = jnp.where(frozen, 0.0, a)

                # stage 7: whole-array step update (no loop)
                av = a[None, None]
                u_ref[:] = u_ref[:] + av * dua_ref[:]
                z_ref[:] = jnp.maximum(z_ref[:] + av * dza_ref[:],
                                       min_slack)
                s_ref[:] = jnp.maximum(s_ref[:] + av * dsa_ref[:],
                                       min_slack)
                if mc:
                    zx_ref[:] = jnp.maximum(zx_ref[:] + av * dzxa_ref[:],
                                            min_slack)
                    sx_ref[:] = jnp.maximum(sx_ref[:] + av * dsxa_ref[:],
                                            min_slack)
                if macc:
                    za_ref[:] = jnp.maximum(za_ref[:] + av * dzaa_ref[:],
                                            min_slack)
                    sa_ref[:] = jnp.maximum(sa_ref[:] + av * dsaa_ref[:],
                                            min_slack)

            mu = mures_ref[0]
            res = mures_ref[1]
            now = (res < reltol) & (mu < abstol)
            it_conv = jnp.where(now & ~done, it.astype(dt) + 0.0 * fone,
                                it_conv)
            done = done | now
            return done.astype(dt), it_conv

        mures_ref[0] = jnp.zeros(lt, dt)
        mures_ref[1] = jnp.full(lt, jnp.inf, dt)
        done0 = jnp.zeros(lt, dt)
        it0 = jnp.full(lt, iters, dt)
        done_f, it_conv = jax.lax.fori_loop(0, iters, body, (done0, it0))
        done = done_f > 0.5

        # final residuals + flags
        mu, res = rollout_residuals()
        conv = done | ((res < reltol) & (mu < abstol))
        stat_ref[0] = conv.astype(dt)
        stat_ref[1] = it_conv.astype(dt)
        stat_ref[2] = mu
        stat_ref[3] = res
        for i in range(4, 8):
            stat_ref[i] = jnp.zeros(lt, dt)
    return kernel


def _vspec_sub(shape):
    """Block spec whose trailing dims are the (sub, LANES) lane tile.

    The batch axis is laid out (sub, Bp/sub) with the grid stepping the
    LAST dim: the second-minor block dim always equals the full array
    dim (legal for any sub), and grid step i covers the sub lane-rows
    {s * Bp/sub + i*128 + l} — an arbitrary-but-consistent batch
    grouping, inverted by the output reshape."""
    nd = len(shape)

    def imap(i):
        return (0,) * (nd - 1) + (i,)
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _ipm_call(cfg, G, GG, rmatf, rmatr, qmat, A, B, qlin, mask, h, x0,
              warm3, xrows, interpret, sub, g_static=None, c_static=None,
              acc_static=None, warm_acc=None):
    """warm3: None (cold call — the kernel omits the streams) or
    (wu (H, nu, Bp), wz (H, m, Bp), ws (H, m, Bp), wv (1, Bp)).
    xrows: None or (cmat (mc, nx), ccg (nx*nx, mc), cx (H, mc, Bp),
    maskx (H, mc, Bp)) state-row data.  sub: batch blocks stacked on the
    sublane axis per grid step (Bp must divide by sub*LANES; 1 = the
    flat layout).  g_static/c_static: hashable copies of G/Cx for the
    sub>1 kernels' trace-time-sparse contractions."""
    H, nx, _, Bp = A.shape
    nu = B.shape[2]
    m = G.shape[0]
    mc = 0 if xrows is None else xrows[0].shape[0]
    has_warm = warm3 is not None
    dt = x0.dtype
    nblk = Bp // LANES
    grid = (nblk // sub,)
    kern = _ipm_kernel(H, nx, nu, m, mc, int(cfg.iters), float(cfg.reltol),
                       float(cfg.abstol), float(cfg.sigma_pow),
                       float(cfg.frac_to_boundary), float(cfg.w_clip),
                       float(cfg.min_slack), float(cfg.warm_floor),
                       has_warm, sub, g_static, c_static, acc_static,
                       _unroll_for(H, interpret))
    macc = acc_static is not None
    lt = (LANES,) if sub == 1 else (sub, LANES)

    def blocked(v):
        """(.., Bp) -> (..,) + lane layout — a free row-major reshape
        (see _vspec_sub for the sub>1 batch grouping)."""
        if sub == 1:
            return v
        return v.reshape(v.shape[:-1] + (sub, Bp // sub))

    def vs(shape_rows):
        """Block spec for a (.., rows) per-lane array."""
        if sub == 1:
            return _vspec(shape_rows + (LANES,))
        return _vspec_sub(shape_rows + (sub, LANES))

    def bconst(mat):
        """Pre-broadcast a (r, c) constant over the lane tile OUTSIDE
        the kernel (Mosaic cannot legalize an in-kernel 2D -> 4D
        broadcast reshape; <= 350 KB of VMEM per constant)."""
        ix = (Ellipsis,) + (None,) * len(lt)
        return jnp.broadcast_to(mat[ix], mat.shape + lt)

    rmatf = bconst(rmatf)
    rmatr = bconst(rmatr)
    qmat = bconst(qmat)
    in_specs = [_cspec(G.shape), _cspec(GG.shape), _cspec(rmatf.shape),
                _cspec(rmatr.shape), _cspec(qmat.shape),
                vs((H, nx, nx)), vs((H, nx, nu)), vs((H, nx)),
                vs((H, m)), vs((H, m)), vs((nx,))]
    args = [G, GG, rmatf, rmatr, qmat, blocked(A), blocked(B),
            blocked(qlin), blocked(mask), blocked(h), blocked(x0)]
    if has_warm:
        wu, wz, ws, wv = warm3
        in_specs += [vs((H, nu)), vs((H, m)), vs((H, m)), vs((1,))]
        args += [blocked(wu), blocked(wz), blocked(ws), blocked(wv)]
        if macc:
            wza, wsa = warm_acc
            in_specs += [vs((H, 12)), vs((H, 12))]
            args += [blocked(wza), blocked(wsa)]
    out_specs = [vs((H, nu)), vs((H, nx)), vs((H, m)), vs((H, m)),
                 vs((8,))]

    def oshape(rows):
        if sub == 1:
            return jax.ShapeDtypeStruct(rows + (Bp,), dt)
        return jax.ShapeDtypeStruct(rows + (sub, Bp // sub), dt)

    out_shape = [oshape((H, nu)), oshape((H, nx)), oshape((H, m)),
                 oshape((H, m)), oshape((8,))]
    if mc:
        cmat, ccg, cx, maskx = xrows
        in_specs += [_cspec(cmat.shape), _cspec(ccg.shape),
                     vs((H, mc)), vs((H, mc))]
        args += [cmat, ccg, blocked(cx), blocked(maskx)]
        out_specs += [vs((H, mc)), vs((H, mc))]
        out_shape += [oshape((H, mc)), oshape((H, mc))]
    if macc:
        out_specs += [vs((H, 12)), vs((H, 12))]
        out_shape += [oshape((H, 12)), oshape((H, 12))]
    scratch = [
        pltpu.VMEM((H, nu, nu) + lt, dt),   # l
        pltpu.VMEM((H, nu) + lt, dt),       # d
        pltpu.VMEM((H, nu, nx) + lt, dt),   # k
        pltpu.VMEM((H, nu) + lt, dt),       # rx
        pltpu.VMEM((H, m) + lt, dt),        # rz
        pltpu.VMEM((H, m) + lt, dt),        # w
        pltpu.VMEM((H, nu) + lt, dt),       # kff
        pltpu.VMEM((H, nu) + lt, dt),       # dua
        pltpu.VMEM((H, m) + lt, dt),        # dza
        pltpu.VMEM((H, m) + lt, dt),        # dsa
        pltpu.VMEM((2,) + lt, dt),          # mures (early-exit)
    ]
    if mc:
        scratch += [pltpu.VMEM((H, mc) + lt, dt),   # wx
                    pltpu.VMEM((H, mc) + lt, dt),   # rzx
                    pltpu.VMEM((H, mc) + lt, dt),   # dzxa
                    pltpu.VMEM((H, mc) + lt, dt)]   # dsxa
    if macc:
        scratch += [pltpu.VMEM((H, 12) + lt, dt),   # wa
                    pltpu.VMEM((H, 12) + lt, dt),   # rza
                    pltpu.VMEM((H, 12) + lt, dt),   # dzaa
                    pltpu.VMEM((H, 12) + lt, dt)]   # dsaa
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    if sub == 1:
        return list(outs)
    # back to flat (.., Bp) lane layouts
    return [v.reshape(v.shape[:-2] + (Bp,)) for v in outs]


@partial(jax.jit, static_argnames=("cfg", "interpret", "g_static",
                                   "c_static", "acc_static"))
def solve_stage_qp_resident(qp: StageQP, cfg: SolverConfig = SolverConfig(),
                            interpret: bool | None = None,
                            warm: WarmStart | None = None,
                            g_static=None, c_static=None,
                            acc_static=None) -> StageSolution:
    """One-kernel VMEM-resident variant of solve_stage_qp_fused: the whole
    fixed-iteration Mehrotra loop runs inside a single pallas_call, so
    problem data is read from HBM once per 128-lane block and no
    per-iteration array ever leaves VMEM.  Same algorithm, same outputs
    (validated against the scan and 3-kernel paths in
    tests/test_pallas_riccati.py).  Supports per-lane warm starting,
    all-lanes-converged early exit, and optional state rows (StageQP.Cx,
    the towr BaseMotionConstraint on the production path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if qp.acc_rhs is not None:
        assert acc_static is not None, (
            "StageQP.acc_rhs on the resident kernel needs the bounds as "
            "a hashable static (acc_static) — they are config data")
    with jax.default_matmul_precision("highest"):
        return _solve_resident_impl(qp, cfg, interpret, warm, g_static,
                                    c_static, acc_static)


def _resident_sub(B: int) -> int:
    """Batch blocks stacked on the sublane axis per grid step (the
    PERF.md "lever 2" sublane-packing EXPERIMENT — measured and
    RETIRED; default 1 = the flat layout).

    Measured on v5e (B=1024, H=20, cold, conv=1.00): flat 116.2k
    solves/s vs sub=2 57.6k, sub=4 80.9k, sub=8 103.7k (rank-3 MXU
    contractions) / 101.0k (static-G scalar-FMA contractions).  Full
    (8, 128) vreg occupancy for the Cholesky/substitution row ops does
    NOT pay for what the packing costs elsewhere: sub x larger live
    values per grid step (register pressure/spills in the unrolled
    factor), and constant-matrix contractions losing their natural MXU
    form (the contraction dim leaves the sublanes; neither per-slice
    dots, rank-3 dots, nor trace-time-sparse scalar FMAs recover it).
    The machinery stays behind APF_IPM_SUB so the experiment is
    reproducible."""
    import os

    env = os.environ.get("APF_IPM_SUB", "")
    if env:
        return max(1, int(env))
    return 1


def _solve_resident_impl(qp: StageQP, cfg: SolverConfig, interpret: bool,
                         warm: WarmStart | None = None,
                         g_static=None, c_static=None,
                         acc_static=None) -> StageSolution:
    dt = qp.x0.dtype
    batch = qp.x0.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    Hh = qp.A.shape[-3]
    nx = qp.A.shape[-1]
    nu = qp.B.shape[-1]
    m = qp.h.shape[-1]
    sub = _resident_sub(B)
    tile = sub * LANES
    Bp = ((B + tile - 1) // tile) * tile

    def to_bl(x):
        x = x.reshape((B,) + x.shape[len(batch):])
        x = jnp.moveaxis(x, 0, -1)
        if Bp != B:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
            x = jnp.pad(x, pad)
        return x

    A_l = to_bl(qp.A)
    B_l = to_bl(qp.B)
    if cfg.stage_bf16:
        A_l = A_l.astype(jnp.bfloat16)
        B_l = B_l.astype(jnp.bfloat16)
    q_l = to_bl(qp.qlin)
    mask = to_bl(qp.mask)
    h_l = to_bl(jnp.broadcast_to(qp.h, batch + (Hh, m)))
    h_l = jnp.where(mask > 0, h_l, jnp.ones_like(h_l))
    x0_l = to_bl(qp.x0[..., None, :])[0]

    G = qp.G.astype(dt)
    GG = jnp.einsum("mi,mj->ijm", G, G).reshape(nu * nu, m)
    reg = jnp.asarray(cfg.static_reg, dt)
    rmatf = qp.R.astype(dt) + reg * jnp.eye(nu, dtype=dt)
    rmatr = qp.R.astype(dt)
    qmat = qp.Q.astype(dt)

    has_x = qp.Cx is not None
    if has_x:
        mc = qp.Cx.shape[0]
        cmat = qp.Cx.astype(dt)
        ccg = jnp.einsum("mi,mj->ijm", cmat, cmat).reshape(nx * nx, mc)
        maskx = to_bl(jnp.broadcast_to(qp.mask_x, batch + (Hh, mc))
                      .astype(dt))
        cx_l = to_bl(jnp.broadcast_to(qp.cx, batch + (Hh, mc)).astype(dt))
        cx_l = jnp.where(maskx > 0, cx_l, jnp.ones_like(cx_l))
        xrows = (cmat, ccg, cx_l, maskx)
    else:
        xrows = None

    macc = qp.acc_rhs is not None
    warm_acc = None
    if warm is not None:
        # with accel rows, WarmStart.z/s carry them as the LAST 12
        # columns (the scan backend's natural layout) — split here
        wz_full = warm.z
        ws_full = warm.s
        if macc:
            warm_acc = (to_bl(wz_full[..., m:]), to_bl(ws_full[..., m:]))
            wz_full = wz_full[..., :m]
            ws_full = ws_full[..., :m]
        warm3 = (to_bl(warm.u), to_bl(wz_full), to_bl(ws_full),
                 to_bl(warm.valid[..., None, None].astype(dt))[:, 0, :])
    else:
        warm3 = None       # cold call: the kernel omits the streams

    outs = _ipm_call(cfg, G, GG, rmatf, rmatr, qmat, A_l, B_l, q_l, mask,
                     h_l, x0_l, warm3, xrows, interpret, sub, g_static,
                     c_static, acc_static if macc else None, warm_acc)
    za_o = sa_o = None
    if has_x and macc:
        u, x, z, s, stat, zx_o, sx_o, za_o, sa_o = outs
    elif has_x:
        u, x, z, s, stat, zx_o, sx_o = outs
    elif macc:
        u, x, z, s, stat, za_o, sa_o = outs
        zx_o = sx_o = None
    else:
        u, x, z, s, stat = outs
        zx_o = sx_o = None

    def to_bf(v):
        v = jnp.moveaxis(v[..., :B], -1, 0)
        return v.reshape(batch + v.shape[1:])

    u_bf = to_bf(u)
    x_bf = to_bf(x)
    lane_ok = (jnp.all(jnp.isfinite(u_bf), axis=(-1, -2))
               & jnp.all(jnp.isfinite(x_bf), axis=(-1, -2)))
    fix = lambda v: jnp.where(lane_ok[..., None, None], jnp.nan_to_num(v),
                              0.0)

    def scal(v):
        v = v[:B]
        return v.reshape(batch) if batch else v[0]

    conv = scal(stat[0]) > 0.5
    z_bf = to_bf(z)
    s_bf = to_bf(s)
    if macc:
        # append the accel rows so every backend returns (.., H, M+12)
        z_bf = jnp.concatenate([z_bf, to_bf(za_o)], axis=-1)
        s_bf = jnp.concatenate([s_bf, to_bf(sa_o)], axis=-1)
    return StageSolution(
        u=fix(u_bf), x=fix(x_bf), z=fix(z_bf), s=fix(s_bf),
        converged=conv & lane_ok,
        iters=scal(stat[1]).astype(jnp.int32),
        gap=jnp.nan_to_num(scal(stat[2]), nan=jnp.inf),
        res_norm=jnp.nan_to_num(scal(stat[3]), nan=jnp.inf),
        zx=fix(to_bf(zx_o)) if has_x else None,
        sx=fix(to_bf(sx_o)) if has_x else None)
