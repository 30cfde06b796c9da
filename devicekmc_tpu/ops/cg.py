"""Jacobi-preconditioned conjugate gradient, jit-compatible.

Replaces the reference's cuSPARSE/cuBLAS CG implementations
(solve_sparse_CG / solve_sparse_CG_Jacobi, src/iterative_solvers_gpu.cu:309-631).
The reference applies symmetric diagonal scaling D^-1/2 A D^-1/2; here we use
the mathematically equivalent preconditioned-CG formulation with M = diag(A),
which avoids materialising a scaled operator and keeps the matvec generic
(matrix-free operators welcome).

The loop is a ``lax.while_loop`` so the whole solve stays on-device inside a
jitted superstep; iteration count is returned for observability (the
reference logs it at src/iterative_solvers_gpu.cu:456).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

#: env-gated per-outer-round diagnostics (rel residual, inner iterations)
_CG_DEBUG = bool(os.environ.get("DKMC_CG_DEBUG"))


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray       # int32
    residual: jnp.ndarray    # final ||r||
    rel0: jnp.ndarray = jnp.nan   # initial relative residual ||r0||/||b||
                                  # (cg_solve_mixed only; solve-hardness
                                  # observability for the deflation gate)
    converged: jnp.ndarray = True  # final residual met the tolerance (the
                                   # explicit signal chunked-dispatch drivers
                                   # must loop on — iteration counts alone
                                   # are ambiguous when max_outer binds)


def cg_solve(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    diag: Optional[jnp.ndarray] = None,
    tol: float = 1e-12,
    maxiter: int = 50000,
    criterion: str = "r",
    precond: Optional[Callable] = None,
) -> CGResult:
    """Solve A x = b for SPD A with preconditioned CG.

    Args:
      matvec: function x -> A @ x.
      b: right-hand side.
      x0: warm start (reference warm-starts from the previous step's
        solution, src/iterative_solvers_gpu.cu:339-344); defaults to zeros.
      diag: diagonal of A for Jacobi preconditioning; if None, identity.
      tol: relative tolerance.
      maxiter: iteration cap.
      criterion: "r"   — plain residual: ||r|| <= tol*||b||;
                 "pre" — preconditioned (Jacobi-scaled) residual:
                 sqrt(r'M^-1 r) <= tol*sqrt(b'M^-1 b).  Use "pre" for
                 matrices whose row scales span many decades (e.g. the
                 transport matrix with its loop_G ~ 1e7 penalty rows vs
                 ~1e-14 tunnelling rows) — this matches the reference's
                 stopping rule on the symmetric-scaled system
                 (src/iterative_solvers_gpu.cu:309-480).
      precond: optional SPD preconditioner application r -> M^-1 r;
        overrides the Jacobi ``diag`` preconditioner when given (used by
        the transport solver's two-level coarse correction).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if diag is None:
        minv = jnp.ones_like(b)
    else:
        minv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    apply_M = precond if precond is not None else (lambda r: minv * r)

    if criterion == "pre":
        ref = jnp.sqrt(jnp.dot(b, apply_M(b)))
    else:
        ref = jnp.sqrt(jnp.dot(b, b))
    thresh = tol * jnp.where(ref > 0, ref, 1.0)
    thresh2 = thresh * thresh

    def measure2(r, rz):
        return rz if criterion == "pre" else jnp.dot(r, r)

    r0 = b - matvec(x0)
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.dot(r0, z0)

    def cond(carry):
        _, r, _, rz, it = carry
        return jnp.logical_and(measure2(r, rz) > thresh2, it < maxiter)

    def body(carry):
        x, r, p, rz, it = carry
        ap = matvec(p)
        denom = jnp.dot(p, ap)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = apply_M(r)
        rz_new = jnp.dot(r, z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, r, _, rz, iters = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32))
    )
    final2 = measure2(r, rz)
    return CGResult(
        x=x, iters=iters, residual=jnp.sqrt(jnp.abs(final2)),
        converged=final2 <= thresh2,
    )


def cg_solve_mixed(
    matvec_hi: Callable,
    matvec_lo: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    diag: Optional[jnp.ndarray] = None,
    tol: float = 1e-10,
    inner_tol: float = 1e-4,
    maxiter: int = 50000,
    max_outer: int = 40,
    inner_maxiter: int = 300,
    inner_precond: Optional[Callable] = None,
    inner_start: Optional[Callable] = None,
    inner_gate_rel: Optional[float] = None,
) -> CGResult:
    """Mixed-precision CG with iterative refinement.

    TPUs have no native f64: every f64 op is software-emulated (~10x).  The
    classic fix is iterative refinement — run the CG iterations in f32
    (``matvec_lo`` on f32 operands) and correct with f64 residuals
    (``matvec_hi``), which restores f64-level accuracy at f32 iteration
    cost.  On ill-conditioned conductance networks (high_G/low_G = 1e8,
    reference src/input_parser.cpp:392-393) plain f32 CG leaves O(1e-2)
    field errors; refinement drives them to the f64 floor.

    b/x0/diag are f64 (or the working precision); the result is f64.

    ``inner_precond`` / ``inner_start``: optional preconditioner
    application and start-vector map for the inner f32 solves (used by the
    A-DEF2 deflated transport CG, which requires the special start vector
    Z E^-1 Z^T b for stability).  Any inexactness in the inner solve only
    costs iterations — the outer f64 residuals are computed with the true
    operator, so the refined answer is exact.

    With ``inner_gate_rel`` set, both callables take ``(r, gate)`` where
    ``gate`` is a traced bool: True when the refinement round's relative
    residual ||r||/||b|| exceeds the threshold (a "hard" round that wants
    the extra machinery), False on easy warm rounds.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    lo = jnp.float32
    diag_lo = None if diag is None else diag.astype(lo)

    bnorm = jnp.sqrt(jnp.dot(b, b))
    thresh = tol * jnp.where(bnorm > 0, bnorm, 1.0)

    def outer_cond(carry):
        _, r, it_out, it_in = carry
        return jnp.logical_and(
            jnp.sqrt(jnp.dot(r, r)) > thresh,
            jnp.logical_and(it_out < max_outer, it_in < maxiter),
        )

    def outer_body(carry):
        x, r, it_out, it_in = carry
        # scale the residual to O(1): f32 CG underflows on tiny residuals
        rnorm = jnp.sqrt(jnp.dot(r, r))
        scale = jnp.where(rnorm > 0, rnorm, 1.0)
        b_in = (r / scale).astype(lo)
        pre, start = inner_precond, inner_start
        if inner_gate_rel is not None:
            gate = rnorm > inner_gate_rel * jnp.where(bnorm > 0, bnorm, 1.0)
            if inner_precond is not None:
                pre = lambda rr: inner_precond(rr, gate)
            if inner_start is not None:
                start = lambda bb: inner_start(bb, gate)
        # ADAPTIVE inner tolerance: the round only needs to bring ||r||
        # below thresh, i.e. a reduction of thresh/rnorm — near-converged
        # warm rounds (rel0 barely above tol) previously paid ~90 smooth-
        # tail iterations chasing the fixed 1e-5 reduction when a ~3x one
        # sufficed (measured on the crossbar's charge-flip re-solves).
        # 0.1 safety margin (the final residual lands ~10x BELOW thresh,
        # keeping the documented solution-error envelope: a 0.5 margin let
        # it sit exactly at thresh and grew the measured I_macro error vs
        # the direct solve 4.7e-5 -> 8.7e-4); capped at 0.05 so every
        # round still contracts >= 20x.  The outer f64 residual
        # re-verifies, so correctness is criterion-bound either way —
        # only the iteration split between rounds changes.
        needed = thresh / jnp.maximum(rnorm, 1e-300)
        tol_round = jnp.clip(0.1 * needed, inner_tol, 0.05).astype(lo)
        inner = cg_solve(
            matvec_lo,
            b_in,
            x0=start(b_in) if start is not None else None,
            diag=diag_lo,
            tol=tol_round,
            maxiter=inner_maxiter,   # bounded: f32 CG stagnates at its
                                     # precision floor; refinement outer
                                     # iterations do the rest
            precond=pre,
        )
        x = x + inner.x.astype(b.dtype) * scale
        r = b - matvec_hi(x)
        if _CG_DEBUG:
            jax.debug.print(
                "cg_mixed outer {o}: rel={rel:.3e} inner_iters={it}",
                o=it_out, rel=rnorm / jnp.where(bnorm > 0, bnorm, 1.0),
                it=inner.iters,
            )
        return (x, r, it_out + 1, it_in + inner.iters)

    r0 = b - matvec_hi(x0)
    x, r, outer_iters, inner_iters = jax.lax.while_loop(
        outer_cond,
        outer_body,
        (x0, r0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
    )
    rnorm = jnp.sqrt(jnp.dot(r, r))
    return CGResult(
        x=x, iters=inner_iters, residual=rnorm,
        rel0=jnp.sqrt(jnp.dot(r0, r0)) / jnp.where(bnorm > 0, bnorm, 1.0),
        converged=rnorm <= thresh,
    )


def _cholesky_small(A):
    """In-place Cholesky of a small SPD matrix via a fori_loop over columns
    — works in f64 on TPU, where jnp.linalg LU/Cholesky is f32-only.
    Column j reads the finished columns < j (zero above their diagonal) and
    the raw column j of A."""
    n = A.shape[0]
    idx = jnp.arange(n)

    def col(j, M):
        lrow_j = jnp.where(idx < j, M[j, :], 0.0)       # L[j, :j]
        s = M[:, j] - M @ lrow_j                        # A[:,j] - sum L L^T
        d = jnp.sqrt(jnp.maximum(s[j], 1e-300))
        return M.at[:, j].set(jnp.where(idx >= j, s / d, 0.0))

    return jax.lax.fori_loop(0, n, col, A)


def _cholesky_solve_identity(L):
    """A^-1 = L^-T L^-1 for a small lower-triangular L (multi-RHS forward +
    backward substitution with fori_loops)."""
    n = L.shape[0]
    idx = jnp.arange(n)
    eye = jnp.eye(n, dtype=L.dtype)

    def fwd(j, Y):
        y = (eye[j, :] - L[j, :] @ Y) / L[j, j]
        return Y.at[j, :].set(y)

    Y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(L))

    def bwd(k, X):
        j = n - 1 - k
        x = (Y[j, :] - L[:, j] @ X) / L[j, j]
        return X.at[j, :].set(x)

    return jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(L))


def invert_coarse(A_c, dtype):
    """Invert the small SPD coarse matrix in full working precision.

    An earlier version used the f32 LU (TPU has no f64 LU) plus one Newton
    step — but kappa(A_c) ~ 1e10 (contact slabs' high_G couplings vs the
    low_G oxide chain) makes ||I - A X0|| > 1, so Newton *diverges* and the
    corrupted inverse injected large errors into warm starts (measured:
    10 -> 259 CG iterations).  A hand-rolled f64 Cholesky costs O(K^3) on a
    ~24^2 matrix — negligible — and is accurate to ~kappa*eps_f64 ~ 1e-6.

    The stabilising ridge is applied AFTER the symmetric diagonal scaling
    (i.e. relative to each row's own scale): a ridge relative to the
    GLOBAL max entry would be ~1e12 times larger than the low-conductance
    oxide rows — the smooth subspace deflation exists to resolve — and
    corrupt them outright.  Rows with zero diagonal (empty aggregates) get
    a unit diagonal; their correction is annihilated by Z^T anyway."""
    dc = jnp.sqrt(jnp.abs(jnp.diagonal(A_c)))
    dc = jnp.where(dc > 0, dc, 1.0)
    A_cs = A_c / dc[:, None] / dc[None, :]
    A_cs = A_cs + jnp.eye(A_c.shape[0], dtype=dtype) * 1e-12
    L = _cholesky_small(A_cs)
    X = _cholesky_solve_identity(L)
    return X / dc[None, :] / dc[:, None]
