"""Mixed-precision iterative refinement around the f32 Krylov solver.

TPU matrix units are fast in f32/bf16 and emulate f64 slowly. The reference
needs 1e-8 relative residuals (reference solve.py:285 tol), beyond single
precision's reach in one solve. The classical fix — and the SURVEY.md design
stance — is iterative refinement: compute residuals in f64 (cheap: one
matvec + axpy per outer step), correct with an f32 FGMRES solve. Each outer
step multiplies the achievable residual by the f32 solve's relative accuracy
(~1e-5), so 2-3 steps reach 1e-8 with >95% of the work done in f32.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpbp_tpu.solvers import gmres as krylov


class RefinementResult(NamedTuple):
    x: jax.Array               # f64 solution
    outer_iters: int
    total_inner_iters: int
    relres: float              # true f64 relative residual
    history: np.ndarray        # f64 relres after each outer step
    converged: bool


def block_scales(op) -> jax.Array:
    """Two-sided block equilibration for the saddle-point system.

    The raw system mixes momentum rows of magnitude ~eta_max/dx^2 with
    divergence rows of magnitude ~1/dx — a ~1e5 inter-block imbalance at
    n=128 that pushes kappa(A) past what f32 Krylov can contract against
    (measured: the unscaled f32 solve stalls at relres ~9e-5 where the
    scaled one reaches 1e-6). Scaling velocities by dx/sqrt(eta_max) and
    pressure by sqrt(eta_max) makes every block O(1):

        F' = s_u^2 F ~ O(1),  G' = s_u s_p G ~ O(1),  D' likewise.

    Returns the flat (5 n^2,) scaling vector d; the scaled system is
    (D A D) y = D b with x = D y (the scaling is symmetric two-sided).
    """
    n2 = op.grid.n * op.grid.n
    eta_max = max(float(op.params["eta_n"]), float(op.params["eta_s"]))
    su = op.grid.dx / np.sqrt(eta_max)
    sp = np.sqrt(eta_max)
    return jnp.concatenate([jnp.full(4 * n2, su), jnp.full(n2, sp)])


def fgmres_ir(matvec64: Callable, matvec32: Callable, b: jax.Array,
              tol: float = 1e-8, max_outer: int = 4,
              inner_tol: float = 1e-6, inner_maxiter: int = 150,
              M32: Callable | None = None,
              scale: jax.Array | None = None,
              orthog: str = "cgs2") -> RefinementResult:
    """Solve A x = b to f64 accuracy with f32 inner FGMRES cycles.

    matvec64: f64 apply (only used once per outer step for the residual —
      on TPU this is the emulated-f64 path, ~1% of total work);
    matvec32: f32 apply of the RAW (unscaled) operator (the hot path);
    M32: optional f32 preconditioner for the RAW operator;
    scale: optional symmetric two-sided equilibration vector d (see
      `block_scales`). The f64 outer loop stays in natural units; each inner
      f32 cycle solves the equilibrated system (D A D) y = D r and the
      correction is x += D y. Without it, badly inter-block-scaled systems
      make the f32 contraction factor ~1 and IR stalls.
    """
    b64 = b.astype(jnp.float64)
    bnorm = float(jnp.linalg.norm(b64))
    if bnorm == 0:
        return RefinementResult(jnp.zeros_like(b64), 0, 0, 0.0,
                                np.array([0.0]), True)

    if scale is not None:
        d32 = scale.astype(jnp.float32)
        mv32 = lambda v: d32 * matvec32(d32 * v)          # noqa: E731
        Ms = (None if M32 is None
              else (lambda v: M32(v / d32) / d32))
    else:
        mv32, Ms = matvec32, M32

    x = jnp.zeros_like(b64)
    hist = []
    total_inner = 0
    for k in range(max_outer):
        r = b64 - matvec64(x)
        relres = float(jnp.linalg.norm(r)) / bnorm
        hist.append(relres)
        if relres < tol:
            return RefinementResult(x, k, total_inner, relres,
                                    np.array(hist), True)
        if scale is not None:
            r32 = (scale * r).astype(jnp.float32)
        else:
            r32 = r.astype(jnp.float32)
        inner = krylov.fgmres(mv32, r32, tol=inner_tol,
                              maxiter=inner_maxiter, M=Ms, orthog=orthog)
        total_inner += int(inner.iters)
        corr = inner.x.astype(jnp.float64)
        if scale is not None:
            corr = scale.astype(jnp.float64) * corr
        x = x + corr

    r = b64 - matvec64(x)
    relres = float(jnp.linalg.norm(r)) / bnorm
    hist.append(relres)
    return RefinementResult(x, max_outer, total_inner, relres,
                            np.array(hist), relres < tol)
