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


def fgmres_ir(matvec64: Callable, matvec32: Callable, b: jax.Array,
              tol: float = 1e-8, max_outer: int = 4,
              inner_tol: float = 1e-6, inner_maxiter: int = 150,
              M32: Callable | None = None) -> RefinementResult:
    """Solve A x = b to f64 accuracy with f32 inner FGMRES cycles.

    matvec64: f64 apply (only used once per outer step for the residual —
      on TPU this is the emulated-f64 path, ~1% of total work);
    matvec32: f32 apply (the hot path);
    M32: optional f32 preconditioner for the inner solves.
    """
    b64 = b.astype(jnp.float64)
    bnorm = float(jnp.linalg.norm(b64))
    if bnorm == 0:
        return RefinementResult(jnp.zeros_like(b64), 0, 0, 0.0,
                                np.array([0.0]), True)

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
        r32 = r.astype(jnp.float32)
        inner = krylov.fgmres(matvec32, r32, tol=inner_tol,
                              maxiter=inner_maxiter, M=M32)
        total_inner += int(inner.iters)
        x = x + inner.x.astype(jnp.float64)

    r = b64 - matvec64(x)
    relres = float(jnp.linalg.norm(r)) / bnorm
    hist.append(relres)
    return RefinementResult(x, max_outer, total_inner, relres,
                            np.array(hist), relres < tol)
