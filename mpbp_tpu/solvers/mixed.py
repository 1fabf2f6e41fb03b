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


# Stable-identity cache for the equilibrated operator closures. A fresh
# lambda per fgmres_ir call would miss BOTH the hoist cache and the jitted
# _fgmres_cycle cache (they key on callable identity), forcing a full host
# retrace + relowering of the inner solve every warm run (seconds at 512^2,
# measured r5). Keyed by the caller's stable matvec/M objects; the id(scale)
# entry is guarded by an `is` check against id reuse.
_SCALED_CACHE: dict = {}


def _scaled_ops(matvec32: Callable, M32: Callable | None, scale):
    if scale is None:
        return matvec32, M32
    key = (matvec32, M32, id(scale))
    hit = _SCALED_CACHE.get(key)
    if hit is not None and hit[0] is scale:
        return hit[1], hit[2]
    d32 = scale.astype(jnp.float32)
    mv32 = lambda v: d32 * matvec32(d32 * v)              # noqa: E731
    Ms = None if M32 is None else (lambda v: M32(v / d32) / d32)
    if len(_SCALED_CACHE) >= 16:
        _SCALED_CACHE.pop(next(iter(_SCALED_CACHE)))
    _SCALED_CACHE[key] = (scale, mv32, Ms)
    return mv32, Ms


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("matvec",))
def _ir_outer_step(matvec, b, x, scale, mv_consts=()):
    """One f64 outer refinement step's device work as a SINGLE jitted call:
    r = b - A x (f64), its norm, and the equilibrated f32 inner rhs. The
    eager form of this line dispatched ~100 individual relay ops per outer
    step (VERDICT r4 weak #1)."""
    r = b - matvec(x, *mv_consts)
    rnorm = jnp.sqrt(jnp.sum(r * r))
    rs = r if scale is None else scale * r
    return rnorm, rs.astype(jnp.float32)


@jax.jit
def _ir_update(x, corr32, scale):
    corr = corr32.astype(jnp.float64)
    if scale is not None:
        corr = scale * corr
    return x + corr


def fgmres_ir(matvec64: Callable, matvec32: Callable, b: jax.Array,
              tol: float = 1e-8, max_outer: int = 4,
              inner_tol: float = 1e-6, inner_maxiter: int = 150,
              M32: Callable | None = None,
              scale: jax.Array | None = None,
              orthog: str = "cgs2",
              inner_restart: int | None = None) -> RefinementResult:
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
    inner_restart: restart length for the inner f32 cycles — bounds the f32
      V/Z basis memory AND the per-iteration orthogonalization traffic
      (with the chunked projections this mostly matters for memory).
    """
    from mpbp_tpu.utils.hoist import to_accelerator

    b64 = to_accelerator(b.astype(jnp.float64))
    mv64, mv64c = krylov._hoist(matvec64, b64)
    scale64 = None if scale is None else to_accelerator(
        scale.astype(jnp.float64))
    x = jnp.zeros_like(b64)
    bnorm = float(jnp.sqrt(jnp.sum(b64 * b64)))
    if bnorm == 0:
        return RefinementResult(jnp.zeros_like(b64), 0, 0, 0.0,
                                np.array([0.0]), True)

    mv32, Ms = _scaled_ops(matvec32, M32, scale)

    hist = []
    total_inner = 0
    for k in range(max_outer):
        rnorm, r32 = _ir_outer_step(mv64, b64, x, scale64, tuple(mv64c))
        relres = float(rnorm) / bnorm
        hist.append(relres)
        if relres < tol:
            return RefinementResult(x, k, total_inner, relres,
                                    np.array(hist), True)
        inner = krylov.fgmres(mv32, r32, tol=inner_tol,
                              maxiter=inner_maxiter, M=Ms, orthog=orthog,
                              restart=inner_restart)
        total_inner += int(krylov._host_scalar(inner.iters))
        x = _ir_update(x, inner.x, scale64)

    rnorm, _ = _ir_outer_step(mv64, b64, x, scale64, tuple(mv64c))
    relres = float(rnorm) / bnorm
    hist.append(relres)
    return RefinementResult(x, max_outer, total_inner, relres,
                            np.array(hist), relres < tol)
