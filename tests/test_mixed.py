"""Mixed-precision iterative refinement tests."""

import jax.numpy as jnp
import numpy as np

from mpbp_tpu.models import mms
from mpbp_tpu.models.fused import make_fused_apply
from mpbp_tpu.models.multiphase import make_multiphase_operator
from mpbp_tpu.drivers import make_preconditioner, pack_fields, a_matvec
from mpbp_tpu.solvers.mixed import fgmres_ir


def test_ir_reaches_f64_tolerance():
    """f32 inner solves + f64 residuals reach 1e-8 on the n=16 stiff system
    (the reference's tolerance, solve.py:285) — the TPU-native path to f64
    parity without f64 hot loops."""
    n = 16
    op64 = make_multiphase_operator(n, eta_n=100.0, dtype=jnp.float64)
    op32 = make_multiphase_operator(n, eta_n=100.0, dtype=jnp.float32)
    prob = mms.variable_thn_problem(1, -1, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op64.grid, prob)
    b_vec = pack_fields(op64, b)

    mv64 = a_matvec(op64)
    mv32 = a_matvec(op32)
    M32 = make_preconditioner(op32, "lsc_ilut", dtype=jnp.float32)

    res = fgmres_ir(mv64, mv32, b_vec, tol=1e-8, max_outer=4,
                    inner_tol=1e-5, inner_maxiter=120, M32=M32)
    assert res.converged, (res.relres, res.history)
    assert res.relres < 1e-8
    # refinement actually contracts between outer steps
    assert res.history[1] < 1e-4 * res.history[0]


def test_ir_single_precision_alone_insufficient():
    """Sanity: one f32 solve does NOT reach 1e-8 true f64 residual — the
    refinement is load-bearing."""
    n = 16
    op64 = make_multiphase_operator(n, eta_n=100.0, dtype=jnp.float64)
    op32 = make_multiphase_operator(n, eta_n=100.0, dtype=jnp.float32)
    prob = mms.variable_thn_problem(1, -1, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op64.grid, prob)
    b_vec = pack_fields(op64, b)
    mv64 = a_matvec(op64)
    mv32 = a_matvec(op32)
    M32 = make_preconditioner(op32, "lsc_ilut", dtype=jnp.float32)

    res = fgmres_ir(mv64, mv32, b_vec, tol=1e-8, max_outer=1,
                    inner_tol=1e-6, inner_maxiter=150, M32=M32)
    assert not res.converged
    assert res.relres > 1e-8


def test_ir_equilibrated_converges_at_n64():
    """At n>=64 the raw inter-block scaling (~eta/dx^2 momentum vs ~n
    divergence rows) stalls plain f32 IR; block equilibration restores the
    contraction and reaches 1e-8 (solvers/mixed.py block_scales)."""
    from mpbp_tpu.solvers.mixed import block_scales

    n = 64
    op64 = make_multiphase_operator(n, eta_n=100.0, dtype=jnp.float64)
    op32 = make_multiphase_operator(n, eta_n=100.0, dtype=jnp.float32)
    prob = mms.variable_thn_problem(1, -1, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op64.grid, prob)
    b_vec = pack_fields(op64, b)
    mv64 = a_matvec(op64)
    mv32 = a_matvec(op32)
    M32 = make_preconditioner(op32, "lsc_mg_full", dtype=jnp.float32,
                              inner_tol=1e-4, inner_iters=40)

    plain = fgmres_ir(mv64, mv32, b_vec, tol=1e-8, max_outer=5,
                      inner_tol=1e-6, inner_maxiter=40, M32=M32)
    scaled = fgmres_ir(mv64, mv32, b_vec, tol=1e-8, max_outer=5,
                       inner_tol=1e-6, inner_maxiter=40, M32=M32,
                       scale=block_scales(op64))
    assert scaled.converged, (scaled.relres, scaled.history)
    assert scaled.relres < 1e-8
    # Equilibration must never hurt: converge in no more outer steps than
    # the plain path. (Final relres values are NOT comparable between the
    # two runs — each stops at its first sub-tol residual, so the run that
    # stops later shows a smaller number; only the step count is the stable
    # contract. The original 100x-gap claim was platform- and PC-quality-
    # dependent.)
    assert scaled.outer_iters <= plain.outer_iters
    if not plain.converged:
        assert scaled.relres <= plain.relres * 1.5
