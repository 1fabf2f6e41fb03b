"""Single-phase Stokes model family (BASELINE configs[0]-[1])."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.models.stokes import make_stokes_operator, stokes_mms
from mpbp_tpu.solvers import gmres as krylov
from mpbp_tpu.solvers.preconditioners import ILUInner
from mpbp_tpu.utils.norms import weighted_l2


def test_stokes_apply_second_order():
    errs = []
    for n in (16, 32):
        op = make_stokes_operator(n, c=1.0, d=-1.0, eta=1.0)
        u, b = stokes_mms(op.grid, 1.0, -1.0, eta=1.0)
        got = op.A.apply(u)
        errs.append(float(weighted_l2(got, b, op.grid.dx * op.grid.dy)))
    assert np.log2(errs[0] / errs[1]) > 1.85, errs


def test_stokes_constant_coeff_block_diag_solve_64():
    """BASELINE configs[0]: 64^2 constant-coefficient Stokes saddle point,
    FGMRES + block-diagonal preconditioner, tol 1e-8."""
    n = 64
    op = make_stokes_operator(n, c=1.0, d=-1.0, eta=1.0)
    u_ex, b = stokes_mms(op.grid, 1.0, -1.0, eta=1.0)

    mv = krylov.flatten_op(op.A.apply, u_ex, ("u", "v", "p"))
    b_vec = jnp.concatenate([b[f].ravel() for f in ("u", "v", "p")])
    u_vec = jnp.concatenate([u_ex[f].ravel() for f in ("u", "v", "p")])

    f_inner = ILUInner.ilut_of(op.F, fill=100, tau=1e-3)
    n2 = n * n

    def pc(v):
        zu = f_inner(v[:2 * n2])
        # pressure-mass Schur approximation: S ~ -(1/eta) Mp => scale by -eta
        zp = -v[2 * n2:]
        return jnp.concatenate([zu, zp])

    res = krylov.fgmres(mv, b_vec, tol=1e-8, maxiter=200, M=pc)
    assert bool(res.converged), (int(res.iters), float(res.relres))
    err = float(weighted_l2(res.x, u_vec, op.grid.dx * op.grid.dy))
    assert err < 5e-2, err


def test_stokes_variable_viscosity_block_tri_solve():
    """BASELINE configs[1]: variable-viscosity Stokes, block
    lower-triangular PC with mass-matrix Schur approximation."""
    import numpy as np

    n = 32
    PI = np.pi

    def eta_fn(y, x):
        return 1.0 + 0.5 * jnp.sin(2 * PI * x) * jnp.sin(2 * PI * y)

    op = make_stokes_operator(n, c=1.0, d=-1.0, eta_fn=eta_fn)
    rng = np.random.default_rng(0)
    # random consistent RHS (mean-free pressure equation)
    b_vec = jnp.asarray(rng.normal(size=3 * n * n))
    n2 = n * n
    b_vec = b_vec.at[2 * n2:].add(-jnp.mean(b_vec[2 * n2:]))

    tmpl = {f: jnp.zeros((n, n)) for f in ("u", "v", "p")}
    mv = krylov.flatten_op(op.A.apply, tmpl, ("u", "v", "p"))
    f_inner = ILUInner.ilut_of(op.F, fill=100, tau=1e-3)
    eta_j = jnp.asarray(np.asarray(op.grid.eval_at_cells(eta_fn)).ravel())

    def pc(v):
        # block lower-triangular: z_p = S~^-1 (v_p + D z_u)
        zu = f_inner(v[:2 * n2])
        du = op.D.apply({"u": zu[:n2].reshape(n, n),
                         "v": zu[n2:].reshape(n, n)})["p"].ravel()
        zp = -eta_j * (v[2 * n2:] + du)
        return jnp.concatenate([zu, zp])

    res = krylov.fgmres(mv, b_vec, tol=1e-8, maxiter=200, M=pc)
    assert bool(res.converged), (int(res.iters), float(res.relres))
