"""Sharded block-Jacobi ILU(0) inner solves (parallel/block_ilu.py) — the
distributed incomplete-factorization configuration of BASELINE configs[3]
('512^2 multiphase with ILU(0)/sparse-triangular-solve inner solves ...
sharded'; reference solve.py:250-254 is the single-process original)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mpbp_tpu.models import mms
from mpbp_tpu.models.multiphase import make_multiphase_operator
from mpbp_tpu.parallel import sharding as sh
from mpbp_tpu.parallel.block_ilu import BlockJacobiILU, local_block_csr
from mpbp_tpu.solvers import gmres as krylov
from mpbp_tpu.solvers.preconditioners import ILUInner, lsc_products


@pytest.fixture(scope="module")
def op16():
    return make_multiphase_operator(16, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                    eta_s=1.0)


def test_single_shard_equals_full_ilu0(op16):
    """S=1 block-Jacobi = the full-operator ILU(0): same pattern, same
    factors, same apply."""
    mesh1 = Mesh(np.array(jax.devices()[:1]), axis_names=("x",))
    bj = BlockJacobiILU.of(op16.F, mesh1)
    full = ILUInner.ilu0_of(op16.F)
    v = jnp.asarray(np.random.default_rng(0).normal(size=4 * 16 * 16))
    np.testing.assert_allclose(np.asarray(bj.flat(v)), np.asarray(full(v)),
                               rtol=1e-12, atol=1e-12)


def test_local_block_pattern_shift_invariant(op16):
    """Every shard's band-diagonal block has the same sparsity pattern —
    the structural fact that lets the factors stack into one shard_map."""
    a = local_block_csr(op16.F, 0, 4)
    b = local_block_csr(op16.F, 2, 4)
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(np.asarray(a.indices),
                                  np.asarray(b.indices))
    assert not np.allclose(np.asarray(a.vals), np.asarray(b.vals))


def test_block_apply_matches_per_shard_reference(op16, mesh8):
    """The shard_map apply equals solving each band's local block
    independently on the host."""
    bj = BlockJacobiILU.of(op16.F, mesh8)
    rng = np.random.default_rng(1)
    n, nl = 16, 2
    v = rng.normal(size=(4, n, n))
    got = np.asarray(bj(jnp.asarray(v)))
    from mpbp_tpu.ops.ilu import ILUPreconditioner
    for s in range(8):
        csr = local_block_csr(op16.F, s, 8)
        fac = ILUPreconditioner.ilu0(csr)
        vloc = v[:, s * nl:(s + 1) * nl, :].reshape(-1)
        zloc = np.asarray(fac.solve(jnp.asarray(vloc))).reshape(4, nl, n)
        np.testing.assert_allclose(got[:, s * nl:(s + 1) * nl, :], zloc,
                                   rtol=1e-12, atol=1e-12)


def test_sharded_lsc_block_ilu_converges(mesh8):
    """Sharded LSC with block-ILU(0)-preconditioned inner Krylov converges
    the stiff n=16 problem to 1e-8 on the 8-device mesh."""
    n, eta_n = 16, 100.0
    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=eta_n,
                                  eta_s=1.0)
    prob = mms.variable_thn_problem(1.0, -1.0, 1.0, eta_n, 1.0)
    _, b = mms.fill_sol_and_rhs(op.grid, prob)
    sop = sh.shard_multiphase(op, mesh8)
    GtG, GtFG = lsc_products(sop)
    bj_F = BlockJacobiILU.of(sop.F, mesh8)
    bj_P = BlockJacobiILU.of(GtG, mesh8)
    f_mv = sh.stacked_matvec(sop.F)
    g_mv = sh.stacked_matvec(GtG)
    d_mv = sh.stacked_matvec(sop.D)
    gtfg_mv = sh.stacked_matvec(GtFG)
    gr_mv = sh.stacked_matvec(sop.G)

    def f_inner(v):
        return krylov.gmres(f_mv, v, tol=1e-6, maxiter=30, M=bj_F).x

    def p_inner(v):
        return krylov.cg(g_mv, v, tol=1e-6, maxiter=30, M=bj_P).x

    def pc(v):
        vu, vp = v[:4], v[4:]
        u_hat = f_inner(vu)
        rp = d_mv(u_hat) + vp
        x_a = p_inner(rp)
        x_p = p_inner(gtfg_mv(x_a))
        u = u_hat - f_inner(gr_mv(x_p))
        return jnp.concatenate([u, x_p])

    res = sh.sharded_solve(sop, b, mesh8, tol=1e-8, maxiter=100, pc=pc)
    assert bool(res.converged), float(res.relres)
    assert int(res.iters) <= 70, int(res.iters)
