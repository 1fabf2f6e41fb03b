"""Device-side banded SpGEMM (ops/spgemm.py) parity: against dense products,
against the host C++ SpGEMM (native/csparse.cpp), and against the symbolic
stencil composition on the LSC products GtG/GtFG (the reference's setup
matrices, reference solve.py:246-249)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.models.multiphase import make_multiphase_operator
from mpbp_tpu.ops.dia import DIAMatrix
from mpbp_tpu.ops.spgemm import (dia_add, dia_prune, dia_spgemm,
                                 lsc_products_device)
from mpbp_tpu.ops.sparse import CSRMatrix
from mpbp_tpu.solvers.preconditioners import lsc_products


def _random_banded(m, n, offsets, rng, density=1.0):
    """DIA with given (col - row) offsets; entries outside [0, n) are zero."""
    data = np.zeros((len(offsets), m))
    for k, o in enumerate(offsets):
        i = np.arange(m)
        valid = (i + o >= 0) & (i + o < n)
        vals = rng.normal(size=m) * valid
        if density < 1.0:
            vals *= rng.random(m) < density
        data[k] = vals
    return DIAMatrix((m, n), tuple(offsets), jnp.asarray(data))


def test_dia_spgemm_general_rectangular():
    rng = np.random.default_rng(0)
    A = _random_banded(24, 32, (-3, 0, 2, 7), rng)
    B = _random_banded(32, 16, (-16, -1, 0, 4), rng)
    C = dia_spgemm(A, B)
    np.testing.assert_allclose(C.to_dense(), A.to_dense() @ B.to_dense(),
                               rtol=1e-13, atol=1e-13)


def test_dia_spgemm_periodic_square():
    rng = np.random.default_rng(1)
    N = 20
    A = DIAMatrix((N, N), (0, 1, 5, N - 2),
                  jnp.asarray(rng.normal(size=(4, N))))
    B = DIAMatrix((N, N), (0, 2, N - 1),
                  jnp.asarray(rng.normal(size=(3, N))))
    C = dia_spgemm(A, B, periodic=True)
    np.testing.assert_allclose(C.to_dense(), A.to_dense() @ B.to_dense(),
                               rtol=1e-13, atol=1e-13)


def test_dia_add_and_prune():
    rng = np.random.default_rng(2)
    A = _random_banded(16, 16, (0, 1), rng)
    B = _random_banded(16, 16, (0, 3), rng)
    C = dia_add(A, B, beta=-2.0)
    np.testing.assert_allclose(C.to_dense(),
                               A.to_dense() - 2.0 * B.to_dense(),
                               rtol=1e-13, atol=1e-13)
    # cancel a diagonal exactly, then prune it away
    D = dia_add(A, A, beta=-1.0)
    P = dia_prune(D)
    assert P.offsets == ()


def test_dia_spgemm_matches_native_cpp():
    """Device product == host C++ CSR SpGEMM on the same random operands."""
    from mpbp_tpu import native

    if not native.have_native():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    A = _random_banded(48, 48, (-5, -1, 0, 1, 9), rng, density=0.7)
    B = _random_banded(48, 48, (-2, 0, 3), rng, density=0.7)

    def to_csr(D):
        dense = D.to_dense()
        r, c = np.nonzero(dense)
        return CSRMatrix.from_coo(D.shape[0], D.shape[1], r, c, dense[r, c])

    Ac, Bc = to_csr(A), to_csr(B)
    rows, cols, vals = native.spgemm(Ac.shape[0], *Ac.host_arrays(),
                                     *Bc.host_arrays())
    dense_native = np.zeros((A.shape[0], B.shape[1]))
    np.add.at(dense_native, (rows, cols), vals)
    C = dia_spgemm(A, B)
    np.testing.assert_allclose(C.to_dense(), dense_native,
                               rtol=1e-13, atol=1e-13)


def test_lsc_products_device_matches_stencil():
    """GtG/GtFG built on device from general banded data equal the symbolic
    stencil composition (and hence the reference's dense products)."""
    op = make_multiphase_operator(8, eta_n=100.0)
    GtG_st, GtFG_st = lsc_products(op)

    def flat_dia(stencil_op):
        csr = stencil_op.to_csr(drop_tol=0.0)
        return DIAMatrix.from_csr(csr, periodic=False)

    mD, F, G = flat_dia(op.minus_D), flat_dia(op.F), flat_dia(op.G)
    GtG, GtFG = lsc_products_device(mD, F, G)
    np.testing.assert_allclose(GtG.to_dense(), GtG_st.to_dense(),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(GtFG.to_dense(), GtFG_st.to_dense(),
                               rtol=1e-12, atol=1e-10)
    # the products stay banded: bounded diagonal counts (SURVEY.md section 7
    # hard-part 3: both factors are narrow stencil matrices)
    assert len(GtG.offsets) <= 40
    assert len(GtFG.offsets) <= 80


def test_lsc_pc_from_dia_solves():
    """The general-sparse LSC path end-to-end: blocks as DIA matrices,
    setup products via the device SpGEMM, inner Krylov applies — the stiff
    n=16 system converges at the matrix-free-LSC iteration scale (the
    reference's workflow for externally-assembled operators)."""
    import jax

    from mpbp_tpu.drivers import a_matvec, pack_fields
    from mpbp_tpu.models import mms
    from mpbp_tpu.solvers import gmres as krylov
    from mpbp_tpu.solvers.preconditioners import make_lsc_pc_from_dia

    op = make_multiphase_operator(16, eta_n=100.0)
    prob = mms.variable_thn_problem(1, -1, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op.grid, prob)
    b_vec = pack_fields(op, b)

    def flat_dia(stencil_op):
        return DIAMatrix.from_csr(stencil_op.to_csr(drop_tol=0.0),
                                  periodic=False)

    M = make_lsc_pc_from_dia(flat_dia(op.minus_D), flat_dia(op.F),
                             flat_dia(op.G), inner_tol=1e-5, inner_iters=80)
    res = krylov.fgmres(a_matvec(op), b_vec, tol=1e-8, maxiter=80, M=M)
    assert bool(res.converged), float(res.relres)
    assert int(res.iters) <= 40, int(res.iters)
