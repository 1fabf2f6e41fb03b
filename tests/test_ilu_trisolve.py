"""ILU factorization + level-scheduled triangular solve tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu import native
from mpbp_tpu.ops.ilu import ILUPreconditioner
from mpbp_tpu.ops.sparse import CSRMatrix
from mpbp_tpu.ops.trisolve import LevelTriSolve


def random_spdish(n, seed=0, density=0.08):
    rng = np.random.default_rng(seed)
    A = np.diag(rng.uniform(3, 5, n))
    k = int(n * n * density)
    i, j = rng.integers(0, n, k), rng.integers(0, n, k)
    A[i, j] += rng.normal(size=k) * 0.3
    return A


def to_csr(A, tol=0.0):
    rows, cols = np.nonzero(np.abs(A) > tol)
    return CSRMatrix.from_coo(*A.shape, rows, cols, A[rows, cols])


def test_level_schedule_lower():
    # chain 0 <- 1 <- 2: levels 0,1,2
    indptr = np.array([0, 0, 1, 2])
    indices = np.array([0, 1], dtype=np.int32)
    levels, nlev = native.level_schedule(indptr, indices, is_upper=False)
    assert list(levels) == [0, 1, 2]
    assert nlev == 3


def test_level_schedule_diagonal_only():
    indptr = np.zeros(6, np.int64)
    levels, nlev = native.level_schedule(indptr, np.array([], np.int32), False)
    assert nlev == 1
    assert list(levels) == [0] * 5


def test_level_trisolve_matches_sequential_lower():
    rng = np.random.default_rng(3)
    n = 40
    L = np.tril(rng.normal(size=(n, n)), -1) * 0.2
    mask = rng.random((n, n)) < 0.8
    L[mask] = 0.0
    b = rng.normal(size=n)
    # strict lower + unit diag
    rows, cols = np.nonzero(L)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    order = np.lexsort((cols, rows))
    plan = LevelTriSolve.from_csr(indptr, cols[order], L[rows, cols][order],
                                  is_upper=False)
    x = np.asarray(plan.solve(jnp.asarray(b)))
    x_ref = np.linalg.solve(L + np.eye(n), b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-12)


def test_level_trisolve_upper_with_diag():
    rng = np.random.default_rng(4)
    n = 35
    U = np.triu(rng.normal(size=(n, n)), 1) * 0.2
    mask = rng.random((n, n)) < 0.8
    U[mask] = 0.0
    diag = rng.uniform(1, 2, n)
    rows, cols = np.nonzero(U)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    order = np.lexsort((cols, rows))
    plan = LevelTriSolve.from_csr(indptr, cols[order], U[rows, cols][order],
                                  is_upper=True, diag_vals=diag)
    b = rng.normal(size=n)
    x = np.asarray(plan.solve(jnp.asarray(b)))
    x_ref = np.linalg.solve(U + np.diag(diag), b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-12)


def test_ilut_exact_with_no_dropping():
    A = random_spdish(60, seed=5)
    csr = to_csr(A)
    ilu = ILUPreconditioner.ilut(csr, fill=1000, tau=0.0)
    rng = np.random.default_rng(6)
    b = rng.normal(size=60)
    x = np.asarray(ilu.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9, atol=1e-11)


def test_ilut_preconditions_gmres():
    from mpbp_tpu.solvers import gmres as krylov
    A = random_spdish(80, seed=7, density=0.15)
    csr = to_csr(A)
    ilu = ILUPreconditioner.ilut(csr, fill=10, tau=1e-2)
    Aj = jnp.asarray(A)
    b = jnp.asarray(np.random.default_rng(8).normal(size=80))
    plain = krylov.fgmres(lambda v: Aj @ v, b, tol=1e-10, maxiter=80)
    pcd = krylov.fgmres(lambda v: Aj @ v, b, tol=1e-10, maxiter=80,
                        M=ilu.solve)
    assert int(pcd.iters) < int(plain.iters)
    np.testing.assert_allclose(np.asarray(pcd.x),
                               np.linalg.solve(A, np.asarray(b)),
                               rtol=1e-6, atol=1e-8)


def test_ilu0_pattern_only():
    A = random_spdish(50, seed=9)
    csr = to_csr(A)
    ilu = ILUPreconditioner.ilu0(csr)
    # ILU(0) of a dense-pattern... here sparse pattern: check apply is a
    # contraction toward the true solve on a diagonally dominant matrix.
    rng = np.random.default_rng(10)
    b = rng.normal(size=50)
    x = np.asarray(ilu.solve(jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b)
    rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert rel < 0.2, rel


def test_native_vs_python_ilut_agree():
    """The C++ and pure-python ILUT fallbacks produce identical factors."""
    if not native.have_native():
        pytest.skip("no native lib")
    A = random_spdish(30, seed=11)
    csr = to_csr(A)
    ip, ix, v = csr.host_arrays()
    nat = native.ilut(ip, ix, v, fill=8, tau=1e-2)
    py = native._ilut_py(30, ip, ix, v, 8, 1e-2)
    for (a, b_) in zip(nat, py):
        np.testing.assert_array_equal(a[0], b_[0])
        np.testing.assert_array_equal(a[1], b_[1])
        np.testing.assert_allclose(a[2], b_[2], rtol=1e-13)


def test_spgemm_native_matches_dense():
    if not native.have_native():
        pytest.skip("no native lib")
    rng = np.random.default_rng(12)
    A = random_spdish(25, seed=12)
    B = random_spdish(25, seed=13)
    ca, cb = to_csr(A), to_csr(B)
    rows, cols, vals = native.spgemm(25, *ca.host_arrays(), *cb.host_arrays())
    C = np.zeros((25, 25))
    C[rows, cols] = vals
    np.testing.assert_allclose(C, A @ B, rtol=1e-12, atol=1e-12)


def test_neumann_ilu_apply_converges_to_level_apply():
    """NeumannTriSolve is exact once sweeps >= n_levels: the Neumann-apply
    ILU equals the level-scheduled apply on the same factors."""
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.solvers.preconditioners import lsc_products

    op = make_multiphase_operator(8, eta_n=100.0)
    GtG, _ = lsc_products(op)
    csr = GtG.to_csr(drop_tol=1e-14)
    level = ILUPreconditioner.ilut(csr, fill=100, tau=1e-3)
    lv = max(int(level.lower.n_levels), int(level.upper.n_levels))
    neu = ILUPreconditioner.ilut(csr, fill=100, tau=1e-3, apply="neumann",
                                 sweeps=lv)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=csr.shape[0]))
    np.testing.assert_allclose(np.asarray(neu.solve(b)),
                               np.asarray(level.solve(b)),
                               rtol=1e-9, atol=1e-9)


def test_lsc_ilut_neumann_apply_outer_convergence():
    """Truncated Neumann tri-solves are legal flexible-GMRES inner solves:
    the stiff n=16 system still converges, paying (bounded) extra outer
    iterations vs the exact level-scheduled apply's 45."""
    from mpbp_tpu.drivers import solve_multiphase

    rep = solve_multiphase(n=16, eta_n=100.0, pc="lsc_ilut", tol=1e-8,
                           maxiter=150, ilut_apply="neumann", ilut_sweeps=24)
    assert rep.converged, (rep.iters, rep.relres)
    assert rep.iters <= 100, rep.iters


def test_neumann_sweeps_pallas_ell_parity():
    """The banded-ELL Pallas sweep path (NeumannTriSolve.bell, TPU-only at
    construction) computes the same recurrence as the gather-form sweeps —
    interpret-mode kernel vs neumann_trisolve on an ILUT U factor."""
    import jax.numpy as jnp
    import numpy as np

    from mpbp_tpu import native
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.ops.pallas_ell import BandedELL, ell_spmv_pallas
    from mpbp_tpu.ops.sparse import CSRMatrix
    from mpbp_tpu.ops.trisolve import (NeumannTriSolve, neumann_sweeps_with,
                                       neumann_trisolve)
    from mpbp_tpu.solvers.preconditioners import lsc_products

    op = make_multiphase_operator(16, eta_n=100.0)
    GtG, _ = lsc_products(op)
    ct = GtG.to_csr(drop_tol=1e-14)
    ip, ix, vv = ct.host_arrays()
    (_, _, _), (Up, Ui, Uv) = native.ilut(ip, ix, vv, fill=20, tau=1e-3)
    n = len(Up) - 1
    # strict upper + diagonal split (mirrors ILUPreconditioner._from_factors)
    Up, Ui, Uv = np.asarray(Up), np.asarray(Ui), np.asarray(Uv)
    diag = Uv[Up[:-1]]
    keep = np.ones(len(Ui), bool)
    keep[Up[:-1]] = False
    newptr = np.zeros(n + 1, np.int64)
    newptr[1:] = np.cumsum(np.diff(Up) - 1)
    plan = NeumannTriSolve.from_csr(newptr, Ui[keep], Uv[keep], sweeps=12,
                                    diag_vals=diag, dtype=jnp.float32)
    assert plan.bell is None     # CPU platform: pallas path gated off

    bell = BandedELL.from_csr(CSRMatrix(
        (n, n), jnp.asarray(newptr), jnp.asarray(Ui[keep]),
        jnp.asarray(Uv[keep].astype(np.float32))))
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))
    want = np.asarray(neumann_trisolve(plan.cols, plan.vals, plan.diag,
                                       b, 12))
    got = np.asarray(neumann_sweeps_with(
        ell_spmv_pallas(bell, interpret=True), plan.diag, b, 12))
    np.testing.assert_allclose(got, want, rtol=2e-5,
                               atol=2e-5 * np.abs(want).max())
