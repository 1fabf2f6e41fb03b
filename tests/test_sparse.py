"""Sparse container tests: COO/CSR/ELL/BSR round-trips and SpMV/SpMM/SpGEMM
parity with dense linear algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.ops.sparse import BSRMatrix, COOMatrix, CSRMatrix, ELLMatrix, spgemm_csr


@pytest.fixture
def rand_csr():
    rng = np.random.default_rng(42)
    m, n, nnz = 40, 32, 200
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    return CSRMatrix.from_coo(m, n, rows, cols, vals)


def test_from_coo_sums_duplicates():
    A = CSRMatrix.from_coo(2, 2, [0, 0, 1], [1, 1, 0], [1.0, 2.0, 5.0])
    d = A.to_dense()
    np.testing.assert_allclose(d, [[0.0, 3.0], [5.0, 0.0]])


def test_csr_matvec_matches_dense(rand_csr):
    A = rand_csr
    x = jnp.asarray(np.random.default_rng(1).normal(size=A.shape[1]))
    np.testing.assert_allclose(np.asarray(A.matvec(x)), A.to_dense() @ np.asarray(x),
                               rtol=1e-12)


def test_ell_matvec_matches_dense(rand_csr):
    A = rand_csr
    E = A.to_ell()
    x = jnp.asarray(np.random.default_rng(2).normal(size=A.shape[1]))
    np.testing.assert_allclose(np.asarray(E.matvec(x)), A.to_dense() @ np.asarray(x),
                               rtol=1e-12)


def test_ell_matmat_matches_dense(rand_csr):
    A = rand_csr
    E = A.to_ell()
    X = jnp.asarray(np.random.default_rng(3).normal(size=(A.shape[1], 5)))
    np.testing.assert_allclose(np.asarray(E.matmat(X)), A.to_dense() @ np.asarray(X),
                               rtol=1e-12)


def test_coo_matvec_matches_dense():
    rng = np.random.default_rng(4)
    m, n, nnz = 15, 12, 60
    rows, cols = rng.integers(0, m, nnz), rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    A = COOMatrix((m, n), jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
                  jnp.asarray(vals))
    x = jnp.asarray(rng.normal(size=n))
    np.testing.assert_allclose(np.asarray(A.matvec(x)), A.to_dense() @ np.asarray(x),
                               rtol=1e-12)


def test_bsr_matvec_matches_dense():
    rng = np.random.default_rng(5)
    m = n = 32
    bs = 4
    dense = np.zeros((m, n))
    for _ in range(20):
        br, bc = rng.integers(0, m // bs), rng.integers(0, n // bs)
        dense[br * bs:(br + 1) * bs, bc * bs:(bc + 1) * bs] = rng.normal(size=(bs, bs))
    rows, cols = np.nonzero(dense)
    A = CSRMatrix.from_coo(m, n, rows, cols, dense[rows, cols])
    B = BSRMatrix.from_csr(A, bs)
    x = jnp.asarray(rng.normal(size=n))
    np.testing.assert_allclose(np.asarray(B.matvec(x)), dense @ np.asarray(x),
                               rtol=1e-12)


def test_csr_transpose(rand_csr):
    A = rand_csr
    np.testing.assert_allclose(A.transpose().to_dense(), A.to_dense().T)


def test_spgemm_matches_dense():
    rng = np.random.default_rng(6)
    A = CSRMatrix.from_coo(20, 15, rng.integers(0, 20, 80),
                           rng.integers(0, 15, 80), rng.normal(size=80))
    B = CSRMatrix.from_coo(15, 25, rng.integers(0, 15, 70),
                           rng.integers(0, 25, 70), rng.normal(size=70))
    C = spgemm_csr(A, B)
    np.testing.assert_allclose(C.to_dense(), A.to_dense() @ B.to_dense(),
                               rtol=1e-12, atol=1e-12)


def test_csr_jit_matvec(rand_csr):
    A = rand_csr
    x = jnp.asarray(np.random.default_rng(7).normal(size=A.shape[1]))

    @jax.jit
    def f(mat, v):
        return mat.matvec(v)

    np.testing.assert_allclose(np.asarray(f(A, x)), np.asarray(A.matvec(x)),
                               rtol=1e-12)


def test_prune():
    A = CSRMatrix.from_coo(3, 3, [0, 1, 2], [0, 1, 2], [1.0, 1e-12, 2.0])
    P = A.prune(1e-8)
    assert P.nnz == 2


def test_dia_from_stencil_matvec():
    """DIA conversion of a periodic stencil matrix (GtG) reproduces the CSR
    matvec with pure shift arithmetic."""
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.ops.dia import DIAMatrix
    from mpbp_tpu.solvers.preconditioners import lsc_products

    op = make_multiphase_operator(8, eta_n=3.0)
    GtG, _ = lsc_products(op)
    csr = GtG.to_csr(drop_tol=1e-14)
    dia = DIAMatrix.from_csr(csr, periodic=True)
    assert len(dia.offsets) <= 9  # 5-point stencil + wraps fold to few diags
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=csr.shape[1]))
    np.testing.assert_allclose(np.asarray(dia.matvec(x)),
                               np.asarray(csr.matvec(x)), rtol=1e-12)


def test_dia_general_nonperiodic():
    from mpbp_tpu.ops.dia import DIAMatrix

    rng = np.random.default_rng(1)
    n = 30
    A = np.diag(rng.normal(size=n)) + np.diag(rng.normal(size=n - 2), 2)
    rows, cols = np.nonzero(A)
    csr = CSRMatrix.from_coo(n, n, rows, cols, A[rows, cols])
    dia = DIAMatrix.from_csr(csr, periodic=False)
    x = jnp.asarray(rng.normal(size=n))
    np.testing.assert_allclose(np.asarray(dia.matvec(x)), A @ np.asarray(x),
                               rtol=1e-12)


def test_best_spmv_dispatch():
    """ops.dispatch picks the structurally right kernel and all paths
    agree numerically."""
    import numpy as np
    from mpbp_tpu.ops.dispatch import best_spmv
    from mpbp_tpu.ops.sparse import CSRMatrix

    rng = np.random.default_rng(0)
    N = 512
    # exact tridiagonal -> dia
    r = np.arange(N)
    rows = np.concatenate([r, r, r])
    cols = np.concatenate([r, (r + 1) % N, (r - 1) % N])
    vals = rng.standard_normal(3 * N).astype(np.float32)
    tri = CSRMatrix.from_coo(N, N, rows, cols, vals)
    mv, path = best_spmv(tri, interpret=True)
    assert path == "dia"
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(tri.matvec(x)),
                               rtol=1e-5, atol=1e-5)

    # scattered band around the diagonal (200 distinct offsets) -> ell
    rows2, cols2 = [], []
    for _ in range(6):
        d = rng.integers(-100, 100)
        rows2.append(r)
        cols2.append((r + d + rng.integers(0, 9, N)) % N)
    band = CSRMatrix.from_coo(N, N, np.concatenate(rows2),
                              np.concatenate(cols2),
                              rng.standard_normal(6 * N).astype(np.float32))
    mv2, path2 = best_spmv(band, interpret=True)
    assert path2 == "ell"
    np.testing.assert_allclose(np.asarray(mv2(x)), np.asarray(band.matvec(x)),
                               rtol=1e-5, atol=1e-5)

    # non-128-multiple N -> xla fallback
    odd = CSRMatrix.from_coo(300, 300, np.arange(300), np.arange(300),
                             np.ones(300, np.float32))
    mv3, path3 = best_spmv(odd)
    assert path3 == "xla"
    x3 = jnp.ones(300, jnp.float32)
    np.testing.assert_allclose(np.asarray(mv3(x3)), np.ones(300), rtol=1e-6)
