"""Spectral-analysis tests (L4 parity — reference solve.py:103-147, 172-200,
306-327): eigenvalues via matrix-free Arnoldi, preconditioner clustering."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.drivers import a_matvec, make_preconditioner
from mpbp_tpu.models.multiphase import make_multiphase_operator
from mpbp_tpu.solvers.eigen import eigs, preconditioned_spectrum


def test_eigs_diagonal():
    d = jnp.asarray(np.arange(1.0, 51.0))
    res = eigs(lambda v: d * v, jnp.ones(50), k=5, tol=1e-8)
    assert res.n_converged >= 5
    np.testing.assert_allclose(np.sort(np.real(res.eigenvalues[:5])),
                               [46, 47, 48, 49, 50], rtol=1e-6)


def test_eigs_nonsymmetric_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(40, 40))
    Aj = jnp.asarray(A)
    res = eigs(lambda v: Aj @ v, jnp.ones(40), k=4, ncv=25, tol=1e-8,
               maxiter=100)
    ref = np.linalg.eigvals(A)
    ref = ref[np.argsort(-np.abs(ref))][:4]
    got = res.eigenvalues[:4]
    # compare magnitudes (degenerate ordering of conjugate pairs)
    np.testing.assert_allclose(np.sort(np.abs(got)), np.sort(np.abs(ref)),
                               rtol=1e-4)


def test_eigs_explicit_restart_fallback(monkeypatch):
    """The explicit-restart fallback (taken when no Schur routine is
    available) still converges to the dominant eigenvalues — and its restart
    vector keeps both real and imaginary parts of complex Ritz pairs."""
    from mpbp_tpu.solvers import eigen as eig_mod

    monkeypatch.setattr(eig_mod, "_sorted_real_schur", lambda *a: None)
    rng = np.random.default_rng(3)
    A = rng.normal(size=(60, 60))
    Aj = jnp.asarray(A)
    # small ncv forces restarts; the dominant pair of a random real matrix
    # is typically complex, exercising the conjugate-pair handling
    res = eig_mod.eigs(lambda v: Aj @ v, jnp.ones(60), k=2, ncv=12,
                       tol=1e-6, maxiter=300)
    ref = np.linalg.eigvals(A)
    ref = ref[np.argsort(-np.abs(ref))]
    assert res.n_converged >= 1
    got = res.eigenvalues[: res.n_converged]
    for ev in got:
        assert np.min(np.abs(ref - ev)) < 1e-3 * abs(ev), ev


def test_unpreconditioned_A_spectrum_matches_dense():
    """Eigenvalues found by matrix-free Arnoldi on the n=8 multiphase A are
    genuine eigenvalues of the dense matrix (the reference's
    get_eigenvals(A) capability). Single-vector Arnoldi resolves one copy of
    multiplicity-2 eigenvalues, so compare membership, not the full list."""
    op = make_multiphase_operator(8, eta_n=1.0, eta_s=1.0)
    mv = a_matvec(op)
    res = eigs(mv, jnp.ones(5 * 64), k=6, ncv=40, tol=1e-6, maxiter=60)
    ref = np.linalg.eigvals(op.A.to_dense())
    for ev in res.eigenvalues[: res.n_converged]:
        assert np.min(np.abs(ref - ev)) < 1e-3 * max(abs(ev), 1.0), ev
    # and the true dominant eigenvalue is found
    assert abs(np.max(np.abs(res.eigenvalues)) - np.max(np.abs(ref))) \
        < 1e-3 * np.max(np.abs(ref))


def _dense_preconditioned_spectrum(op, pc):
    """Spectrum of A*M^-1 via dense columns (n=8 only, 320 dofs)."""
    import jax
    N = 5 * op.grid.n ** 2
    mv = a_matvec(op)
    cols = []
    eye = np.eye(N)
    apply = jax.jit(lambda v: mv(pc(v)))
    for i in range(N):
        cols.append(np.asarray(apply(jnp.asarray(eye[:, i]))))
    return np.linalg.eigvals(np.stack(cols, axis=1))


def test_exact_schur_clusters_spectrum_at_one():
    """With the exact Schur PC, A*M^-1 ~ I up to the pressure-nullspace
    direction and inner-solve error: the bulk of the spectrum sits at 1
    (the property the reference eyeballs from plots, solve.py:311-327)."""
    op = make_multiphase_operator(8, eta_n=1.0, eta_s=1.0)
    pc = make_preconditioner(op, "exact_schur")
    ev = _dense_preconditioned_spectrum(op, pc)
    # all but the constant-pressure nullspace direction sit at 1
    frac_at_one = np.mean(np.abs(ev - 1.0) < 0.05)
    assert frac_at_one >= (320 - 1) / 320, frac_at_one

    # the matrix-free Arnoldi finds the true outliers of the same operator
    mv = a_matvec(op)
    res = preconditioned_spectrum(mv, pc, jnp.ones(5 * 64), k=3, ncv=30,
                                  tol=1e-3, maxiter=60)
    top_ref = np.max(np.abs(ev))
    assert abs(np.max(np.abs(res.eigenvalues)) - top_ref) < 0.05 * top_ref


def test_lsc_pc_clusters_spectrum():
    """The LSC/ILUT preconditioned operator is O(1)-clustered while raw A
    spreads to the Laplacian scale (~1e3 at n=8)."""
    op = make_multiphase_operator(8, eta_n=1.0, eta_s=1.0)
    pc = make_preconditioner(op, "lsc_ilut")
    ev = _dense_preconditioned_spectrum(op, pc)
    ref = np.linalg.eigvals(op.A.to_dense())
    assert np.max(np.abs(ref)) > 100
    frac_near_one = np.mean(np.abs(ev - 1.0) < 0.5)
    assert frac_near_one > 0.75, frac_near_one


def test_exact_eigenvalues_matches_arnoldi():
    """Dense full-spectrum helper (reference solve.py:86-101 analog) agrees
    with the matrix-free Arnoldi on the dominant eigenvalues."""
    from mpbp_tpu.solvers.eigen import eigs, exact_eigenvalues
    op = make_multiphase_operator(8)
    full = exact_eigenvalues(op.A)
    mv = a_matvec(op)
    ex = jnp.zeros(5 * 8 * 8, jnp.float64)
    res = eigs(mv, ex, k=4, tol=1e-6, maxiter=60)
    assert res.n_converged >= 2
    # single-vector Arnoldi may find one member of a multiple eigenvalue, so
    # assert each converged Ritz value matches SOME exact eigenvalue (and the
    # top magnitude agrees), not positional equality.
    for ev in res.eigenvalues[: res.n_converged]:
        assert np.min(np.abs(full - ev)) < 1e-3 * np.abs(ev)
    np.testing.assert_allclose(np.max(np.abs(res.eigenvalues)),
                               np.max(np.abs(full)), rtol=1e-5)


def test_eigs_maxiter_zero_returns_empty():
    """maxiter=0 returns an empty, well-formed result instead of raising
    (VERDICT r1 weak #6)."""
    from mpbp_tpu.solvers.eigen import eigs

    d = jnp.arange(1.0, 9.0)
    res = eigs(lambda v: d * v, jnp.ones(8), k=3, maxiter=0)
    assert res.n_converged == 0
    assert res.iterations == 0
    assert res.eigenvalues.shape == (0,)
    assert res.clustering() == float("inf")


@pytest.mark.slow
def test_spectrum_report_artifact():
    """The plot-ready spectrum report (drivers.spectrum_report, the data
    equivalent of reference solve.py:311-327's scatter plots): spec(A) and
    spec(A*M^-1) arrays per PC, nullspace count, clustering radii; the
    exact-Schur PC clusters at 1 up to inner-solve error."""
    import json

    from mpbp_tpu.drivers import spectrum_report

    rep = spectrum_report(n=6, eta_n=1.0, eta_s=1.0,
                          pcs=("exact_schur",), exact=True)
    json.dumps(rep)                      # fully serializable
    assert rep["method"] == "dense"
    N = 5 * 36
    assert len(rep["A"]["eigenvalues_re"]) == N
    es = rep["preconditioned"]["exact_schur"]
    # the periodic constant-pressure direction maps to the lone 0 eigenvalue
    assert es["n_nullspace"] == 1, es["n_nullspace"]
    assert es["clustering_radius_1"] < 1e-3, es["clustering_radius_1"]
    # raw A is NOT clustered at 1
    assert rep["A"]["clustering_radius_1"] > 10.0
