"""Krylov driver unit tests (solvers/gmres.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.solvers import gmres as krylov


@pytest.fixture
def well_conditioned():
    rng = np.random.default_rng(0)
    n = 60
    A = np.eye(n) * 4 + rng.normal(size=(n, n)) * 0.3
    b = rng.normal(size=n)
    return jnp.asarray(A), jnp.asarray(b)


def test_fgmres_solves(well_conditioned):
    A, b = well_conditioned
    res = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80)
    assert bool(res.converged)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7, atol=1e-9)


def test_fgmres_residual_history_monotone(well_conditioned):
    A, b = well_conditioned
    res = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80)
    h = np.asarray(res.res_history)
    h = h[~np.isnan(h)]
    assert all(h[i + 1] <= h[i] * (1 + 1e-12) for i in range(len(h) - 1))


def test_fgmres_with_preconditioner_fewer_iters(well_conditioned):
    A, b = well_conditioned
    Ad = np.asarray(A)
    Minv = jnp.asarray(np.linalg.inv(Ad + 0.1 * np.eye(len(Ad))))
    plain = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80)
    pcd = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80,
                        M=lambda v: Minv @ v)
    assert int(pcd.iters) < int(plain.iters)
    x_ref = np.linalg.solve(Ad, np.asarray(b))
    np.testing.assert_allclose(np.asarray(pcd.x), x_ref, rtol=1e-7, atol=1e-9)


def test_gmres_restarted(well_conditioned):
    A, b = well_conditioned
    res = krylov.gmres(lambda v: A @ v, b, tol=1e-8, maxiter=200, restart=15)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-7)


def test_cg_spd():
    rng = np.random.default_rng(1)
    n = 50
    Q = rng.normal(size=(n, n))
    A = jnp.asarray(Q @ Q.T + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    res = krylov.cg(lambda v: A @ v, b, tol=1e-12, maxiter=200)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8)


def test_jacobi_diagonally_dominant():
    rng = np.random.default_rng(2)
    n = 40
    A = np.eye(n) * 10 + rng.normal(size=(n, n)) * 0.1
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.normal(size=n))
    x = krylov.jacobi(lambda v: Aj @ v, jnp.asarray(np.diag(A)), b, iters=200)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, np.asarray(b)),
                               rtol=1e-6)


def test_fgmres_zero_rhs():
    A = jnp.eye(5)
    b = jnp.zeros(5)
    res = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_fgmres_jit_compatible(well_conditioned):
    """The whole solve must be jittable (it is one while_loop)."""
    A, b = well_conditioned

    @jax.jit
    def run(bb):
        return krylov.fgmres(lambda v: A @ v, bb, tol=1e-10, maxiter=80).x

    np.testing.assert_allclose(
        np.asarray(run(b)), np.linalg.solve(np.asarray(A), np.asarray(b)),
        rtol=1e-7, atol=1e-9)


def test_fgmres_cgs1_pipelined_matches_cgs2(well_conditioned):
    """Single-reduction (pipelined) orthogonalization converges to the same
    solution in nearly the same iteration count as CGS2."""
    A, b = well_conditioned
    r2 = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80)
    r1 = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80,
                       orthog="cgs1")
    assert bool(r1.converged)
    assert abs(int(r1.iters) - int(r2.iters)) <= 1
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(r1.x), x_ref, rtol=1e-7, atol=1e-9)


def test_fgmres_cgs1_true_residual(well_conditioned):
    """cgs1's recurrence residual must track the TRUE residual (the norm
    estimate must not silently decouple)."""
    A, b = well_conditioned
    r1 = krylov.fgmres(lambda v: A @ v, b, tol=1e-10, maxiter=80,
                       orthog="cgs1")
    true_rel = float(jnp.linalg.norm(b - A @ r1.x) / jnp.linalg.norm(b))
    assert true_rel < 1e-8, true_rel


def test_restarted_history_stitching(well_conditioned):
    """Restarted cycles stitch one history entry per iteration: no duplicated
    cycle-boundary residuals, iters == len(history) - 1, and the stitched
    history is monotone across cycle boundaries (VERDICT r1 weak #5)."""
    A, b = well_conditioned
    for fn in (krylov.fgmres, krylov.gmres):
        res = fn(lambda v: A @ v, b, tol=1e-10, maxiter=90, restart=15)
        assert bool(res.converged)
        h = np.asarray(res.res_history)
        h = h[~np.isnan(h)]
        assert len(h) == int(res.iters) + 1, (len(h), int(res.iters))
        # true final residual matches the recurrence estimate's scale
        relres = float(jnp.linalg.norm(b - A @ res.x) / jnp.linalg.norm(b))
        assert relres < 1e-9
        # non-increasing across the stitched boundaries too
        assert all(h[i + 1] <= h[i] * (1 + 1e-10) for i in range(len(h) - 1))


def test_restarted_fgmres_total_iters_capped(well_conditioned):
    A, b = well_conditioned
    res = krylov.fgmres(lambda v: A @ v, b, tol=1e-14, maxiter=20, restart=7)
    assert int(res.iters) <= 20
    h = np.asarray(res.res_history)
    assert len(h) == 21  # maxiter+1 slots, NaN-padded


def test_fgmres_resumable_matches_uninterrupted(well_conditioned, tmp_path):
    """Checkpoint mid-solve, round-trip through disk, resume: the stitched
    solve matches the uninterrupted one (SURVEY.md 5.3 Krylov-state resume)."""
    from mpbp_tpu.utils import checkpoint as ckpt

    A, b = well_conditioned
    mv = lambda v: A @ v  # noqa: E731

    full = krylov.fgmres(mv, b, tol=1e-10, maxiter=80)
    assert bool(full.converged)

    # interrupted run: 7 iterations, persist, reload, finish
    part, state = krylov.fgmres_resumable(mv, b, tol=1e-10, maxiter=80,
                                          max_steps=7)
    assert int(part.iters) == 7 and not bool(part.converged)
    path = tmp_path / "arnoldi.npz"
    ckpt.save_arnoldi_state(path, state, jnp.zeros_like(b),
                            meta={"tol": 1e-10})
    state2, x0, meta = ckpt.load_arnoldi_state(path)
    assert meta["tol"] == 1e-10
    res, _ = krylov.fgmres_resumable(mv, b, x0=x0, tol=1e-10, maxiter=80,
                                     state=state2)
    assert bool(res.converged)
    assert int(res.iters) == int(full.iters)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)
    h1 = np.asarray(res.res_history)
    h2 = np.asarray(full.res_history)
    np.testing.assert_allclose(h1[~np.isnan(h1)], h2[~np.isnan(h2)],
                               rtol=1e-12)


def test_fgmres_resumable_partial_iterate_valid(well_conditioned):
    """The mid-solve result is a genuine least-squares iterate: its true
    residual matches the recurrence estimate."""
    A, b = well_conditioned
    mv = lambda v: A @ v  # noqa: E731
    part, _ = krylov.fgmres_resumable(mv, b, tol=1e-10, maxiter=80,
                                      max_steps=10)
    true_rel = float(jnp.linalg.norm(b - mv(part.x)) / jnp.linalg.norm(b))
    assert abs(true_rel - float(part.relres)) < 1e-8 * (1 + true_rel)


def test_chunked_orthogonalization_matches_unchunked():
    """The j-proportional chunked projections compute the same sums as the
    full-basis contractions (rows beyond j are zero) — iterates and counts
    match to reduction-reassociation level for both orthog variants."""
    import numpy as np

    rng = np.random.default_rng(3)
    N = 96
    A = jnp.asarray(rng.normal(size=(N, N)) + 4 * np.eye(N))
    b = jnp.asarray(rng.normal(size=N))
    mv = lambda v: A @ v  # noqa: E731
    for orthog in ("cgs2", "cgs1"):
        r_full = krylov.fgmres(mv, b, tol=1e-10, maxiter=40, orthog=orthog,
                               chunked=False)
        r_chunk = krylov.fgmres(mv, b, tol=1e-10, maxiter=40, orthog=orthog,
                                chunked=True)
        assert abs(int(r_full.iters) - int(r_chunk.iters)) <= 1, orthog
        np.testing.assert_allclose(np.asarray(r_chunk.x),
                                   np.asarray(r_full.x),
                                   rtol=1e-8, atol=1e-9)


def test_residual_norm_helper():
    """gmres.residual_norm returns (b - A x, ||.||) as one jitted call —
    the drivers' replacement for eager outer-loop applies (r5)."""
    import numpy as np

    rng = np.random.default_rng(4)
    N = 64
    A = jnp.asarray(rng.normal(size=(N, N)))
    b = jnp.asarray(rng.normal(size=N))
    x = jnp.asarray(rng.normal(size=N))
    mv = lambda v: A @ v  # noqa: E731
    r, nrm = krylov.residual_norm(mv, b, x)
    np.testing.assert_allclose(np.asarray(r), np.asarray(b - A @ x),
                               rtol=1e-12, atol=1e-12)
    assert abs(float(nrm) - float(jnp.linalg.norm(r))) < 1e-10


def test_augmented_restart_converges_correctly():
    """LGMRES augmented restarts (fgmres aug_k>0): converge to the same
    solution as plain restarts, with the aug machinery engaged (the last k
    cycle corrections seed each cycle — solvers/gmres._arnoldi_body)."""
    import numpy as np

    rng = np.random.default_rng(7)
    N = 200
    A = jnp.asarray(np.diag(np.linspace(0.05, 1.0, N))
                    + 0.2 * np.triu(rng.normal(size=(N, N)), 1) / np.sqrt(N))
    b = jnp.asarray(rng.normal(size=N))
    mv = lambda v: A @ v  # noqa: E731
    r0 = krylov.fgmres(mv, b, tol=1e-10, maxiter=600, restart=15)
    for k in (1, 2):
        r = krylov.fgmres(mv, b, tol=1e-10, maxiter=600, restart=15,
                          aug_k=k)
        assert bool(r.converged), (k, float(r.relres))
        res = float(jnp.linalg.norm(b - A @ r.x) / jnp.linalg.norm(b))
        assert res < 1e-9, (k, res)
    assert bool(r0.converged)
