"""Matrix-free eigenvalue analysis — the SLEPc/EPS replacement (L4).

The reference copies dense matrices element-by-element into PETSc and runs
SLEPc's Krylov-Schur (reference solve.py:103-147, nev=10, tol=1e-4,
max_it=40) to study preconditioner quality: a good Schur PC clusters the
spectrum of A*M^-1 near 1 (reference solve.py:306-327 plots). Here the
eigensolver is *matrix-free* — it only needs the same matvec the Krylov
driver uses, so it runs on the sharded operator without ever forming a
matrix (SURVEY.md section 3 'irrelevant on TPU: eigensolver operates
matrix-free').

Algorithm: thick-restart Arnoldi (Krylov-Schur style). Device work is the
matvec + basis updates; the small (ncv x ncv) Hessenberg eigenproblem is
solved on host with numpy (not a hot path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mpbp_tpu.solvers.gmres import _tdot


@dataclasses.dataclass
class EigResult:
    """Converged Ritz values/vectors and diagnostics."""

    eigenvalues: np.ndarray      # (k,) complex, sorted by |.| descending
    residuals: np.ndarray        # (k,) Ritz residual estimates
    n_converged: int
    iterations: int

    def clustering(self, center: complex = 1.0) -> float:
        """Max distance of the converged spectrum from `center` — the
        preconditioner-quality number the reference eyeballs from plots."""
        if self.n_converged == 0:
            return float("inf")
        ev = self.eigenvalues[: self.n_converged]
        return float(np.max(np.abs(ev - center)))


def _arnoldi_extend(matvec, V, H, start, m):
    """Extend an Arnoldi factorization from `start` to `m` vectors.
    V: (m+1, *S) device array with rows [0, start] filled. H: (m+1, m) host.

    All device work (matvec, CGS2 projections, normalization) is queued
    without host syncs; the Hessenberg columns are fetched in ONE transfer
    at the end of the extension. An exact breakdown (beta == 0) leaves the
    next basis vector as the zero vector — every later column is then zero
    too — and is detected after the fetch, truncating the factorization."""
    hs, betas = [], []
    for j in range(start, m):
        w = matvec(V[j])
        # CGS2 against all previous vectors (rows > j are zero).
        vdims = tuple(range(1, V.ndim))
        wdims = tuple(range(w.ndim))
        h1 = _tdot(V, w, (vdims, wdims))
        w = w - _tdot(h1, V, ((0,), (0,)))
        h2 = _tdot(V, w, (vdims, wdims))
        w = w - _tdot(h2, V, ((0,), (0,)))
        beta = jnp.sqrt(jnp.sum(w * w))
        V = V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))
        hs.append(h1 + h2)
        betas.append(beta)
    if not hs:
        return V, H, m
    hs_np = np.asarray(jnp.stack(hs))          # single device fetch
    betas_np = np.asarray(jnp.stack(betas))
    for idx, j in enumerate(range(start, m)):
        H[: j + 1, j] = hs_np[idx, : j + 1]
        H[j + 1, j] = betas_np[idx]
        if betas_np[idx] == 0.0:
            return V, H, j + 1  # invariant subspace
    return V, H, m


def eigs(matvec: Callable, example: jax.Array, k: int = 10,
         ncv: int | None = None, maxiter: int = 40, tol: float = 1e-4,
         seed: int = 0) -> EigResult:
    """Largest-magnitude eigenvalues of the linear operator `matvec`.

    Parameters mirror the reference's EPS setup (nev=10, tol=1e-4,
    max_it=40 — reference solve.py:127-129). `example` fixes the vector
    shape/dtype (flat or stacked/sharded).
    """
    if maxiter <= 0:
        return EigResult(np.empty(0, complex), np.empty(0), 0, 0)
    ncv = ncv or max(2 * k + 1, 20)
    S = example.shape
    dtype = example.dtype

    key = jax.random.PRNGKey(seed)
    v0 = jax.random.normal(key, S, dtype)
    v0 = v0 / jnp.sqrt(jnp.sum(v0 * v0))

    V = jnp.zeros((ncv + 1, *S), dtype).at[0].set(v0)
    H = np.zeros((ncv + 1, ncv))
    start = 0
    locked = 0

    for it in range(maxiter):
        V, H, m = _arnoldi_extend(matvec, V, H, start, ncv)
        Hm = H[:m, :m]
        beta = H[m, m - 1]

        # Ritz pairs of the (host, small) Hessenberg matrix.
        evals, evecs = np.linalg.eig(Hm)
        order = np.argsort(-np.abs(evals))
        evals, evecs = evals[order], evecs[:, order]
        resids = np.abs(beta * evecs[m - 1, :])

        nconv = int(np.sum(resids[:k] < tol * np.maximum(np.abs(evals[:k]),
                                                         1e-30)))
        if nconv >= k or m < ncv:
            return EigResult(evals[:k], resids[:k], nconv, it + 1)

        # Krylov-Schur thick restart: transform to real Schur form with the
        # ~p largest-|lambda| eigenvalues ordered first. The selected leading
        # block spans an exact invariant subspace of Hm, so the Arnoldi
        # relation A V_p = V_p T_p + v_m b^T survives the restart.
        p_want = min(max(k + 3, ncv // 2), m - 2)
        out = _sorted_real_schur(Hm, p_want)
        if out is None:
            # fallback: explicit restart with a combination of wanted Ritz
            # vectors. Keep BOTH the real and imaginary parts of the complex
            # sum: for a conjugate eigenpair they span the 2-D real invariant
            # subspace, whereas np.real alone throws half of it away and can
            # start the restart orthogonal to a wanted vector.
            csum = evecs[:, :k] @ np.ones(min(k, evecs.shape[1]))
            comb = np.real(csum) + np.imag(csum)
            vr = _tdot(jnp.asarray(comb, dtype), V[:m],
                               axes=((0,), (0,)))
            vr = vr / jnp.sqrt(jnp.sum(vr * vr))
            V = jnp.zeros_like(V).at[0].set(vr)
            H = np.zeros_like(H)
            start = 0
            continue
        T, Q, p = out
        Vk = _tdot(jnp.asarray(Q[:, :p].T.copy(), dtype), V[:m],
                           axes=((1,), (0,)))
        Vnew = jnp.zeros_like(V)
        Vnew = Vnew.at[:p].set(Vk)
        Vnew = Vnew.at[p].set(V[m])
        V = Vnew
        Hnew = np.zeros_like(H)
        Hnew[:p, :p] = T[:p, :p]
        Hnew[p, :p] = beta * Q[m - 1, :p]
        H = Hnew
        start = p

    return EigResult(evals[:k], resids[:k], nconv, maxiter)


def _sorted_real_schur(Hm: np.ndarray, p: int):
    """Real Schur form of Hm with ~p largest-|lambda| eigenvalues leading.
    Returns (T, Q, p_effective) or None if no Schur routine is available.

    Host-side small-matrix factorization (ncv x ncv) — the setup-path
    LAPACK role, same boundary class as the reference's SLEPc call."""
    try:
        from scipy.linalg import schur
    except Exception:  # pragma: no cover - scipy always present in tests
        return None
    evals = np.linalg.eigvals(Hm)
    mags = np.sort(np.abs(evals))[::-1]
    if p >= len(mags):
        p = len(mags) - 1
    # threshold between p-th and (p+1)-th magnitude; conjugate pairs share a
    # magnitude so a midpoint never splits them (schur returns sdim anyway).
    hi, lo = mags[p - 1], mags[p]
    thresh = 0.5 * (hi + lo)
    if hi == lo:
        thresh = hi - 1e-12 * max(hi, 1.0)

    def sel(re, im):
        return re * re + im * im > thresh * thresh

    T, Q, sdim = schur(Hm, output="real", sort=sel)
    p_eff = int(sdim)
    if p_eff < 1 or p_eff >= Hm.shape[0]:
        return None
    return T, Q, p_eff


def exact_eigenvalues(op) -> np.ndarray:
    """Exact (dense, full) spectrum of a StencilOperator — the capability of
    the reference's sympy exact-eigenvalue variant (reference solve.py:86-101,
    `print_ev_from_sympy`), for small grids where a dense eigendecomposition
    is affordable. Returns all eigenvalues sorted by |.| descending."""
    A = op.to_csr().to_dense()
    ev = np.linalg.eigvals(np.asarray(A))
    return ev[np.argsort(-np.abs(ev))]


def preconditioned_spectrum(a_matvec: Callable, pc: Callable,
                            example: jax.Array, k: int = 10,
                            **kw) -> EigResult:
    """Spectrum of A*M^-1 (right-preconditioned operator) — the
    `compute_preconditioned_A` capability (reference solve.py:172-200)
    without ever forming pinv/dense products."""

    def mv(v):
        return a_matvec(pc(v))

    return eigs(mv, example, k=k, **kw)
