"""Parity tests for the banded-ELL Pallas SpMV/SpMM kernels (interpret
mode — the same kernel code runs on the chip; see bench/ell notes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.ops.pallas_ell import (BandedELL, ell_spmm_pallas,
                                     ell_spmv_pallas, ell_spmv_supported)
from mpbp_tpu.ops.sparse import CSRMatrix


def _random_banded_csr(N, offsets, fill_prob=0.7, seed=0):
    """Random matrix with nonzeros scattered in bands around the given
    flat offsets (diagonals with fill — the ILU-factor shape)."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offsets:
        for spread in range(-2, 3):
            keep = rng.random(N) < fill_prob
            r = np.arange(N)[keep]
            c = (r + off + spread) % N
            rows.append(r)
            cols.append(c)
            vals.append(rng.standard_normal(len(r)).astype(np.float32))
    return CSRMatrix.from_coo(N, N, np.concatenate(rows),
                              np.concatenate(cols), np.concatenate(vals))


@pytest.mark.parametrize("N,offsets", [
    (256, (0,)),                       # single block, main band
    (512, (0, 1, -1, 16, -16)),        # stencil-like
    (1024, (0, 127, 128, 129, -300)),  # band straddling a 128 boundary
])
def test_banded_ell_matvec_matches_csr(N, offsets):
    csr = _random_banded_csr(N, offsets)
    A = BandedELL.from_csr(csr)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(N),
                    dtype=jnp.float32)
    ref = csr.matvec(x)
    got = A.matvec(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("N,offsets", [
    (256, (0, 1, -1)),
    (512, (0, 1, -1, 16, -16, 255)),
])
def test_pallas_ell_spmv_interpret(N, offsets):
    csr = _random_banded_csr(N, offsets)
    A = BandedELL.from_csr(csr)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(N),
                    dtype=jnp.float32)
    mv = ell_spmv_pallas(A, interpret=True)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(csr.matvec(x)),
                               rtol=2e-5, atol=2e-5)


def test_pallas_ell_spmv_multiblock_interpret():
    # R = N/128 = 256 -> TR = 128, 2 grid programs: exercises the
    # multi-block slab indexing
    N = 128 * 256
    csr = _random_banded_csr(N, (0, 1, -1, 512), fill_prob=0.3)
    A = BandedELL.from_csr(csr)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(N),
                    dtype=jnp.float32)
    mv = ell_spmv_pallas(A, interpret=True)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(csr.matvec(x)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k", [1, 4, 130])
def test_pallas_ell_spmm_interpret(k):
    N = 512
    csr = _random_banded_csr(N, (0, 1, -1, 64))
    A = BandedELL.from_csr(csr)
    X = jnp.asarray(np.random.default_rng(4).standard_normal((N, k)),
                    dtype=jnp.float32)
    mm = ell_spmm_pallas(A, k, interpret=True)
    ref = np.stack([np.asarray(csr.matvec(X[:, j])) for j in range(k)], 1)
    np.testing.assert_allclose(np.asarray(mm(X)), ref, rtol=3e-5, atol=3e-5)


def test_pallas_ell_on_multiphase_operator():
    """The coupled multiphase A (the actual production matrix) through the
    banded-ELL kernel matches the stencil apply."""
    from mpbp_tpu.models.multiphase import make_multiphase_operator

    n = 16
    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                  eta_s=1.0, dtype=jnp.float32)
    csr = op.A.to_csr()
    A = BandedELL.from_csr(csr)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(5 * n * n),
                    dtype=jnp.float32)
    mv = ell_spmv_pallas(A, interpret=True)
    ref = csr.matvec(x)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(ref),
                               rtol=1e-4, atol=1e-4 * float(
                                   jnp.max(jnp.abs(ref))))


def test_pallas_ell_on_ilu_factors():
    """ILU(0) L/U factors (banded with fill — beyond DIA's exact-diagonal
    reach when tau-dropped) run through the banded kernel."""
    from mpbp_tpu.solvers.preconditioners import lsc_products
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.native import ilu0

    n = 16
    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                  eta_s=1.0, dtype=jnp.float64)
    GtG, _ = lsc_products(op)
    csr = GtG.to_csr()
    ip, ix, v = csr.host_arrays()
    (Lp, Li, Lv), (Up, Ui, Uv) = ilu0(ip, ix, v)
    for (p, i, vv) in ((Lp, Li, Lv), (Up, Ui, Uv)):
        rows = np.repeat(np.arange(csr.shape[0]), np.diff(p))
        fac = CSRMatrix.from_coo(csr.shape[0], csr.shape[0], rows, i,
                                 vv.astype(np.float32))
        A = BandedELL.from_csr(fac)
        x = jnp.asarray(np.random.default_rng(6).standard_normal(
            csr.shape[0]), dtype=jnp.float32)
        mv = ell_spmv_pallas(A, interpret=True)
        np.testing.assert_allclose(np.asarray(mv(x)),
                                   np.asarray(fac.matvec(x)),
                                   rtol=2e-4, atol=2e-4)


def test_ell_spmv_supported_gate():
    csr = _random_banded_csr(256, (0,))
    A = BandedELL.from_csr(csr)
    assert ell_spmv_supported(A)
    # f64 payloads are rejected (TPU kernel is f32)
    A64 = BandedELL(A.shape, A.offsets, A.widths, A.idx,
                    A.vals.astype(jnp.float64))
    assert not ell_spmv_supported(A64)
