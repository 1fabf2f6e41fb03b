"""Parity tests for the Pallas DIA SpMV kernel (interpret mode on CPU).

The kernel must reproduce DIAMatrix.matvec (the XLA roll path) bit-for-bit
modulo summation order on any square periodic diagonal matrix — including
negative/wrapping offsets, offset 0, and offsets crossing lane boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.ops.dia import DIAMatrix
from mpbp_tpu.ops.pallas_dia import dia_spmv_pallas, dia_spmv_supported


def _random_dia(N, offsets, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((len(offsets), N)).astype(np.float32)
    return DIAMatrix((N, N), tuple(offsets), jnp.asarray(data))


@pytest.mark.parametrize("N,offsets", [
    (256, (0,)),                          # diagonal only
    (256, (-1, 0, 1)),                    # tridiagonal, lane-crossing wrap
    (512, (-128, 0, 128)),                # pure sublane shifts
    (512, (-129, -127, 0, 127, 129)),     # mixed row+lane shifts
    (1024, (-512, -16, -1, 0, 1, 16, 512)),   # 2-D-stencil-like
    (640, (0, 3, 250, -250, 639)),        # large + near-N offsets
])
def test_dia_pallas_matches_xla(N, offsets):
    A = _random_dia(N, offsets)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(N),
                    dtype=jnp.float32)
    ref = A.matvec(x)
    mv = dia_spmv_pallas(A, block_rows=2, interpret=True)
    got = mv(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dia_pallas_multiphase_operator():
    """The full 5-field saddle-point A as a DIA matrix through the kernel."""
    import jax

    jax.config.update("jax_enable_x64", True)
    from mpbp_tpu.models.multiphase import make_multiphase_operator

    n = 16  # N = 5*16^2 = 1280 = 10*128
    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0,
                                  eta_n=100.0, eta_s=1.0, dtype=jnp.float64)
    csr = op.A.to_csr()
    dia = DIAMatrix.from_csr(csr, periodic=True)
    dia = DIAMatrix(dia.shape, dia.offsets,
                    dia.data.astype(jnp.float32))
    assert dia_spmv_supported(dia)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(dia.shape[0]),
                    dtype=jnp.float32)
    ref = dia.matvec(x)
    got = dia_spmv_pallas(dia, block_rows=4, interpret=True)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dia_supported_gate():
    A = _random_dia(256, (0, 1))
    assert dia_spmv_supported(A)
    B = DIAMatrix((300, 300), (0,), jnp.zeros((1, 300), jnp.float32))
    assert not dia_spmv_supported(B)          # N % 128 != 0
    C = DIAMatrix((256, 128), (0,), jnp.zeros((1, 256), jnp.float32))
    assert not dia_spmv_supported(C)          # not square


# ---------------------------------------------------------------------------
# streamed variant (x in HBM, per-diagonal DMA windows)
# ---------------------------------------------------------------------------
from mpbp_tpu.ops.pallas_dia import (dia_spmv_pallas_streamed,   # noqa: E402
                                     dia_spmv_streamed_supported)


@pytest.mark.parametrize("N,offsets", [
    (1024, (-1, 0, 1)),                       # minimum R = 8
    (2048, (-512, -16, -1, 0, 1, 16, 512)),   # stencil-like
    (2048, (-129, -127, 0, 127, 129, 2047)),  # unaligned sublane residues
])
def test_dia_streamed_matches_xla(N, offsets):
    A = _random_dia(N, offsets)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(N),
                    dtype=jnp.float32)
    ref = A.matvec(x)
    got = dia_spmv_pallas_streamed(A, block_rows=8, interpret=True)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dia_streamed_multiphase_64():
    """The coupled multiphase A at n=64 (N = 20480) through the streamed
    kernel — the configuration class used for the 1024^2+ grids where the
    resident kernel's VMEM ceiling is exceeded."""
    import jax

    jax.config.update("jax_enable_x64", True)
    from mpbp_tpu.models.multiphase import make_multiphase_operator

    op = make_multiphase_operator(64, c=1.0, d=-1.0, xi=1.0,
                                  eta_n=100.0, eta_s=1.0, dtype=jnp.float64)
    dia = DIAMatrix.from_csr(op.A.to_csr(), periodic=True)
    dia = DIAMatrix(dia.shape, dia.offsets, dia.data.astype(jnp.float32))
    assert dia_spmv_streamed_supported(dia)

    x = jnp.asarray(np.random.default_rng(4).standard_normal(dia.shape[0]),
                    dtype=jnp.float32)
    ref = dia.matvec(x)
    got = dia_spmv_pallas_streamed(dia, interpret=True)(x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6 * scale)


def test_dia_streamed_supported_gate():
    # N-independent budget: a 21M-row (2048^2-class) tridiagonal fits
    big = DIAMatrix((128 * 2 ** 14, 128 * 2 ** 14), (0, 1, -1),
                    jnp.zeros((3, 128 * 2 ** 14), jnp.float32))
    assert dia_spmv_streamed_supported(big)
    assert not dia_spmv_supported(big)        # resident kernel: over budget
