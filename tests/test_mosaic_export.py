"""Off-chip Mosaic-lowering regression tests.

`jax.export.export(..., platforms=["tpu"])` runs the full Pallas->Mosaic
lowering (including the Mosaic verifier) WITHOUT a TPU client, so the class
of on-chip compile failures that bit r3 is testable on CPU:

  * under jax_enable_x64 (this suite enables it globally), a bare Python
    int used as a ref index traces as i64 -> 'tpu.memref_slice op operand
    #1 must be ... 32-bit signless integer, but got i64'
  * jnp.take_along_axis builds i64 internal iotas under x64 ->
    'NotImplementedError: 64-bit types are not supported'

Every production kernel must lower for the tpu platform from an
x64-enabled host process (benchmarks/solve_tpu.py is one).
"""

import jax
import jax.numpy as jnp
import pytest

from mpbp_tpu.models.multiphase import make_multiphase_operator
from mpbp_tpu.ops.dia import DIAMatrix


@pytest.fixture(scope="module")
def op256():
    return make_multiphase_operator(256, c=1.0, d=-1.0, xi=1.0,
                                    eta_n=100.0, eta_s=1.0,
                                    dtype=jnp.float32)


def _export_ok(fn, *specs):
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*specs)


def test_fused_stencil_kernels_lower_for_tpu_under_x64(op256):
    from mpbp_tpu.models.fused import make_fused_apply_pallas

    assert jax.config.jax_enable_x64      # the regression precondition
    n = op256.grid.n
    v = jax.ShapeDtypeStruct((5, n, n), jnp.float32)
    for halo in ("inkernel", "pipelined", "extend"):
        _export_ok(make_fused_apply_pallas(op256, block_rows=64, halo=halo),
                   v)


def test_f_apply_pallas_lowers_for_tpu_under_x64(op256):
    from mpbp_tpu.models.fused import make_f_apply_pallas

    assert jax.config.jax_enable_x64
    n = op256.grid.n
    _export_ok(make_f_apply_pallas(op256, block_rows=64),
               jax.ShapeDtypeStruct((4 * n * n,), jnp.float32))


def test_dia_kernels_lower_for_tpu_under_x64(op256):
    from mpbp_tpu.ops.pallas_dia import (dia_spmv_pallas,
                                         dia_spmv_pallas_streamed,
                                         dia_spmv_streamed_supported,
                                         dia_spmv_supported)

    dia = DIAMatrix.from_csr(op256.A.to_csr(), periodic=True)
    x = jax.ShapeDtypeStruct((dia.shape[0],), jnp.float32)
    assert dia_spmv_supported(dia)
    _export_ok(dia_spmv_pallas(dia), x)
    assert dia_spmv_streamed_supported(dia)
    _export_ok(dia_spmv_pallas_streamed(dia), x)


def test_ell_kernels_lower_for_tpu_under_x64(op256):
    from mpbp_tpu.ops.pallas_ell import (BandedELL, ell_spmm_pallas,
                                         ell_spmv_pallas, ell_spmv_supported)

    ell = BandedELL.from_csr(op256.A.to_csr())
    N = ell.shape[0]
    assert ell_spmv_supported(ell)
    _export_ok(ell_spmv_pallas(ell), jax.ShapeDtypeStruct((N,), jnp.float32))
    _export_ok(ell_spmm_pallas(ell, 8),
               jax.ShapeDtypeStruct((N, 8), jnp.float32))
