"""Distributed DIA SpMV tests on the 8-device virtual CPU mesh.

Covers both communication regimes of parallel/sharded_dia.py: the banded
ring-halo path (offsets within one band) and the all-gather path (the full
multiphase saddle-point A, whose inter-field couplings span ~4 n^2 rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mpbp_tpu.ops.dia import DIAMatrix
from mpbp_tpu.parallel.sharded_dia import (shard_dia, sharded_dia_matvec,
                                           _signed_offsets)


def _random_dia(N, offsets, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((len(offsets), N))
    return DIAMatrix((N, N), tuple(offsets), jnp.asarray(data))


def test_signed_offsets():
    assert _signed_offsets((0, 1, 1023, 512), 1024) == [0, 1, -1, -512]


@pytest.mark.parametrize("offsets", [
    (-1, 0, 1),                 # tridiagonal -> banded halo path
    (-16, -1, 0, 1, 16),        # 2-D stencil -> banded halo path
    (0, 512, 1024),             # distant couplings -> all-gather path
])
def test_sharded_dia_matches_serial(mesh8, offsets):
    N = 2048
    A = _random_dia(N, offsets)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(N))
    expect = np.asarray(A.matvec(x))

    Ash = shard_dia(A, mesh8)
    mv = jax.jit(sharded_dia_matvec(Ash, mesh8))
    xsh = jax.device_put(x, NamedSharding(mesh8, P("x")))
    got = mv(xsh)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12,
                               atol=1e-12)
    assert len(got.sharding.device_set) == 8


def test_sharded_dia_multiphase_A(mesh8):
    """The full saddle-point operator through the all-gather path."""
    from mpbp_tpu.models.multiphase import make_multiphase_operator

    n = 16
    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0,
                                  eta_n=100.0, eta_s=1.0)
    A = DIAMatrix.from_csr(op.A.to_csr(), periodic=True)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(A.shape[0]))
    expect = np.asarray(A.matvec(x))

    Ash = shard_dia(A, mesh8)
    mv = jax.jit(sharded_dia_matvec(Ash, mesh8))
    xsh = jax.device_put(x, NamedSharding(mesh8, P("x")))
    got = mv(xsh)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12,
                               atol=1e-10)


def test_sharded_dia_in_fgmres(mesh8):
    """End-to-end: the sharded generic SpMV drives a sharded FGMRES solve."""
    from mpbp_tpu.solvers import gmres as krylov

    N = 1024
    # diagonally dominant banded system
    A = _random_dia(N, (-16, -1, 0, 1, 16), seed=3)
    data = np.array(A.data)
    k0 = list(A.offsets).index(0)
    data[k0] = np.abs(data).sum(axis=0) + 1.0
    A = DIAMatrix(A.shape, A.offsets, jnp.asarray(data))

    b = jnp.asarray(np.random.default_rng(4).standard_normal(N))
    Ash = shard_dia(A, mesh8)
    mv = sharded_dia_matvec(Ash, mesh8)
    bsh = jax.device_put(b, NamedSharding(mesh8, P("x")))
    res = krylov.fgmres(mv, bsh, tol=1e-10, maxiter=80)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(A.matvec(res.x)), np.asarray(b),
                               rtol=1e-8, atol=1e-8)
