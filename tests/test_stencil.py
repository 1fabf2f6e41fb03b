"""Unit tests for the StencilOperator core: apply/compose/transpose/export
agree with dense linear algebra on small grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.ops.stencil import StencilOperator, diagonal_operator, shift


def random_stencil(key, out_fields, in_fields, offsets, n):
    terms = {}
    keys = jax.random.split(key, len(out_fields) * len(in_fields) * len(offsets))
    k = 0
    for of in out_fields:
        for inf in in_fields:
            offmap = {}
            for off in offsets:
                offmap[off] = jax.random.normal(keys[k], (n, n), jnp.float64)
                k += 1
            terms[(of, inf)] = offmap
    return StencilOperator(tuple(out_fields), tuple(in_fields), terms, (n, n))


@pytest.fixture
def ops():
    n = 6
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    A = random_stencil(k1, ["a", "b"], ["x", "y"], [(0, 0), (0, 1), (-1, 0)], n)
    B = random_stencil(k2, ["x", "y"], ["z"], [(0, 0), (1, -1)], n)
    x = {f: jax.random.normal(k, (n, n), jnp.float64)
         for f, k in zip(["x", "y", "z"], jax.random.split(k3, 3))}
    return A, B, x, n


def test_apply_matches_dense(ops):
    A, _, x, n = ops
    dense = A.to_dense()
    xv = np.concatenate([np.asarray(x[f]).ravel() for f in A.in_fields])
    expect = dense @ xv
    got = A.apply(x)
    gotv = np.concatenate([np.asarray(got[f]).ravel() for f in A.out_fields])
    np.testing.assert_allclose(gotv, expect, rtol=1e-12)


def test_compose_matches_dense_product(ops):
    A, B, x, n = ops
    AB = A @ B
    np.testing.assert_allclose(AB.to_dense(), A.to_dense() @ B.to_dense(),
                               rtol=1e-12, atol=1e-12)


def test_transpose_matches_dense(ops):
    A, _, _, _ = ops
    np.testing.assert_allclose(A.T.to_dense(), A.to_dense().T,
                               rtol=1e-12, atol=1e-12)


def test_double_transpose_identity(ops):
    A, _, _, _ = ops
    np.testing.assert_allclose(A.T.T.to_dense(), A.to_dense(),
                               rtol=1e-12, atol=1e-12)


def test_add_scale(ops):
    A, _, _, n = ops
    S = (2.0 * A) - A
    np.testing.assert_allclose(S.to_dense(), A.to_dense(), rtol=1e-12, atol=1e-12)


def test_pack_unpack_roundtrip(ops):
    A, _, x, n = ops
    v = A.pack(x, A.in_fields)
    back = A.unpack(v, A.in_fields)
    for f in A.in_fields:
        np.testing.assert_array_equal(np.asarray(back[f]), np.asarray(x[f]))


def test_shift_convention():
    x = jnp.arange(9.0).reshape(3, 3)
    # shift(x, dr, dc)[r, c] == x[(r+dr) % n, (c+dc) % n]
    s = shift(x, 1, 0)
    assert s[0, 0] == x[1, 0]
    s = shift(x, 0, -1)
    assert s[1, 1] == x[1, 0]
    s = shift(x, -1, 2)
    assert s[1, 1] == x[0, 0]


def test_diagonal_operator():
    n = 4
    d = jnp.arange(1.0, n * n + 1).reshape(n, n)
    D = diagonal_operator(("f",), {"f": d}, (n, n))
    dense = D.to_dense()
    np.testing.assert_allclose(dense, np.diag(np.asarray(d).ravel()))


def test_pytree_roundtrip(ops):
    A, _, x, _ = ops
    leaves, treedef = jax.tree_util.tree_flatten(A)
    A2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(A2.to_dense(), A.to_dense())

    # jit through the pytree
    @jax.jit
    def f(op, xx):
        return op.apply(xx)

    got = f(A, x)
    ref = A.apply(x)
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-12)


def test_to_dia_matches_csr_route():
    """Direct DIA export == DIAMatrix.from_csr(to_csr(), periodic=True)."""
    import numpy as np
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.ops.dia import DIAMatrix

    op = make_multiphase_operator(8, c=1.0, d=-1.0, xi=1.0,
                                  eta_n=100.0, eta_s=1.0, dtype=jnp.float32)
    ref = DIAMatrix.from_csr(op.A.to_csr(), periodic=True)
    got = op.A.to_dia()
    assert got.offsets == ref.offsets
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
    # matvec agreement on a random vector
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=ref.shape[0]).astype(np.float32))
    np.testing.assert_allclose(np.asarray(got.matvec(x)),
                               np.asarray(op.A.apply_packed(x)
                                          if hasattr(op.A, "apply_packed")
                                          else ref.matvec(x)), rtol=1e-5)
