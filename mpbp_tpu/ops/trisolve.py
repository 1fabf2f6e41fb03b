"""Sparse triangular solves on TPU via wavefront level scheduling.

The reference applies its ILUT factors through ilupp's sequential C++
triangular solves (reference solve.py:258, 265, 271, 274). A sequential solve
is hostile to TPU; the standard parallel formulation is *level scheduling*:
rows are grouped into wavefront levels such that all rows in a level depend
only on earlier levels, so each level is one data-parallel gather + reduce.
On the reference's structured-grid matrices the levels are (anti-)diagonal
wavefronts, ~2n levels for an n x n grid (SURVEY.md section 7 'hard parts').

Setup (host, via the native C++ `level_schedule`): compute per-row levels,
sort rows by level, pad each row to the max nnz/row (ELL), and pad the row
stream so every level can be processed with one fixed-width window — static
shapes, as XLA requires. Apply (device): `lax.fori_loop` over levels; each
step gathers the already-computed x entries, reduces the row, and scatters
the new x values. Memory traffic is ~2x nnz total.

Also provided: `neumann_trisolve` — a fixed-sweep Jacobi/truncated-Neumann
approximate triangular solve (fully parallel, no levels) for when latency
matters more than exactness; FGMRES is flexible, so using it as an inner
solve only shifts outer iteration counts.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mpbp_tpu.native import level_schedule


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LevelTriSolve:
    """Level-scheduled triangular solve plan (pytree; device-resident data).

    Rows are sorted by level. Arrays are padded so each level occupies
    exactly `width` slots starting at level_start[lev] — padded slots carry
    row id == n (a dummy row) and value 0 contributions.

    unit_diag: L from ILUT has an implicit unit diagonal; U stores its
    diagonal separately in `diag`.
    """

    n: int
    n_levels: int
    width: int                 # max rows in any level
    rows_sorted: jax.Array     # (P,) int32, dummy = n
    cols: jax.Array            # (P, K) int32, padded self-reference
    vals: jax.Array            # (P, K), padded 0
    diag: jax.Array            # (P,) diagonal (1 for unit), aligned with rows
    level_start: jax.Array     # (n_levels,) int32 offsets into padded stream

    def tree_flatten(self):
        leaves = (self.rows_sorted, self.cols, self.vals, self.diag,
                  self.level_start)
        return leaves, (self.n, self.n_levels, self.width)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], aux[2], *leaves)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_csr(cls, indptr, indices, vals, is_upper: bool,
                 diag_vals=None, dtype=jnp.float64) -> "LevelTriSolve":
        """Build from a strictly-triangular CSR part plus optional separate
        diagonal (ILUT layout: L strictly lower w/ unit diag, U's diag first).

        If `diag_vals` is None the matrix is treated as unit-diagonal.
        `indices`/`vals` must NOT contain the diagonal.
        """
        n = len(indptr) - 1
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int32)
        vals_np = np.asarray(vals, np.float64)

        levels, n_levels = level_schedule(indptr, indices, is_upper)
        n_levels = max(n_levels, 1)
        order = np.argsort(levels, kind="stable")
        counts = np.bincount(levels, minlength=n_levels)
        width = int(counts.max()) if n else 1

        K = int(np.diff(indptr).max()) if n else 1
        K = max(K, 1)

        # per-level padded layout (vectorized: factors can have ~1e6 rows)
        P = n_levels * width
        rows_sorted = np.full(P, n, np.int32)
        cols = np.full((P, K), 0, np.int32)
        vmat = np.zeros((P, K), np.float64)
        diag = np.ones(P, np.float64)
        dv = (np.asarray(diag_vals, np.float64)
              if diag_vals is not None else np.ones(n))

        starts = np.zeros(n_levels + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        # slot of each sorted row within its level = rank - level start
        lev_of_sorted = levels[order]
        slot = np.arange(n, dtype=np.int64) - starts[lev_of_sorted]
        pos = lev_of_sorted.astype(np.int64) * width + slot
        rows_sorted[pos] = order
        diag[pos] = dv[order]
        # scatter nnz into the padded ELL: for each nonzero p of row idx, its
        # destination is (pos_of_row[idx], p - indptr[idx]).
        row_of_nnz = np.repeat(np.arange(n), np.diff(indptr))
        pos_of_row = np.empty(n, np.int64)
        pos_of_row[order] = pos
        local = np.arange(indptr[-1], dtype=np.int64) - np.repeat(
            indptr[:-1], np.diff(indptr))
        cols[pos_of_row[row_of_nnz], local] = indices
        vmat[pos_of_row[row_of_nnz], local] = vals_np

        level_start = (np.arange(n_levels) * width).astype(np.int32)
        return cls(
            n=n, n_levels=n_levels, width=width,
            rows_sorted=jnp.asarray(rows_sorted),
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vmat, dtype),
            diag=jnp.asarray(diag, dtype),
            level_start=jnp.asarray(level_start),
        )

    # -- apply --------------------------------------------------------------
    def solve(self, b: jax.Array) -> jax.Array:
        """Solve T x = b where T is the (unit-)triangular matrix."""
        n, W = self.n, self.width

        x = jnp.zeros(n + 1, b.dtype)  # slot n is the dummy row

        def body(lev, x):
            st = self.level_start[lev]
            zero = jnp.zeros((), st.dtype)
            rows = jax.lax.dynamic_slice(self.rows_sorted, (st,), (W,))
            cols = jax.lax.dynamic_slice(self.cols, (st, zero),
                                         (W, self.cols.shape[1]))
            vals = jax.lax.dynamic_slice(self.vals, (st, zero),
                                         (W, self.vals.shape[1]))
            dg = jax.lax.dynamic_slice(self.diag, (st,), (W,))
            bx = b[jnp.minimum(rows, n - 1)]
            acc = jnp.sum(vals * x[cols], axis=1)
            xnew = (bx - acc) / dg
            return x.at[rows].set(jnp.where(rows < n, xnew, x[rows]))

        x = jax.lax.fori_loop(0, self.n_levels, body, x)
        return x[:n]


def neumann_trisolve(strict_ell_cols: jax.Array, strict_ell_vals: jax.Array,
                     diag: jax.Array, b: jax.Array, sweeps: int) -> jax.Array:
    """Approximate triangular solve by Jacobi sweeps on (D + S) x = b with S
    the strictly-triangular part in ELL form: x_{k+1} = D^-1 (b - S x_k).
    Converges exactly after `n_levels` sweeps; truncation yields an
    approximate inner solve (fully parallel, no wavefront latency)."""
    inv_d = 1.0 / diag

    def body(_, x):
        sx = jnp.sum(strict_ell_vals * x[strict_ell_cols], axis=1)
        return inv_d * (b - sx)

    return jax.lax.fori_loop(0, sweeps, body, inv_d * b)


def strict_ell_from_csr(indptr, indices, vals, n: int, dtype=jnp.float64):
    """(cols, vals) ELL arrays of a strictly-triangular CSR part, padded
    with self-references carrying value 0 — the neumann_trisolve operand
    layout. Vectorized (factors reach ~1e6 rows)."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int32)
    vals_np = np.asarray(vals, np.float64)
    counts = np.diff(indptr)
    K = max(1, int(counts.max()) if n else 1)
    cols = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, K))
    vmat = np.zeros((n, K))
    r = np.repeat(np.arange(n), counts)
    slot = np.arange(len(indices), dtype=np.int64) - np.repeat(
        indptr[:-1], counts)
    cols[r, slot] = indices
    vmat[r, slot] = vals_np
    return jnp.asarray(cols), jnp.asarray(vmat, dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NeumannTriSolve:
    """Fixed-sweep approximate triangular solve plan — the TPU-latency
    alternative to LevelTriSolve: no ~2n-level wavefront sequencing, just
    `sweeps` fully-parallel ELL SpMV passes. Legal as an inner solve under
    the flexible outer Krylov method at the cost of extra outer iterations
    (the trade measured by benchmarks/kernels_tpu.py / solve_tpu.py).

    On TPU the sweep SpMV dispatches to the banded-ELL Pallas kernel when the
    strict triangle fits its gate (ops/pallas_ell.py): the generic
    `x[cols]` row-gather form lowers to ~ms-scale dynamic gathers on chip
    (measured 15 ms/sweep at N=16k in r3), while the banded kernel's in-lane
    rolls are bandwidth-bound. `bell` carries the banded form; it is None
    when unsupported (or off-TPU), falling back to the gather sweeps."""

    n: int
    sweeps: int
    cols: jax.Array     # (n, K) int32, self-reference padded
    vals: jax.Array     # (n, K), padded 0
    diag: jax.Array     # (n,)
    bell: object | None = None     # BandedELL of the strict triangle

    def tree_flatten(self):
        return (self.cols, self.vals, self.diag, self.bell), \
            (self.n, self.sweeps)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], *leaves)

    @classmethod
    def from_csr(cls, indptr, indices, vals, sweeps: int,
                 diag_vals=None, dtype=jnp.float64) -> "NeumannTriSolve":
        """Same contract as LevelTriSolve.from_csr: strictly-triangular CSR
        (no diagonal), optional separate diagonal (None = unit)."""
        from mpbp_tpu.ops.pallas_ell import BandedELL, ell_spmv_supported
        from mpbp_tpu.ops.sparse import CSRMatrix

        n = len(indptr) - 1
        cols, vmat = strict_ell_from_csr(indptr, indices, vals, n, dtype)
        dv = (np.asarray(diag_vals, np.float64)
              if diag_vals is not None else np.ones(n))
        bell = None
        if (jax.devices()[0].platform == "tpu"
                and jnp.dtype(dtype) == jnp.float32 and n % 128 == 0):
            cand = BandedELL.from_csr(CSRMatrix(
                (n, n), jnp.asarray(np.asarray(indptr)),
                jnp.asarray(np.asarray(indices)),
                jnp.asarray(np.asarray(vals, np.float32))))
            if ell_spmv_supported(cand, jnp.float32):
                bell = cand
        return cls(n=n, sweeps=sweeps, cols=cols, vals=vmat,
                   diag=jnp.asarray(dv, dtype), bell=bell)

    def solve(self, b: jax.Array) -> jax.Array:
        if self.bell is not None:
            from mpbp_tpu.ops.pallas_ell import ell_spmv_pallas

            return neumann_sweeps_with(ell_spmv_pallas(self.bell),
                                       self.diag, b, self.sweeps)
        return neumann_trisolve(self.cols, self.vals, self.diag, b,
                                self.sweeps)


def neumann_sweeps_with(strict_mv: Callable, diag: jax.Array, b: jax.Array,
                        sweeps: int) -> jax.Array:
    """The Neumann/Jacobi sweep recurrence x_{k+1} = D^-1 (b - S x_k) with
    the strictly-triangular SpMV supplied as a callable (the banded-ELL
    Pallas kernel on TPU; any parity-equivalent matvec in tests)."""
    inv_d = 1.0 / diag

    def body(_, x):
        return inv_d * (b - strict_mv(x))

    return jax.lax.fori_loop(0, sweeps, body, inv_d * b)
