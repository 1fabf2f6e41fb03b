"""Periodic stencil operators on structured grids — the TPU-native operator core.

The reference assembles every block (L, D, XI, G — reference preconditioner.py:86-297)
as a dense matrix filled by Python loops. On TPU the idiomatic representation is a
*stencil operator*: a small set of (field, offset) -> coefficient-array terms applied
to grid-shaped (n, n) arrays with `jnp.roll` shifts. XLA fuses the whole apply into a
handful of bandwidth-optimal elementwise kernels, and under a sharded mesh the rolls
lower to neighbor `collective-permute`s over ICI — no gather/scatter, no indices.

A `StencilOperator` is simultaneously:
  * a matrix-free apply (`.apply`) — the hot path;
  * a symbolic sparse matrix: `compose` (exact structured SpGEMM — the TPU analog of
    the reference's dense `np.matmul` products at solve.py:246-249), `transpose`,
    `add`, `scale`;
  * an exportable general sparse matrix (`.to_csr`) for ILU factorization and the
    generic SpMV/SpGEMM kernels in `mpbp_tpu.ops.sparse`.

Index convention: grid arrays are indexed [r, c] with r the row (y decreasing,
matching the reference's y = -(r+1/2)dy layout, reference utils.py:187) and c the
column (x increasing). A term (dr, dc, coef) contributes
    out[r, c] += coef[r, c] * x[(r+dr) % n, (c+dc) % n].
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """Return y with y[r, c] = x[(r+dr) % n, (c+dc) % n] (periodic)."""
    if dr == 0 and dc == 0:
        return x
    return jnp.roll(x, shift=(-dr, -dc), axis=(0, 1))


# terms: {(out_field, in_field): {(dr, dc): coef_array}}
Terms = dict[tuple[str, str], dict[tuple[int, int], jax.Array]]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StencilOperator:
    """A block operator between named grid fields, in stencil form.

    Attributes:
      out_fields: ordered output field names (block-row order).
      in_fields: ordered input field names (block-column order).
      terms: {(out_field, in_field): {(dr, dc): (n, n) coefficient array}}.
      shape_grid: (n_rows, n_cols) of the grid (square n x n in the reference).
    """

    out_fields: tuple[str, ...]
    in_fields: tuple[str, ...]
    terms: Terms
    shape_grid: tuple[int, int]

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self.terms.keys())
        offs = tuple(tuple(sorted(self.terms[k].keys())) for k in keys)
        leaves = [self.terms[k][o] for k, ks in zip(keys, offs) for o in ks]
        aux = (self.out_fields, self.in_fields, tuple(keys), offs, self.shape_grid)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        out_fields, in_fields, keys, offs, shape_grid = aux
        terms: Terms = {}
        it = iter(leaves)
        for k, ks in zip(keys, offs):
            terms[k] = {o: next(it) for o in ks}
        return cls(out_fields, in_fields, terms, shape_grid)

    # -- linear-algebra surface --------------------------------------------
    def apply(self, x: Mapping[str, jax.Array]) -> dict[str, jax.Array]:
        """Matrix-free y = A @ x on grid-shaped field dicts."""
        nr, nc = self.shape_grid
        out: dict[str, jax.Array] = {}
        for of in self.out_fields:
            acc = None
            for inf in self.in_fields:
                offmap = self.terms.get((of, inf))
                if not offmap:
                    continue
                xi = x[inf]
                for (dr, dc), coef in offmap.items():
                    contrib = coef * shift(xi, dr, dc)
                    acc = contrib if acc is None else acc + contrib
            if acc is None:
                acc = jnp.zeros(self.shape_grid, _any_dtype(self.terms))
            out[of] = acc
        return out

    def __call__(self, x: Mapping[str, jax.Array]) -> dict[str, jax.Array]:
        return self.apply(x)

    def apply_flux(self, x: Mapping[str, jax.Array]) -> dict[str, jax.Array]:
        """Difference-form apply: for same-field terms, compute
        sum_off c_off * (shift(x) - x) + rowsum * x instead of summing
        coefficient products directly. Exact in real arithmetic; in f32 it
        keeps near-constant (near-kernel) inputs evaluable when the stencil
        weights are large and cancelling (e.g. +-eta/dx^2 summing to ~c*theta
        — the assembled apply loses the near-kernel entirely, measured 26%
        relative error on a constant field at n=128). Cross-field terms are
        applied unchanged."""
        out: dict[str, jax.Array] = {}
        for of in self.out_fields:
            acc = None
            for inf in self.in_fields:
                offmap = self.terms.get((of, inf))
                if not offmap:
                    continue
                xi = x[inf]
                if inf == of:
                    # the row sum is itself a cancelling sum of the large
                    # weights — accumulate it in f64 (data-independent, so
                    # XLA folds it at compile time) and cast the small
                    # result back
                    rowsum = None
                    for coef in offmap.values():
                        c64 = coef.astype(jnp.float64)
                        rowsum = c64 if rowsum is None else rowsum + c64
                    rowsum = rowsum.astype(xi.dtype)
                    for (dr, dc), coef in offmap.items():
                        if (dr, dc) != (0, 0):
                            contrib = coef * (shift(xi, dr, dc) - xi)
                            acc = contrib if acc is None else acc + contrib
                    contrib = rowsum * xi
                    acc = contrib if acc is None else acc + contrib
                else:
                    for (dr, dc), coef in offmap.items():
                        contrib = coef * shift(xi, dr, dc)
                        acc = contrib if acc is None else acc + contrib
            if acc is None:
                acc = jnp.zeros(self.shape_grid, _any_dtype(self.terms))
            out[of] = acc
        return out

    def transpose(self) -> "StencilOperator":
        """Exact transpose: term (of, inf, dr, dc, coef) becomes
        (inf, of, -dr, -dc, shift(coef, -dr, -dc))."""
        terms: Terms = {}
        for (of, inf), offmap in self.terms.items():
            dst = terms.setdefault((inf, of), {})
            for (dr, dc), coef in offmap.items():
                key = (-dr, -dc)
                val = shift(coef, -dr, -dc)
                dst[key] = dst[key] + val if key in dst else val
        return StencilOperator(self.in_fields, self.out_fields, terms, self.shape_grid)

    @property
    def T(self) -> "StencilOperator":
        return self.transpose()

    def scale(self, alpha) -> "StencilOperator":
        terms = {
            k: {o: alpha * c for o, c in offmap.items()}
            for k, offmap in self.terms.items()
        }
        return StencilOperator(self.out_fields, self.in_fields, terms, self.shape_grid)

    def __mul__(self, alpha):
        return self.scale(alpha)

    __rmul__ = __mul__

    def __neg__(self):
        return self.scale(-1.0)

    def add(self, other: "StencilOperator") -> "StencilOperator":
        assert self.shape_grid == other.shape_grid
        out_fields = _merge_names(self.out_fields, other.out_fields)
        in_fields = _merge_names(self.in_fields, other.in_fields)
        terms: Terms = {k: dict(v) for k, v in self.terms.items()}
        for k, offmap in other.terms.items():
            dst = terms.setdefault(k, {})
            for o, c in offmap.items():
                dst[o] = dst[o] + c if o in dst else c
        return StencilOperator(out_fields, in_fields, terms, self.shape_grid)

    def __add__(self, other):
        return self.add(other)

    def __sub__(self, other):
        return self.add(other.scale(-1.0))

    def compose(self, other: "StencilOperator") -> "StencilOperator":
        """Exact structured SpGEMM: self @ other as a new stencil operator.

        (A@B)[r,c] term: A's term a at offset (p, q) applied to B's output means
        contribution a[r,c] * B_out[(r+p),(c+q)], and B's term b at (s, t) gives
        B_out[r',c'] = b[r',c'] * x[r'+s, c'+t]; so the composed coefficient is
        a[r,c] * b[(r+p),(c+q)] at total offset (p+s, q+t).

        This replaces the reference's dense GtG / GtFG products (solve.py:246-249)
        with an O(nnz) symbolic product whose result is again a bounded stencil.
        """
        assert self.shape_grid == other.shape_grid
        terms: Terms = {}
        for (of, mf), offA in self.terms.items():
            for (mf2, inf), offB in other.terms.items():
                if mf2 != mf:
                    continue
                dst = terms.setdefault((of, inf), {})
                for (p, q), a in offA.items():
                    for (s, t), b in offB.items():
                        key = (p + s, q + t)
                        val = a * shift(b, p, q)
                        dst[key] = dst[key] + val if key in dst else val
        return StencilOperator(self.out_fields, other.in_fields, terms, self.shape_grid)

    def __matmul__(self, other):
        if isinstance(other, StencilOperator):
            return self.compose(other)
        return self.apply(other)

    # -- export -------------------------------------------------------------
    def nnz_per_row_bound(self) -> int:
        """Max number of stencil taps feeding any output field (ELL width)."""
        per_out: dict[str, int] = {}
        for (of, _), offmap in self.terms.items():
            per_out[of] = per_out.get(of, 0) + len(offmap)
        return max(per_out.values()) if per_out else 0

    def to_csr(self, drop_tol: float = 0.0):
        """Export to a host CSR (mpbp_tpu.ops.sparse.CSRMatrix).

        Row order is block-by-field: [out_fields[0] rows (r*nc+c), out_fields[1]
        rows, ...] matching the reference's flat vector layout
        (reference utils.py:204-208: [un, vn, us, vs, p]).
        """
        from mpbp_tpu.ops.sparse import CSRMatrix

        nr, nc = self.shape_grid
        npts = nr * nc
        nrows = len(self.out_fields) * npts
        ncols = len(self.in_fields) * npts
        in_base = {f: i * npts for i, f in enumerate(self.in_fields)}

        rr, cc = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
        rows_list, cols_list, vals_list = [], [], []
        for oi, of in enumerate(self.out_fields):
            row_ids = (oi * npts + rr * nc + cc).ravel()
            for inf in self.in_fields:
                offmap = self.terms.get((of, inf))
                if not offmap:
                    continue
                for (dr, dc), coef in offmap.items():
                    col_ids = (
                        in_base[inf]
                        + ((rr + dr) % nr) * nc
                        + ((cc + dc) % nc)
                    ).ravel()
                    v = np.asarray(coef).ravel()
                    rows_list.append(row_ids)
                    cols_list.append(col_ids)
                    vals_list.append(v)
        rows = np.concatenate(rows_list)
        cols = np.concatenate(cols_list)
        vals = np.concatenate(vals_list)
        if drop_tol > 0.0:
            keep = np.abs(vals) > drop_tol
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
        return CSRMatrix.from_coo(nrows, ncols, rows, cols, vals)

    def to_dia(self, dtype=None):
        """Direct periodic-DIA export — no CSR intermediate.

        Equivalent to `DIAMatrix.from_csr(self.to_csr(), periodic=True)`
        (tests/test_stencil.py parity check) but skips the 55M-entry COO
        sort, which dominates large-grid setup (measured r3 at 1024^2:
        to_csr 51 s + from_csr 6 s vs ~10 s total here). Requires a square
        operator (offsets are (col - row) mod N).

        Pass 1 computes each stencil term's flat-diagonal offsets — a term
        (dr, dc) maps to at most 4 distinct offsets mod N, one per periodic
        wrap region — pass 2 scatter-adds coefficient planes into the
        (K, N) diagonal data array.
        """
        from mpbp_tpu.ops.dia import DIAMatrix

        nr, nc = self.shape_grid
        npts = nr * nc
        nrows = len(self.out_fields) * npts
        ncols = len(self.in_fields) * npts
        assert nrows == ncols, "DIA export requires a square operator"
        in_base = {f: i * npts for i, f in enumerate(self.in_fields)}
        rr, cc = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")

        def term_arrays(oi, inf, dr, dc):
            row_ids = (oi * npts + rr * nc + cc).ravel()
            col_ids = (
                in_base[inf]
                + ((rr + dr) % nr) * nc
                + ((cc + dc) % nc)
            ).ravel()
            return row_ids, (col_ids - row_ids) % nrows

        terms_flat = [
            (oi, inf, dr, dc, coef)
            for oi, of in enumerate(self.out_fields)
            for inf in self.in_fields
            for (dr, dc), coef in (self.terms.get((of, inf)) or {}).items()
        ]
        if not terms_flat:
            raise ValueError("to_dia: operator has no stencil terms")
        uniq = np.unique(np.concatenate([
            np.unique(term_arrays(oi, inf, dr, dc)[1])
            for oi, inf, dr, dc, _ in terms_flat]))
        if dtype is None:
            # promote over ALL term coefficients — an arbitrary first term
            # would raise StopIteration on an empty operator and np.add.at
            # silently downcasts mixed-dtype coefficients (advisor r3);
            # matches the CSR route's np.concatenate promotion
            dtype = np.result_type(*(np.asarray(coef).dtype
                                     for *_, coef in terms_flat))
        data = np.zeros((len(uniq), nrows), dtype=dtype)
        for oi, inf, dr, dc, coef in terms_flat:
            rows_, offs = term_arrays(oi, inf, dr, dc)
            np.add.at(data, (np.searchsorted(uniq, offs), rows_),
                      np.asarray(coef).ravel())
        return DIAMatrix((nrows, ncols), tuple(int(o) for o in uniq),
                         jnp.asarray(data))

    def to_dense(self) -> np.ndarray:
        """Dense export (tests/small grids only)."""
        return self.to_csr().to_dense()

    # -- vector packing -----------------------------------------------------
    def pack(self, x: Mapping[str, jax.Array], fields: Sequence[str] | None = None):
        fields = tuple(fields) if fields is not None else self.in_fields
        return jnp.concatenate([x[f].ravel() for f in fields])

    def unpack(self, v: jax.Array, fields: Sequence[str] | None = None):
        fields = tuple(fields) if fields is not None else self.in_fields
        nr, nc = self.shape_grid
        npts = nr * nc
        return {
            f: v[i * npts : (i + 1) * npts].reshape(nr, nc)
            for i, f in enumerate(fields)
        }


def _merge_names(a: Iterable[str], b: Iterable[str]) -> tuple[str, ...]:
    out = list(a)
    for x in b:
        if x not in out:
            out.append(x)
    return tuple(out)


def _any_dtype(terms: Terms):
    for offmap in terms.values():
        for c in offmap.values():
            return c.dtype
    return jnp.float32


def diagonal_operator(fields: Sequence[str], diags: Mapping[str, jax.Array],
                      shape_grid: tuple[int, int]) -> StencilOperator:
    """Block-diagonal stencil operator from per-field diagonal arrays."""
    fields = tuple(fields)
    terms: Terms = {(f, f): {(0, 0): diags[f]} for f in fields if f in diags}
    return StencilOperator(fields, fields, terms, shape_grid)
