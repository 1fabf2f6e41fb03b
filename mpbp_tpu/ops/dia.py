"""DIA (diagonal-offset) sparse format — the gather-free TPU format.

Stencil-born matrices have all nonzeros on O(1) fixed diagonals (the flat
index offsets of their stencil taps). Storing them by diagonal turns SpMV
into shift + multiply + add: no index gathers at all, only lane-aligned
rolls — the operation TPUs do at full bandwidth. This is the general-matrix
bridge between the structured StencilOperator world and CSR/ELL: any matrix
whose nonzeros concentrate on few diagonals (A, F, GtG, GtFG, banded ILU
factors of small grids) converts losslessly.

Convention: data[k, i] = A[i, (i + offsets[k]) mod ncols] for square
periodic matrices; for general matrices, out-of-band positions store 0 so
the wrapped product vanishes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DIAMatrix:
    shape: tuple[int, int]
    offsets: tuple[int, ...]     # static
    data: jax.Array              # (n_diags, nrows)

    def tree_flatten(self):
        return (self.data,), (self.shape, self.offsets)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], leaves[0])

    @property
    def nnz(self):
        return int(jnp.count_nonzero(self.data))

    @classmethod
    def from_csr(cls, csr, periodic: bool = False) -> "DIAMatrix":
        """Convert a CSR matrix; offset = (col - row) mod ncols if periodic
        else col - row. Efficient only when few distinct offsets exist."""
        indptr, indices, vals = csr.host_arrays()
        nrows, ncols = csr.shape
        rows = np.repeat(np.arange(nrows), np.diff(indptr))
        if periodic:
            offs = (indices.astype(np.int64) - rows) % ncols
        else:
            offs = indices.astype(np.int64) - rows
        uniq = np.unique(offs)
        data = np.zeros((len(uniq), nrows), dtype=np.asarray(vals).dtype)
        # vectorized scatter-add (a per-nonzero Python loop here costs
        # minutes at the 1024^2-scale matrices, ~60M nnz)
        okeys = np.searchsorted(uniq, offs)
        np.add.at(data, (okeys, rows), np.asarray(vals))
        return cls(csr.shape, tuple(int(o) for o in uniq), jnp.asarray(data))

    def matvec(self, x: jax.Array) -> jax.Array:
        """y[i] = sum_k data[k, i] * x[(i + off_k) mod n] — pure shifts."""
        nrows, ncols = self.shape
        acc = None
        for k, off in enumerate(self.offsets):
            xs = jnp.roll(x, -off) if off else x
            if nrows <= ncols:
                contrib = self.data[k] * xs[:nrows]
            else:
                contrib = self.data[k] * jnp.pad(xs, (0, nrows - ncols))
            acc = contrib if acc is None else acc + contrib
        return acc

    def to_dense(self) -> np.ndarray:
        d = np.zeros(self.shape, np.asarray(self.data).dtype)
        nrows, ncols = self.shape
        for k, off in enumerate(self.offsets):
            for i in range(nrows):
                j = (i + off) % ncols
                v = float(self.data[k, i])
                if v != 0.0:
                    d[i, j] += v
        return d
