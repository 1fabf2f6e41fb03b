"""Distributed generic SpMV: row-partitioned DIA matvec under shard_map.

parallel/halo.py distributes the *structured* stencil apply; this module is
the generic-sparse counterpart (SURVEY.md section 2.2 row 1: the sharded
sparse-matrix type replacing the reference's PETSc Mat, reference
solve.py:113-122). The matrix payload `data` (K, N) — the dominant memory —
is partitioned by row band over the mesh axis; x is a sharded vector.

Two communication regimes, chosen statically from the offsets:

* **banded** (max |signed offset| <= local band): exchange fixed-width halo
  segments with the two ring neighbors via `ppermute`; every per-diagonal
  access is then a *static* slice of the extended local band — the same
  neighbor-only ICI pattern as the stencil halo apply, at generic-matrix
  generality.
* **global** (offsets couple distant blocks, e.g. the 5-field saddle-point
  A whose u<->p couplings sit ~n^2..4n^2 away): `all_gather` x (N values —
  small next to the K*N matrix payload) and read each diagonal through one
  dynamic slice of the doubled gathered vector.

Both paths compute y[i] = sum_k data[k,i] * x[(i + off_k) mod N] exactly as
DIAMatrix.matvec (ops/dia.py) on square periodic matrices.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpbp_tpu.ops.dia import DIAMatrix


def _signed_offsets(offsets, N: int) -> list[int]:
    """Normalize periodic offsets to the symmetric range [-N/2, N/2)."""
    return [((int(o) + N // 2) % N) - N // 2 for o in offsets]


def shard_dia(A: DIAMatrix, mesh: Mesh, axis: str = "x") -> DIAMatrix:
    """Lay the diagonal payload out row-banded over the mesh axis."""
    sh = NamedSharding(mesh, P(None, axis))
    return DIAMatrix(A.shape, A.offsets, jax.device_put(A.data, sh))


def sharded_dia_matvec(A: DIAMatrix, mesh: Mesh, axis: str = "x") -> Callable:
    """Build mv(x) -> A @ x with x and y sharded P(axis) over the mesh.

    The communication pattern (banded halo vs all-gather) is fixed at trace
    time from the offsets; see module docstring.
    """
    N, ncols = A.shape
    assert N == ncols, "sharded DIA matvec requires a square matrix"
    ndev = mesh.shape[axis]
    assert N % ndev == 0, (N, ndev)
    L = N // ndev
    soffs = _signed_offsets(A.offsets, N)
    halo_lo = max((-s for s in soffs if s < 0), default=0)
    halo_hi = max((s for s in soffs if s > 0), default=0)
    banded = halo_lo <= L and halo_hi <= L

    fwd = [(d, (d + 1) % ndev) for d in range(ndev)]   # send toward +1
    bwd = [(d, (d - 1) % ndev) for d in range(ndev)]

    def _local_banded(d_loc, x_loc):
        # halo from the previous band (covers negative offsets) and the next
        # band (positive offsets); neighbor-only ICI, issued before any
        # compute so the scheduler can overlap
        parts = [x_loc]
        if halo_lo:
            parts.insert(0, jax.lax.ppermute(x_loc[-halo_lo:], axis, fwd))
        if halo_hi:
            parts.append(jax.lax.ppermute(x_loc[:halo_hi], axis, bwd))
        ext = jnp.concatenate(parts) if len(parts) > 1 else x_loc
        acc = None
        for k, s in enumerate(soffs):
            sl = jax.lax.slice_in_dim(ext, halo_lo + s, halo_lo + s + L)
            contrib = d_loc[k] * sl
            acc = contrib if acc is None else acc + contrib
        return acc

    def _local_global(d_loc, x_loc):
        xg = jax.lax.all_gather(x_loc, axis, tiled=True)       # (N,)
        x2 = jnp.concatenate([xg, xg])
        base = jax.lax.axis_index(axis) * L
        acc = None
        for k, off in enumerate(A.offsets):
            start = base + (int(off) % N)
            sl = jax.lax.dynamic_slice(x2, (start,), (L,))
            contrib = d_loc[k] * sl
            acc = contrib if acc is None else acc + contrib
        return acc

    local = _local_banded if banded else _local_global
    shmapped = jax.shard_map(local, mesh=mesh,
                             in_specs=(P(None, axis), P(axis)),
                             out_specs=P(axis))

    def mv(x: jax.Array) -> jax.Array:
        return shmapped(A.data, x)

    return mv
