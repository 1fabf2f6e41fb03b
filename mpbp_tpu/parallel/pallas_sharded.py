"""Per-shard Pallas fused apply under shard_map — the multi-chip hero path.

`sharded_solve` (parallel/sharding.py) runs the XLA roll-based fused apply
under auto-SPMD: correct, but each jnp.roll lowers to its own
collective-permute + materialized shifted plane, so per iteration a device
pays O(#shifts) small collectives and the same ~85 GB/s-class fusion ceiling
the single-chip XLA path measured (models/fused.py docstring). This module
instead runs the hand-fused Pallas row-band kernel (ops/pallas_stencil.py,
681 Gnnz/s measured single-chip at n=512) on each device's local rows:

  * the stacked state (5, n, n) is row-sharded P(None, 'x', None) —
    unchanged from parallel/sharding.py's layout;
  * per matvec, each shard ppermutes its edge rows to both neighbors
    (2 neighbor collectives total, H rows each — the minimum halo traffic,
    riding ICI) and concatenates them around its local band;
  * the extended band goes through `build_fused_tile_call`, ONE Pallas
    kernel per device per matvec.

Theta never moves at solve time: the +-H-extended per-shard theta bands are
precomputed at setup as a (P, loc+2H, n) stack sharded on the leading axis.

Reference role: this is the distributed form of the reference's only hot
loop (reference solve.py:285's gmres over the assembled A); the reference
itself has no parallel execution at all (SURVEY.md section 2.4).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpbp_tpu.models.multiphase import MultiphaseOperator
from mpbp_tpu.ops.pallas_stencil import _H, build_fused_tile_call


def pallas_sharded_supported(op: MultiphaseOperator, mesh: Mesh,
                             axis: str = "x") -> bool:
    """Shape gate: each device's row band must hold whole 8-row sublane
    tiles (the kernel's halo/DMA unit)."""
    n = op.grid.n
    nd = int(mesh.shape[axis])
    loc = n // nd
    return n % nd == 0 and loc % _H == 0 and loc >= _H


def make_fused_apply_pallas_sharded(op: MultiphaseOperator, mesh: Mesh,
                                    axis: str = "x",
                                    interpret: bool | None = None,
                                    block_rows: int = 64) -> Callable:
    """Build `mv(v)` on stacked (5, n, n) vectors sharded P(None, axis, None):
    ppermute halo exchange + one per-device Pallas fused-apply kernel.

    interpret=None auto-selects interpret mode off-TPU (the virtual CPU mesh
    used by tests and the driver dryrun)."""
    assert pallas_sharded_supported(op, mesh, axis), (op.grid.n, dict(mesh.shape))
    n = op.grid.n
    nd = int(mesh.shape[axis])
    loc = n // nd
    H = _H
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # per-shard theta bands with periodic +-H halo rows, stacked on a
    # leading device axis: inside shard_map each device sees (1, loc+2H, n)
    Tn = np.asarray(op.phase_n.cell)
    bands = np.stack([
        Tn[(np.arange(s * loc - H, (s + 1) * loc + H)) % n, :]
        for s in range(nd)])
    tn_bands = jax.device_put(
        jnp.asarray(bands), NamedSharding(mesh, P(axis, None, None)))
    wsh = NamedSharding(mesh, P(axis, None))
    Wnx = jax.device_put(op.phase_n.xface_pt, wsh)
    Wny = jax.device_put(op.phase_n.yface_pt, wsh)

    call = build_fused_tile_call(loc, n, op.phase_n.cell.dtype, op.params,
                                 op.grid.dx, op.grid.dy,
                                 block_rows=block_rows, interpret=interpret)
    fwd = [(j, (j + 1) % nd) for j in range(nd)]   # my bottom rows -> next
    bwd = [(j, (j - 1) % nd) for j in range(nd)]   # my top rows -> prev

    def local_mv(tn_band, wnx, wny, v):
        # v: (5, loc, n) local band. Top halo = previous shard's last H rows,
        # bottom halo = next shard's first H rows (periodic over the ring).
        top = jax.lax.ppermute(v[:, loc - H:, :], axis, perm=fwd)
        bot = jax.lax.ppermute(v[:, :H, :], axis, perm=bwd)
        x_ext = jnp.concatenate([top, v, bot], axis=1)
        return call(tn_band[0], wnx, wny, x_ext)

    shmap = jax.shard_map(
        local_mv, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(axis, None),
                  P(None, axis, None)),
        out_specs=P(None, axis, None),
        check_vma=False)  # pallas_call outputs carry no vma annotation

    def mv(v):
        return shmap(tn_bands, Wnx, Wny, v)

    return mv
