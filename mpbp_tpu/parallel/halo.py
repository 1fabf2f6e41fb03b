"""Explicit halo-exchange stencil apply under `shard_map`.

The auto-SPMD path (parallel/sharding.py) lets XLA turn `jnp.roll` into
collective-permutes. This module is the hand-scheduled equivalent: each device
holds a contiguous band of grid rows, exchanges +-H halo rows with its ring
neighbors via `jax.lax.ppermute`, and applies the stencil locally — the
pattern SURVEY.md section 2.4 calls the ring/CP analog. Doing it explicitly
lets us (a) batch the halo rows of all fields into one transfer per direction
and (b) overlap the exchange with the interior compute (the halo is only
needed for the first/last H rows of the band).
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mpbp_tpu.ops.stencil import StencilOperator


def halo_width(op: StencilOperator) -> int:
    """Max |row offset| over all stencil terms."""
    H = 0
    for offmap in op.terms.values():
        for (dr, _dc) in offmap.keys():
            H = max(H, abs(dr))
    return H


def halo_stencil_apply(op: StencilOperator, mesh: Mesh, axis: str = "x"):
    """Build a shard_map'd apply(x_dict) -> y_dict with explicit halo
    exchange. Equivalent to op.apply under a P(axis, None) row partition."""
    H = halo_width(op)
    ndev = mesh.shape[axis]
    nr, nc = op.shape_grid
    assert nr % ndev == 0, (nr, ndev)
    nl = nr // ndev
    assert H <= nl, f"halo {H} exceeds local rows {nl}"

    fwd = [(d, (d + 1) % ndev) for d in range(ndev)]   # send down ring
    bwd = [(d, (d - 1) % ndev) for d in range(ndev)]   # send up ring

    spec = P(axis, None)

    def _extend(a):
        """(nl, nc) -> (nl + 2H, nc) with periodic ring halos."""
        if H == 0:
            return a
        # my top halo = the H last rows of the device above me
        top = jax.lax.ppermute(a[-H:], axis, fwd)
        # my bottom halo = the H first rows of the device below me
        bot = jax.lax.ppermute(a[:H], axis, bwd)
        return jnp.concatenate([top, a, bot], axis=0)

    def _local_apply(op_local: StencilOperator, x: Mapping[str, jax.Array]):
        # Batch all fields' halo exchanges into a single stacked transfer.
        in_fields = op_local.in_fields
        stacked = jnp.stack([x[f] for f in in_fields])      # (F, nl, nc)
        if H > 0:
            top = jax.lax.ppermute(stacked[:, -H:, :], axis, fwd)
            bot = jax.lax.ppermute(stacked[:, :H, :], axis, bwd)
            ext = jnp.concatenate([top, stacked, bot], axis=1)
        else:
            ext = stacked
        xe = {f: ext[i] for i, f in enumerate(in_fields)}

        out = {}
        for of in op_local.out_fields:
            acc = None
            for inf in in_fields:
                offmap = op_local.terms.get((of, inf))
                if not offmap:
                    continue
                for (dr, dc), coef in offmap.items():
                    sl = jax.lax.slice_in_dim(xe[inf], H + dr, H + dr + nl,
                                              axis=0)
                    if dc != 0:
                        sl = jnp.roll(sl, -dc, axis=1)
                    contrib = coef * sl
                    acc = contrib if acc is None else acc + contrib
            out[of] = acc if acc is not None else jnp.zeros((nl, nc),
                                                            stacked.dtype)
        return out

    shmapped = jax.shard_map(
        _local_apply, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )

    def apply(x: Mapping[str, jax.Array]) -> dict:
        return shmapped(op, x)

    return apply
