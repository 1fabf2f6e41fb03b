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


def halo_width_cols(op: StencilOperator) -> int:
    """Max |column offset| over all stencil terms."""
    W = 0
    for offmap in op.terms.values():
        for (_dr, dc) in offmap.keys():
            W = max(W, abs(dc))
    return W


def halo_stencil_apply_2d(op: StencilOperator, mesh: Mesh,
                          axes: Sequence[str] = ("x", "y")):
    """2-D grid partition: apply(x_dict) -> y_dict with BOTH-axes halo
    exchange (SURVEY.md section 7 step 6 "2-D mesh later"; VERDICT r4
    missing #5). Each device owns an (n/Pr, n/Pc) patch of every field.

    Why it exists: a 1-D row band thins to <= 32 rows at 64+ devices on a
    2048-row grid and the halo fraction grows as P/n; the 2-D partition's
    halo fraction scales as sqrt-of-that, keeping the surface-to-volume
    ratio bounded at pod scale.

    Corner handling without diagonal transfers: exchange row halos first,
    then exchange the COLUMN halos of the row-EXTENDED block — the corner
    patches ride the second transfer (the standard two-phase scheme; each
    direction is one ring `ppermute` with all fields batched). Periodic
    wraparound falls out of the ring permutes; a single-device axis
    degenerates to an identity permute, which is exactly the periodic
    self-wrap.
    """
    axr, axc = axes
    H = halo_width(op)
    W = halo_width_cols(op)
    ndr, ndc = mesh.shape[axr], mesh.shape[axc]
    nr, nc = op.shape_grid
    assert nr % ndr == 0 and nc % ndc == 0, (op.shape_grid, ndr, ndc)
    nl, ml = nr // ndr, nc // ndc
    assert H <= nl and W <= ml, ((H, nl), (W, ml))

    fwd_r = [(d, (d + 1) % ndr) for d in range(ndr)]
    bwd_r = [(d, (d - 1) % ndr) for d in range(ndr)]
    fwd_c = [(d, (d + 1) % ndc) for d in range(ndc)]
    bwd_c = [(d, (d - 1) % ndc) for d in range(ndc)]

    spec = P(axr, axc)

    def _local_apply(op_local: StencilOperator, x: Mapping[str, jax.Array]):
        in_fields = op_local.in_fields
        stacked = jnp.stack([x[f] for f in in_fields])     # (F, nl, ml)
        dtype = stacked.dtype

        ext = stacked
        if H:
            top = jax.lax.ppermute(ext[:, -H:, :], axr, fwd_r)
            bot = jax.lax.ppermute(ext[:, :H, :], axr, bwd_r)
            ext = jnp.concatenate([top, ext, bot], axis=1)
        if W:
            # exchanging strips of the row-extended block carries the
            # corner halos — no diagonal permute needed
            left = jax.lax.ppermute(ext[:, :, -W:], axc, fwd_c)
            right = jax.lax.ppermute(ext[:, :, :W], axc, bwd_c)
            ext = jnp.concatenate([left, ext, right], axis=2)

        xe = {f: ext[i] for i, f in enumerate(in_fields)}
        out = {}
        for of in op_local.out_fields:
            acc = None
            for inf in in_fields:
                offmap = op_local.terms.get((of, inf))
                if not offmap:
                    continue
                for (dr, dc), coef in offmap.items():
                    sl = jax.lax.slice(
                        xe[inf], (H + dr, W + dc),
                        (H + dr + nl, W + dc + ml))
                    contrib = coef * sl
                    acc = contrib if acc is None else acc + contrib
            out[of] = acc if acc is not None else jnp.zeros((nl, ml), dtype)
        return out

    shmapped = jax.shard_map(
        _local_apply, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )

    def apply(x: Mapping[str, jax.Array]) -> dict:
        return shmapped(op, x)

    return apply


def halo_stencil_apply(op: StencilOperator, mesh: Mesh, axis: str = "x",
                       overlap: bool = True):
    """Build a shard_map'd apply(x_dict) -> y_dict with explicit halo
    exchange. Equivalent to op.apply under a P(axis, None) row partition.

    With ``overlap=True`` (default) the interior rows — which need no remote
    data — are computed from purely local slices with no data dependence on
    the `ppermute`s, so XLA's latency-hiding scheduler can run the ICI
    transfer concurrently with the interior stencil work (SURVEY.md section 7
    hard-part #4); only the first/last H output rows consume the halos. With
    ``overlap=False`` the halos are concatenated up front and the whole band
    is computed in one pass (simpler schedule; the transfer serializes ahead
    of all compute).
    """
    H = halo_width(op)
    ndev = mesh.shape[axis]
    nr, nc = op.shape_grid
    assert nr % ndev == 0, (nr, ndev)
    nl = nr // ndev
    assert H <= nl, f"halo {H} exceeds local rows {nl}"
    if nl < 2 * H:
        overlap = False        # no interior rows to overlap with

    fwd = [(d, (d + 1) % ndev) for d in range(ndev)]   # send down ring
    bwd = [(d, (d - 1) % ndev) for d in range(ndev)]   # send up ring

    spec = P(axis, None)

    def _seg_apply(op_local: StencilOperator, ext, in_fields, nrows, pad,
                   dtype):
        """Stencil on an extended stack `ext` of shape (F, nrows + 2*pad, nc):
        output row r reads ext rows pad + r + dr; columns roll periodically
        in-row (the column direction is never sharded)."""
        xe = {f: ext[i] for i, f in enumerate(in_fields)}
        out = {}
        for of in op_local.out_fields:
            acc = None
            for inf in in_fields:
                offmap = op_local.terms.get((of, inf))
                if not offmap:
                    continue
                for (dr, dc), coef in offmap.items():
                    sl = jax.lax.slice_in_dim(xe[inf], pad + dr,
                                              pad + dr + nrows, axis=0)
                    if dc != 0:
                        sl = jnp.roll(sl, -dc, axis=1)
                    contrib = coef * sl   # coef planes are full local bands
                    acc = contrib if acc is None else acc + contrib
            out[of] = acc if acc is not None else jnp.zeros((nrows, nc),
                                                            dtype)
        return out

    def _local_apply(op_local: StencilOperator, x: Mapping[str, jax.Array]):
        # Batch all fields' halo exchanges into a single stacked transfer
        # per ring direction.
        in_fields = op_local.in_fields
        stacked = jnp.stack([x[f] for f in in_fields])      # (F, nl, nc)
        dtype = stacked.dtype

        if H == 0:
            return _seg_apply(op_local, stacked, in_fields, nl, 0, dtype)

        # issue both ring transfers first; nothing below depends on them
        # until the boundary segments, so interior compute overlaps the ICI
        # hop under the latency-hiding scheduler
        top = jax.lax.ppermute(stacked[:, -H:, :], axis, fwd)
        bot = jax.lax.ppermute(stacked[:, :H, :], axis, bwd)

        if not overlap:
            ext = jnp.concatenate([top, stacked, bot], axis=1)
            return _seg_apply(op_local, ext, in_fields, nl, H, dtype)

        # interior: output rows [H, nl-H) read stacked rows [0, nl) only
        interior = _crop_coefs_apply(op_local, stacked, in_fields, nl, H,
                                     dtype)

        # boundary segments (each H output rows, needing the remote halos)
        ext_top = jnp.concatenate([top, stacked[:, :2 * H, :]], axis=1)
        ext_bot = jnp.concatenate([stacked[:, -2 * H:, :], bot], axis=1)
        top_out = _boundary_apply(op_local, ext_top, in_fields, H, H, 0,
                                  dtype, nc)
        bot_out = _boundary_apply(op_local, ext_bot, in_fields, H, H, nl - H,
                                  dtype, nc)
        return {of: jnp.concatenate([top_out[of], interior[of], bot_out[of]],
                                    axis=0)
                for of in op_local.out_fields}

    def _crop_coefs_apply(op_local, stacked, in_fields, nl, H, dtype):
        """Interior segment: output rows [H, nl-H); coefficient planes are
        cropped to those rows."""
        nrows = nl - 2 * H
        xe = {f: stacked[i] for i, f in enumerate(in_fields)}
        out = {}
        for of in op_local.out_fields:
            acc = None
            for inf in in_fields:
                offmap = op_local.terms.get((of, inf))
                if not offmap:
                    continue
                for (dr, dc), coef in offmap.items():
                    sl = jax.lax.slice_in_dim(xe[inf], H + dr, H + dr + nrows,
                                              axis=0)
                    if dc != 0:
                        sl = jnp.roll(sl, -dc, axis=1)
                    c = jax.lax.slice_in_dim(coef, H, nl - H, axis=0)
                    contrib = c * sl
                    acc = contrib if acc is None else acc + contrib
            out[of] = acc if acc is not None else jnp.zeros((nrows, nc),
                                                            dtype)
        return out

    def _boundary_apply(op_local, ext, in_fields, nrows, pad, row0, dtype,
                        nc):
        """Boundary segment: `ext` covers output rows [row0, row0+nrows) with
        `pad` extra rows each side; coefficient planes are cropped to the
        segment's global rows."""
        xe = {f: ext[i] for i, f in enumerate(in_fields)}
        out = {}
        for of in op_local.out_fields:
            acc = None
            for inf in in_fields:
                offmap = op_local.terms.get((of, inf))
                if not offmap:
                    continue
                for (dr, dc), coef in offmap.items():
                    sl = jax.lax.slice_in_dim(xe[inf], pad + dr,
                                              pad + dr + nrows, axis=0)
                    if dc != 0:
                        sl = jnp.roll(sl, -dc, axis=1)
                    c = jax.lax.slice_in_dim(coef, row0, row0 + nrows, axis=0)
                    contrib = c * sl
                    acc = contrib if acc is None else acc + contrib
            out[of] = acc if acc is not None else jnp.zeros((nrows, nc),
                                                            dtype)
        return out

    shmapped = jax.shard_map(
        _local_apply, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )

    def apply(x: Mapping[str, jax.Array]) -> dict:
        return shmapped(op, x)

    return apply
