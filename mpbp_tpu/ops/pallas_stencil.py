"""Hand-fused Pallas TPU kernel for the multiphase operator apply.

XLA compiles the roll-based fused apply (models/fused.py) into many separate
kernels that materialize shifted planes — measured only ~85 GB/s effective
HBM bandwidth on a v5e. This kernel does the whole A-apply in ONE pass:

  grid = row stripes of `block_rows` grid rows per program;
  per stripe, DMA from HBM into VMEM:
    - theta tile with +-1 halo rows (from a pre-extended (n+2, n) plane,
      so the copy is contiguous),
    - the 5 state planes with +-1 halo rows (3 DMAs each: body + wrapped
      top/bottom halo row — periodic wrap computed from program_id),
    - pointwise face-theta planes (no halo, pipelined BlockSpec);
  compute all 5 outputs with the exact shared arithmetic of
  models/fused.multiphase_apply_math, where the shift primitive is
  row-slicing of the halo tile + an in-lane column roll;
  write the 5 output stripes.

Minimum traffic: 8 plane-reads + 5 plane-writes = 13 n^2 * 4 bytes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpbp_tpu.models.fused import multiphase_apply_math
from mpbp_tpu.models.multiphase import MultiphaseOperator


# Halo width stored in VMEM tiles. Only +-1 rows are consumed, but TPU DMA
# requires sublane-tile (8-row for f32) aligned destinations and sizes —
# 1-row halo copies fail Mosaic compilation (verified empirically), so the
# halo is padded to a full sublane tile.
_H = 8


def _tile_shift(TR: int):
    """Shift primitive on (TR + 2*_H, n) halo tiles: rows via static
    slicing, columns via periodic lane roll (full rows are present)."""

    def sh(x, dr, dc):
        sl = x[_H + dr:_H + dr + TR, :]
        if dc:
            sl = jnp.roll(sl, -dc, axis=1)
        return sl

    return sh


def multiphase_pallas_apply(op: MultiphaseOperator, interpret: bool = False,
                            block_rows: int = 64) -> Callable:
    n = op.grid.n
    TR = min(block_rows, n)
    while n % TR:
        TR //= 2
    n_blocks = n // TR
    dtype = op.phase_n.cell.dtype
    params = {k: float(v) for k, v in op.params.items() if k != "n"}
    dx, dy = op.grid.dx, op.grid.dy

    H = _H
    assert TR >= H and n >= H, (TR, n)
    # pre-extended theta plane: rows [n-H.., 0..n-1, ..H-1] — the halo DMA is
    # one contiguous aligned copy for every stripe
    Tn = op.phase_n.cell
    Tn_ext = jnp.concatenate([Tn[-H:], Tn, Tn[:H]], axis=0)
    Wnx, Wny = op.phase_n.xface_pt, op.phase_n.yface_pt

    sh = _tile_shift(TR)

    def kernel(tn_hbm, wnx_ref, wny_ref, state_hbm, out_ref,
               tn_tile, st_tile, sems):
        i = pl.program_id(0)
        r0 = i * TR
        first = i == 0
        last = i == n_blocks - 1

        # The Mosaic remote-compile rejects DMA indices it cannot prove
        # aligned (modular arithmetic breaks its affine analysis — verified
        # empirically), so the periodic wrap is expressed as predicated
        # copies with static edge indices + affine interior indices.
        body = [pltpu.make_async_copy(
            tn_hbm.at[pl.ds(r0, TR + 2 * H), :], tn_tile, sems.at[0])]
        for f in range(5):
            body.append(pltpu.make_async_copy(
                state_hbm.at[f, pl.ds(r0, TR), :],
                st_tile.at[f, pl.ds(H, TR), :], sems.at[1 + f]))
        for c in body:
            c.start()

        def halo_copies(top_idx, bot_idx, sem_base):
            cs = []
            for f in range(5):
                cs.append(pltpu.make_async_copy(
                    state_hbm.at[f, pl.ds(top_idx, H), :],
                    st_tile.at[f, pl.ds(0, H), :], sems.at[sem_base + f]))
                cs.append(pltpu.make_async_copy(
                    state_hbm.at[f, pl.ds(bot_idx, H), :],
                    st_tile.at[f, pl.ds(TR + H, H), :],
                    sems.at[sem_base + 5 + f]))
            return cs

        @pl.when(first)
        def _():
            for c in halo_copies(n - H, TR, 6):
                c.start()

        @pl.when(last)
        def _():
            for c in halo_copies(r0 - H, 0, 6):
                c.start()

        @pl.when(jnp.logical_not(first | last))
        def _():
            for c in halo_copies(r0 - H, r0 + TR, 6):
                c.start()

        for c in body:
            c.wait()
        # Wait on the halo DMAs through descriptors with identical
        # sizes/semaphores (only .start() uses the source index).
        for c in halo_copies(0, 0, 6):
            c.wait()

        out = multiphase_apply_math(
            sh, tn_tile[:, :], wnx_ref[:, :], wny_ref[:, :],
            st_tile[0], st_tile[1], st_tile[2], st_tile[3], st_tile[4],
            params, dx, dy)
        for f in range(5):
            out_ref[f, :, :] = out[f]

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # Tn_ext (n+2, n)
            pl.BlockSpec((TR, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # Wnx
            pl.BlockSpec((TR, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # Wny
            pl.BlockSpec(memory_space=pltpu.ANY),      # state (5, n, n)
        ],
        out_specs=pl.BlockSpec((5, TR, n), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, n, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((TR + 2 * _H, n), dtype),
            pltpu.VMEM((5, TR + 2 * _H, n), dtype),
            pltpu.SemaphoreType.DMA((16,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=120 * n * n, transcendentals=0,
            bytes_accessed=13 * n * n * np.dtype(np.float32).itemsize),
    )

    def mv(vec):
        return call(Tn_ext, Wnx, Wny, vec)

    return mv
