"""Pallas TPU SpMV kernel for the DIA (diagonal-offset) sparse format.

This is the *general-matrix* Pallas SpMV the framework pairs with the
hand-fused multiphase apply (ops/pallas_stencil.py): any matrix whose
nonzeros live on O(1) diagonals — A, F, GtG, GtFG, banded factors
(reference solve.py:246-254 builds exactly such matrices) — runs through
one gather-free kernel. Gathers are the reason generic CSR SpMV is hostile
to TPUs; by diagonal the access pattern becomes *static flat shifts*, which
decompose into a sublane (row) shift plus an in-lane roll — pure VPU work
at streaming bandwidth.

Layout: x is viewed as an (R, 128) row-major matrix, R = N/128. A flat
circular shift by `off` (off = 128*r + c, both static per diagonal) is

    y[p, q] = x[(p + r + (q + c >= 128)) mod R, (q + c) mod 128]

The kernel keeps x VMEM-resident *doubled* (x2 = concat(x, x)) so the row
window for any (program, diagonal) pair is one contiguous dynamic slice —
no modular or predicated source indices, which this toolchain's Mosaic
compiler rejects for DMA (see ops/pallas_stencil.py docstring). The
diagonal payload (K, R, 128) — the dominant HBM traffic — streams through
BlockSpec pipelining one row-stripe per grid program.

Traffic: K*N reads (data) + 2N (x2, once) + N writes; for K diagonals the
kernel approaches the data-streaming roofline nnz/s = HBM_BW / 4 bytes.

VMEM budget: 8*N bytes (x2, f32) + K*TR*512 (data stripe) — the kernel is
for N up to ~1.4M f32 (the 512^2 multiphase system is N = 1.31M); larger
systems fall back to the XLA roll path (DIAMatrix.matvec).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpbp_tpu.ops.dia import DIAMatrix

_LANES = 128
# i32 wrapper for static ref indices: under jax_enable_x64 a bare Python
# int traces as i64 and Mosaic rejects the memref_slice (see pallas_stencil)
_I = np.int32
_VMEM_BYTES = 100 * 2 ** 20  # interpret-mode/CPU has no real limit; TPU
#                              sizing is checked by dia_spmv_supported()


def _pick_block_rows(R: int, K: int, block_rows: int = 128) -> int:
    """Largest power-of-two-ish divisor of R with the data stripe in budget.

    The pipelined data stripe costs ~2*K*TR*512 bytes (double-buffered); cap
    it at ~4 MB so matrices with many diagonals shrink TR instead of blowing
    VMEM (advisor finding r1)."""
    TR = min(block_rows, R)
    while R % TR:
        TR //= 2
    TR = max(TR, 1)
    while TR > 1 and 2 * K * TR * (_LANES * 4) > 4 * 2 ** 20:
        TR //= 2
        while R % TR:
            TR //= 2
    return max(TR, 1)


def dia_spmv_supported(A: DIAMatrix, dtype=jnp.float32,
                       vmem_budget: int = 14 * 2 ** 20,
                       block_rows: int = 128) -> bool:
    """True when the Pallas path can run A on a real TPU core.

    Budgets the full VMEM working set: the doubled x vector (resident),
    the double-buffered data stripe 2*K*TR*512 bytes, and the
    double-buffered output stripe — not just x2 (advisor finding r1)."""
    nrows, ncols = A.shape
    if nrows != ncols or nrows % _LANES:
        return False
    if dtype not in (jnp.float32, jnp.dtype(jnp.float32)):
        return False
    R = nrows // _LANES
    K = len(A.offsets)
    TR = _pick_block_rows(R, K, block_rows)
    stripe = 2 * (K + 1) * TR * (_LANES * 4)   # data + out, double-buffered
    return 2 * nrows * 4 + stripe <= vmem_budget - 2 ** 20


def dia_spmv_pallas(A: DIAMatrix, block_rows: int = 128,
                    interpret: bool = False) -> Callable:
    """Build `mv(x) -> A @ x` as a single Pallas kernel.

    Requires a square matrix with N % 128 == 0 (use dia_spmv_supported).
    Offsets are interpreted periodically: y[i] = sum_k d[k,i]*x[(i+off_k)%N],
    matching DIAMatrix.matvec on square shapes.
    """
    N, ncols = A.shape
    assert N == ncols and N % _LANES == 0, A.shape
    R = N // _LANES
    K = len(A.offsets)
    dtype = A.data.dtype

    TR = min(block_rows, R)
    while R % TR:
        TR //= 2
    TR = max(TR, 1)
    n_blocks = R // TR

    # static per-diagonal decomposition off = 128*r + c, normalized to [0, N)
    offs = [int(o) % N for o in A.offsets]
    rs = [o // _LANES for o in offs]
    cs = [o % _LANES for o in offs]

    data3 = A.data.reshape(K, R, _LANES)

    def kernel(x2_ref, d_ref, out_ref):
        t0 = pl.program_id(0) * TR
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, _LANES), 1)
        acc = jnp.zeros((TR, _LANES), dtype)
        for k in range(K):
            r, c = rs[k], cs[k]
            win = x2_ref[pl.ds(t0 + r, TR + 1), :]       # (TR+1, 128)
            if c == 0:
                y = win[:TR, :]
            else:
                arot = jnp.roll(win[:TR, :], -c, axis=1)
                brot = jnp.roll(win[1:TR + 1, :], -c, axis=1)
                y = jnp.where(col_ids < _LANES - c, arot, brot)
            acc = acc + d_ref[k, :, :] * y
        out_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # x2 (2R, 128)
            pl.BlockSpec((K, TR, _LANES), lambda i: (_I(0), i, _I(0)),
                         memory_space=pltpu.VMEM),          # data stripe
        ],
        out_specs=pl.BlockSpec((TR, _LANES), lambda i: (i, _I(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, _LANES), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N, transcendentals=0,
            bytes_accessed=(K + 3) * N * np.dtype(np.float32).itemsize),
    )

    def mv(x: jax.Array) -> jax.Array:
        xr = x.reshape(R, _LANES)
        x2 = jnp.concatenate([xr, xr], axis=0)
        return call(x2, data3).reshape(N)

    return mv


# ---------------------------------------------------------------------------
# Streamed variant: x in HBM, per-diagonal windows DMAed per row block.
# Lifts the resident kernel's ~1.4M-row VMEM ceiling (the 1024^2 multiphase
# system is N = 5.24M; 2048^2 is 21M) at the cost of re-reading x once per
# diagonal: traffic ~2KN vs (K+3)N, i.e. ~50% of the resident kernel's
# throughput bound — still >500x the scipy CPU baseline at 1024^2.
# ---------------------------------------------------------------------------
# Extra rows a streamed-kernel DMA window absorbs so that a CLUSTER of
# nearby diagonals (offsets within _MERGE rows) shares ONE window. The
# multiphase A's 35 diagonals cluster around its field-block offsets
# (0, +-1, +-n row-groups per block pair), so merging cuts the unique
# window count U — and with it the kernel's structural x-re-read traffic
# (K + U + 1 plane-reads per apply) — from 17 to ~7 at n=1024.
_MERGE = 32


def _window_clusters(offs_flat, N: int):
    """Cluster the diagonals' aligned window starts: returns
    (bases, uidx, rems) with bases the 8-aligned cluster starts, uidx[k]
    the cluster of diagonal k, and rems[k] = r_k - base in [0, _MERGE)."""
    rs = [(o % N) // _LANES for o in offs_flat]
    r8s = [(r // 8) * 8 for r in rs]
    bases = []
    for r8 in sorted(set(r8s)):
        if not bases or r8 - bases[-1] > _MERGE - 8:
            bases.append(r8)
    uidx, rems = [], []
    for r in rs:
        r8 = (r // 8) * 8
        base = max(b for b in bases if b <= r8)
        uidx.append(bases.index(base))
        rems.append(r - base)
    assert all(0 <= rem < _MERGE for rem in rems), rems
    return bases, uidx, rems


def _streamed_vmem_bytes(TR: int, K: int, U: int) -> int:
    """Total VMEM working set of the streamed kernel at tile TR: the
    double-buffered data stripe, the U resident DMA windows, and the
    double-buffered output stripe."""
    row = _LANES * 4
    return (2 * K * TR * row              # data stripe (double-buffered)
            + U * (TR + _MERGE) * row     # x windows (scratch, resident)
            + 2 * TR * row)               # out stripe (double-buffered)


def _pick_block_rows_streamed(R: int, K: int, block_rows: int = 256,
                              U: int | None = None,
                              vmem_budget: int = 13 * 2 ** 20) -> int:
    """TR for the streamed kernel: a divisor of R that keeps every DMA start
    t0 + r8 8-sublane-aligned — i.e. TR % 8 == 0, or TR == R (single block,
    t0 = 0) — within the VMEM budget (advisor r2: TR % 8 != 0 silently
    breaks the aligned-start invariant).

    Default block_rows raised 64 -> 256 (r5): at TR=64 each program's x
    windows are ~36 KB DMAs and the kernel is DMA-latency-bound — measured
    310 GB/s slot rate vs the resident kernel's 675 (KERNELS_r04). Larger
    tiles amortize the per-program window latency; the budget accounts the
    full working set so K-heavy matrices still shrink TR instead of blowing
    VMEM."""
    U = K if U is None else U
    divs = []
    i = 1
    while i * i <= R:
        if R % i == 0:
            divs += [i, R // i]
        i += 1
    cands = sorted({d for d in divs if d % 8 == 0 or d == R})
    budget = [d for d in cands if _streamed_vmem_bytes(d, K, U) <= vmem_budget]
    small = [d for d in budget if d <= max(block_rows, 8)]
    if small:
        return max(small)
    return min(budget) if budget else min(cands)


def dia_spmv_streamed_supported(A: DIAMatrix, dtype=jnp.float32,
                                vmem_budget: int = 14 * 2 ** 20,
                                block_rows: int = 256) -> bool:
    """True when the streamed Pallas path can run A on a real TPU core —
    the budget is N-independent (windows + stripes only)."""
    nrows, ncols = A.shape
    if nrows != ncols or nrows % _LANES:
        return False
    if nrows < 8 * _LANES:       # builder requires R >= 8 (advisor r2)
        return False
    if dtype not in (jnp.float32, jnp.dtype(jnp.float32)):
        return False
    R = nrows // _LANES
    K = len(A.offsets)
    # unique CLUSTERED windows (nearby diagonals share DMAs — see kernel)
    bases, _u, _r = _window_clusters([int(o) for o in A.offsets], nrows)
    U = len(bases)
    TR = _pick_block_rows_streamed(R, K, block_rows, U,
                                   vmem_budget - 2 ** 20)
    return _streamed_vmem_bytes(TR, K, U) <= vmem_budget - 2 ** 20


def dia_spmv_pallas_streamed(A: DIAMatrix, block_rows: int = 256,
                             interpret: bool = False) -> Callable:
    """Build `mv(x) -> A @ x` with x streamed from HBM per diagonal.

    Same math as dia_spmv_pallas; instead of keeping the doubled x resident
    in VMEM, each grid program issues one aligned async copy per diagonal
    (start rounded down to the 8-row sublane tile; the static residue is
    sliced off in VMEM, where unaligned reads are free). TR is chosen so
    t0 = i*TR is always 8-aligned (TR % 8 == 0, or a single block).
    """
    N, ncols = A.shape
    assert N == ncols and N % _LANES == 0, A.shape
    R = N // _LANES
    assert R >= 8, "streamed kernel needs N >= 1024 (use the resident one)"
    K = len(A.offsets)
    dtype = A.data.dtype

    offs = [int(o) % N for o in A.offsets]
    cs = [o % _LANES for o in offs]
    # diagonals cluster (0, +-1, +-n, field-block offsets): all diagonals
    # within a _MERGE-row neighborhood share ONE window DMA. For the
    # multiphase A this is 7 clustered windows for K=35 at n=1024 (was 17
    # unmerged 8-aligned windows in r4), i.e. x-traffic (K+U+1)N instead of
    # 2KN — the kernel's structural bound is HBM_BW * K/(K+U+1) slot rate:
    # 541 GB/s unmerged, 636 merged at K=35. Measured r5 on chip
    # (KERNELS_r05.json, TR=256): 543 GB/s slot rate = 85% of the merged
    # ceiling, 667 GB/s actual HBM — the same HBM efficiency as the
    # resident kernel (702-714 GB/s of 819). The remaining gap to the
    # ceiling is the per-program window-DMA latency; the r4 number was
    # 310 GB/s (TR=64, unmerged).
    uniq, uidx, rems = _window_clusters(offs, N)
    U = len(uniq)

    TR = _pick_block_rows_streamed(R, K, block_rows, U)
    n_blocks = R // TR
    WIN = TR + _MERGE                    # covers rem (<_MERGE) + TR + 1 rows

    data3 = A.data.reshape(K, R, _LANES)

    def kernel(x2_hbm, d_ref, out_ref, xwin, sems):
        t0 = pl.program_id(0) * TR
        copies = []
        for u in range(U):
            # start is 8-aligned by construction (TR % 8 == 0 or single
            # block, r8s 8-aligned); the multiple_of hint is required once
            # the array spans >1 lane tile — Mosaic's divisibility prover
            # rejects unhinted dynamic starts there (observed on chip for
            # the fused stencil kernels, r3)
            copies.append(pltpu.make_async_copy(
                x2_hbm.at[pl.ds(pl.multiple_of(t0 + uniq[u], 8), WIN), :],
                xwin.at[_I(u)], sems.at[_I(u)]))
        for c in copies:
            c.start()
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, _LANES), 1)
        acc = jnp.zeros((TR, _LANES), dtype)
        waited = set()
        for k in range(K):
            u = uidx[k]
            if u not in waited:
                copies[u].wait()
                waited.add(u)
            rem, c = rems[k], cs[k]
            win = xwin[_I(u), rem:rem + TR + 1, :]       # (TR+1, 128)
            if c == 0:
                y = win[:TR, :]
            else:
                arot = jnp.roll(win[:TR, :], -c, axis=1)
                brot = jnp.roll(win[1:TR + 1, :], -c, axis=1)
                y = jnp.where(col_ids < _LANES - c, arot, brot)
            acc = acc + d_ref[k, :, :] * y
        out_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x2 in HBM
            pl.BlockSpec((K, TR, _LANES), lambda i: (_I(0), i, _I(0)),
                         memory_space=pltpu.VMEM),          # data stripe
        ],
        out_specs=pl.BlockSpec((TR, _LANES), lambda i: (i, _I(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((U, WIN, _LANES), dtype),
            pltpu.SemaphoreType.DMA((-(-U // 8) * 8,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N, transcendentals=0,
            bytes_accessed=(K + U) * N * np.dtype(np.float32).itemsize),
    )

    def mv(x: jax.Array) -> jax.Array:
        xr = x.reshape(R, _LANES)
        # doubled + _MERGE pad rows so every clustered window is in bounds
        # (tile covers the small-R case where one extra copy is < _MERGE)
        reps = 2 + -(-_MERGE // R)
        x2 = jnp.tile(xr, (reps, 1))[: 2 * R + _MERGE]
        return call(x2, data3).reshape(N)

    return mv
