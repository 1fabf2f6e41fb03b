"""Fused multiphase operator apply: recompute coefficients, don't stream them.

The generic StencilOperator apply streams ~56 precomputed coefficient planes
from HBM per matvec (fine for arbitrary operators; measured 84 Gnnz/s on one
v5e chip). But every coefficient of the multiphase system is derived from ONE
cell-centered theta plane by 2-/4-point averages (reference
preconditioner.py:112-120) plus two pointwise face planes for the mass term
(preconditioner.py:325-329). Recomputing those averages in registers turns
the apply into an 8-plane-in / 5-plane-out bandwidth problem — ~5x less HBM
traffic, which is the whole game for a stencil SpMV on TPU.

The arithmetic below is the same coefficient algebra as
models/multiphase.py (see its docstring derivation), regrouped in
flux/difference form; equality with the assembled operator is asserted by
tests/test_fused.py to 1e-12.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from mpbp_tpu.models.multiphase import ALL_FIELDS, MultiphaseOperator
from mpbp_tpu.ops.stencil import shift


def _phase_momentum(T, u, v, p, dx, dy, d_p):
    """Viscous Laplacian fluxes + weighted pressure gradient for one phase.
    Returns (Lu, Lv, Gx, Gy) evaluated from the cell theta plane T alone."""
    ix2, iy2, ixy, idx, idy = 1 / dx**2, 1 / dy**2, 1 / (dx * dy), 1 / dx, 1 / dy

    Tw = shift(T, 0, -1)
    Tu_ = shift(T, -1, 0)
    tn = 0.25 * (T + Tw + Tu_ + shift(T, -1, -1))
    tnS = shift(tn, 1, 0)
    tnE = shift(tn, 0, 1)
    tx = 0.5 * (T + Tw)
    ty = 0.5 * (T + Tu_)

    uE, uW, uN, uS = (shift(u, 0, 1), shift(u, 0, -1),
                      shift(u, -1, 0), shift(u, 1, 0))
    uNE = shift(u, -1, 1)
    vE, vW, vN, vS = (shift(v, 0, 1), shift(v, 0, -1),
                      shift(v, -1, 0), shift(v, 1, 0))
    vSW = shift(v, 1, -1)

    # u-momentum row (x-face): see models/multiphase.py u-row derivation
    Lu = (ix2 * (T * (uE - u) - Tw * (u - uW))
          + iy2 * (tn * (uN - u) - tnS * (u - uS))
          + ixy * (tn * (v - vW) - T * (v - vS)
                   + Tw * (vW - vSW) - tnS * (vS - vSW)))

    # v-momentum row (y-face)
    Lv = (iy2 * (Tu_ * (vN - v) - T * (v - vS))
          + ix2 * (tnE * (vE - v) - tn * (v - vW))
          + ixy * (tn * u - T * u + T * uE - tnE * uE
                   + Tu_ * uN - tn * uN + tnE * uNE - Tu_ * uNE))

    pW = shift(p, 0, -1)
    pN = shift(p, -1, 0)
    Gx = d_p * idx * tx * (p - pW)
    Gy = d_p * idy * ty * (pN - p)
    return Lu, Lv, Gx, Gy


def _phase_divergence(T, u, v, dx, dy):
    """Weighted divergence at cells from the cell theta plane."""
    Tw = shift(T, 0, -1)
    Tu_ = shift(T, -1, 0)
    tx = 0.5 * (T + Tw)
    ty = 0.5 * (T + Tu_)
    txE = shift(tx, 0, 1)
    tyS = shift(ty, 1, 0)
    return ((txE * shift(u, 0, 1) - tx * u) / dx
            + (ty * v - tyS * shift(v, 1, 0)) / dy)


def make_fused_apply(op: MultiphaseOperator) -> Callable:
    """Build the fused matvec on stacked (5, n, n) vectors, numerically equal
    to stacked_matvec(op.A) but reading only theta planes + state."""
    p = op.params
    c, d, xi = p["c"], p["d"], p["xi"]
    eta_n, eta_s = p["eta_n"], p["eta_s"]
    d_p, d_div = p["d_p"], p["d_div"]
    dx, dy = op.grid.dx, op.grid.dy

    Tn = op.phase_n.cell
    Wnx, Wny = op.phase_n.xface_pt, op.phase_n.yface_pt
    # solvent theta is 1 - theta_n everywhere (reference preconditioner.py:14)
    Ts = 1.0 - Tn
    Wsx, Wsy = 1.0 - Wnx, 1.0 - Wny

    # drag diagonal xi * t * (1 - t) from face-averaged theta — identical for
    # both phases (t(1-t) symmetry, models/multiphase.py drag_diagonal)
    txn = 0.5 * (Tn + shift(Tn, 0, -1))
    tyn = 0.5 * (Tn + shift(Tn, -1, 0))
    XIx = xi * txn * (1.0 - txn)
    XIy = xi * tyn * (1.0 - tyn)

    def mv(vec):
        un, vn, us, vs, pr = vec[0], vec[1], vec[2], vec[3], vec[4]

        Lun, Lvn, Gxn, Gyn = _phase_momentum(Tn, un, vn, pr, dx, dy, d_p)
        Lus, Lvs, Gxs, Gys = _phase_momentum(Ts, us, vs, pr, dx, dy, d_p)

        out_un = (c * Wnx * un - d * XIx * un + d * XIx * us
                  + d * eta_n * Lun + Gxn)
        out_vn = (c * Wny * vn - d * XIy * vn + d * XIy * vs
                  + d * eta_n * Lvn + Gyn)
        out_us = (c * Wsx * us - d * XIx * us + d * XIx * un
                  + d * eta_s * Lus + Gxs)
        out_vs = (c * Wsy * vs - d * XIy * vs + d * XIy * vn
                  + d * eta_s * Lvs + Gys)

        div = (_phase_divergence(Tn, un, vn, dx, dy)
               + _phase_divergence(Ts, us, vs, dx, dy))
        out_p = d_div * div

        return jnp.stack([out_un, out_vn, out_us, out_vs, out_p])

    return mv
