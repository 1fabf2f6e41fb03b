"""Single-phase (variable-viscosity) Stokes saddle-point model family.

BASELINE configs[0]-[1] call for constant-coefficient and variable-viscosity
Stokes systems on the MAC grid in addition to the two-phase flagship. The
discretization reuses the multiphase stencil builders
(models/multiphase.py) with the coefficient plane playing the viscosity
role: the phase Laplacian with cell plane eta is exactly
div(eta grad u) + coupling, and unit-weighted gradient/divergence give the
standard Stokes B-blocks.

System (unknowns u, v, p):
    c u - d * div(eta grad) u + grad p = b_u
    -div u = b_p
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from mpbp_tpu.models.fields import MACGrid, make_phase_fields
from mpbp_tpu.models.multiphase import (divergence_operator,
                                        gradient_operator,
                                        laplacian_operator)
from mpbp_tpu.ops.stencil import StencilOperator, diagonal_operator

STOKES_FIELDS = ("u", "v", "p")


@dataclasses.dataclass
class StokesOperator:
    grid: MACGrid
    A: StencilOperator
    F: StencilOperator
    G: StencilOperator
    D: StencilOperator
    minus_D: StencilOperator
    params: dict


def make_stokes_operator(n: int, c: float = 1.0, d: float = -1.0,
                         eta_fn: Callable | None = None,
                         eta: float = 1.0,
                         dtype=jnp.float64) -> StokesOperator:
    """Assemble the (variable-viscosity) Stokes saddle-point system.

    eta_fn(y, x) gives the viscosity field; None means constant `eta`
    (configs[0]). The unit-density gradient/divergence come from a
    constant-1 'phase'."""
    grid = MACGrid(n, dtype=dtype)

    if eta_fn is None:
        def eta_fn(y, x):
            return jnp.full(jnp.broadcast_shapes(jnp.shape(y), jnp.shape(x)),
                            eta)

    eta_ph = make_phase_fields(grid, eta_fn)
    one_ph = make_phase_fields(grid, lambda y, x: jnp.ones(
        jnp.broadcast_shapes(jnp.shape(y), jnp.shape(x))))

    L = laplacian_operator(eta_ph, grid, "u", "v")
    G = gradient_operator(one_ph, grid, "u", "v", "p")
    D = divergence_operator(one_ph, grid, "u", "v", "p")
    ones = jnp.ones(grid.shape, dtype)
    M = diagonal_operator(("u", "v"), {"u": c * ones, "v": c * ones},
                          grid.shape)

    F = M + d * L
    minus_D = -1.0 * D
    A = F + G + minus_D
    A = StencilOperator(STOKES_FIELDS, STOKES_FIELDS, A.terms, grid.shape)

    return StokesOperator(grid=grid, A=A, F=F, G=G, D=D, minus_D=minus_D,
                          params=dict(n=n, c=c, d=d))


def stokes_mms(grid: MACGrid, c: float, d: float,
               eta_fn: Callable | None = None, eta: float = 1.0):
    """Manufactured solution for the Stokes system: divergence-free velocity
    u = sin(2pi x)cos(2pi y), v = -cos(2pi x)sin(2pi y), p = 0; RHS derived
    for constant viscosity (configs[0]) or eta(y,x)=eta."""
    import numpy as np

    PI = np.pi
    s, co = jnp.sin, jnp.cos

    def u_fn(y, x):
        return s(2 * PI * x) * co(2 * PI * y)

    def v_fn(y, x):
        return -co(2 * PI * x) * s(2 * PI * y)

    def bu_fn(y, x):
        # F = c I + d L with L = div(eta grad) (negative definite), so
        # F u = (c - d eta 8 pi^2) u for this eigenfunction.
        return (c - d * eta * 8 * PI * PI) * u_fn(y, x)

    def bv_fn(y, x):
        return (c - d * eta * 8 * PI * PI) * v_fn(y, x)

    def bp_fn(y, x):
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(y), jnp.shape(x)))

    u = {
        "u": grid.eval_at_ufaces(u_fn),
        "v": grid.eval_at_vfaces(v_fn),
        "p": jnp.zeros(grid.shape, grid.dtype),
    }
    b = {
        "u": grid.eval_at_ufaces(bu_fn),
        "v": grid.eval_at_vfaces(bv_fn),
        "p": grid.eval_at_cells(bp_fn),
    }
    return u, b
