"""MAC staggered-grid geometry and volume-fraction field evaluation.

Replaces the reference's pointwise per-row lambda evaluation
(reference preconditioner.py:9-15 `thn`/`ths`, preconditioner.py:26-84
`get_thn_vals`) with one vectorized evaluation of theta on the cell-centered
grid plus roll-based averaging to faces and nodes. The averaging rules are
exactly the reference's:

  * face value  = mean of the 2 adjacent cell centers
    (reference preconditioner.py:114-116, 119-120, 198-201)
  * node value  = mean of the 4 surrounding cell centers
    (reference preconditioner.py:112-113, 195-196)

Geometry convention (reference utils.py:187-202): the grid is n x n periodic
cells on [0,1] x [-1,0]; index [r, c] maps to
  cell center   (x, y) = ((c+1/2)dx, -(r+1/2)dy)
  u (x-)face    (x, y) = (c dx,      -(r+1/2)dy)
  v (y-)face    (x, y) = ((c+1/2)dx, -r dy)
  node          (x, y) = (c dx,      -r dy)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mpbp_tpu.ops.stencil import shift

PI = np.pi


def default_thn(y, x):
    """Network volume fraction theta_n (reference preconditioner.py:9-11)."""
    return 0.25 * jnp.sin(2 * PI * x) * jnp.sin(2 * PI * y) + 0.5


def default_ths(y, x):
    """Solvent volume fraction theta_s = 1 - theta_n (reference preconditioner.py:13-15)."""
    return 1.0 - default_thn(y, x)


def constant_thn(value: float) -> Callable:
    """Constant-theta field (the reference's Fixed Thn = 0.75 variant,
    reference solve.py:60-68)."""
    def f(y, x):
        return jnp.full(jnp.broadcast_shapes(jnp.shape(y), jnp.shape(x)), value)
    return f


@dataclasses.dataclass(frozen=True)
class MACGrid:
    """Square periodic MAC grid with n x n cells, dx = dy = 1/n."""

    n: int
    dtype: jnp.dtype = jnp.float64

    @property
    def dx(self) -> float:
        return 1.0 / self.n

    @property
    def dy(self) -> float:
        return 1.0 / self.n

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    # coordinate arrays, shape (n, n), index [r, c]
    def _mesh(self, x0: float, y0: float):
        n, dx, dy = self.n, self.dx, self.dy
        c = jnp.arange(n, dtype=self.dtype)
        r = jnp.arange(n, dtype=self.dtype)
        x = (c + x0) * dx
        y = -(r + y0) * dy
        return jnp.meshgrid(y, x, indexing="ij")  # (Y, X) each (n, n)

    def cell_coords(self):
        return self._mesh(0.5, 0.5)

    def uface_coords(self):
        return self._mesh(0.0, 0.5)

    def vface_coords(self):
        return self._mesh(0.5, 0.0)

    def node_coords(self):
        return self._mesh(0.0, 0.0)

    def eval_at_cells(self, f):
        y, x = self.cell_coords()
        return f(y, x).astype(self.dtype)

    def eval_at_ufaces(self, f):
        y, x = self.uface_coords()
        return f(y, x).astype(self.dtype)

    def eval_at_vfaces(self, f):
        y, x = self.vface_coords()
        return f(y, x).astype(self.dtype)


@dataclasses.dataclass
class PhaseFields:
    """Theta evaluated/averaged everywhere one phase's operators need it.

    cell:  theta at cell centers              (n, n)
    xface: theta averaged to u-faces          0.5*(T[r,c-1] + T[r,c])
    yface: theta averaged to v-faces          0.5*(T[r-1,c] + T[r,c])
    node:  theta averaged to nodes            4-cell mean
    xface_pt / yface_pt: theta *evaluated pointwise* at the face centers —
      the reference uses pointwise (not averaged) theta for the c*theta*u mass
      term (reference preconditioner.py:325-329).
    """

    cell: jax.Array
    xface: jax.Array
    yface: jax.Array
    node: jax.Array
    xface_pt: jax.Array
    yface_pt: jax.Array


def make_phase_fields(grid: MACGrid, theta_fn) -> PhaseFields:
    T = grid.eval_at_cells(theta_fn)
    return make_phase_fields_from_planes(
        grid, T,
        xface_pt=grid.eval_at_ufaces(theta_fn),
        yface_pt=grid.eval_at_vfaces(theta_fn),
    )


def make_phase_fields_from_planes(grid: MACGrid, cell,
                                  xface_pt=None, yface_pt=None) -> PhaseFields:
    """PhaseFields from explicit theta planes — tabulated / data-driven /
    checkpoint-restored theta with no closed form. The averaged face and
    node planes are always derived from the cell plane by the reference's
    averaging rules (reference preconditioner.py:112-120); the pointwise
    mass-term planes default to the face averages when not supplied."""
    T = jnp.asarray(cell, grid.dtype)
    xface = 0.5 * (shift(T, 0, -1) + T)
    yface = 0.5 * (shift(T, -1, 0) + T)
    node = 0.25 * (shift(T, -1, -1) + shift(T, -1, 0) + shift(T, 0, -1) + T)
    return PhaseFields(
        cell=T,
        xface=xface,
        yface=yface,
        node=node,
        xface_pt=(jnp.asarray(xface_pt, grid.dtype)
                  if xface_pt is not None else xface),
        yface_pt=(jnp.asarray(yface_pt, grid.dtype)
                  if yface_pt is not None else yface),
    )
