"""Block preconditioners for the multiphase Stokes saddle-point system.

TPU-native re-implementations of the reference's preconditioner layer
(reference solve.py:210-286):

  * `make_exact_schur_pc` — exact Schur-complement block back-substitution
    (reference solve.py:210-238): u_hat = F^-1 v_u; x_p = -GMRES(S, D u_hat +
    v_p); u = u_hat - F^-1 G x_p, with S = -D F^-1 G formed densely. Only
    viable on small grids (S is dense — BASELINE.md last row); kept for
    parity tests and spectral analysis.

  * `make_lsc_pc` — the approximate-commutator / least-squares-commutator
    Schur preconditioner (reference solve.py:240-286): S^-1 ~ (GtG)^-1
    (Gt F G) (GtG)^-1 with GtG = (-D) G, applied with approximate inner
    solves of F and GtG. The inner solves are pluggable (`InnerSolver`):
    ILUT level-scheduled tri-solves for reference parity, or CG/Chebyshev/
    Jacobi for a fully matrix-free TPU path.

  * `make_block_diagonal_pc` / `make_block_triangular_pc` — the classical
    block PCs (BASELINE.json configs[0]-[1]).

All preconditioners are returned as flat-vector callables `z = M(v)` over the
reference's vector layout [un, vn, us, vs, p] (reference utils.py:204-208),
ready to pass as `M=` to solvers.gmres.fgmres.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mpbp_tpu.models.multiphase import (ALL_FIELDS, VEL_FIELDS,
                                        MultiphaseOperator)
from mpbp_tpu.ops.ilu import ILUPreconditioner
from mpbp_tpu.ops.stencil import StencilOperator
from mpbp_tpu.solvers import gmres as krylov


# ---------------------------------------------------------------------------
# helpers: pack/unpack between the flat layout and grid fields
# ---------------------------------------------------------------------------
def _sizes(op: MultiphaseOperator):
    n2 = op.grid.n * op.grid.n
    return 4 * n2, n2


def split_uv_p(op: MultiphaseOperator, v: jax.Array):
    nu, np_ = _sizes(op)
    return v[:nu], v[nu:]


def unpack_vel(op: MultiphaseOperator, vu: jax.Array) -> dict:
    n = op.grid.n
    n2 = n * n
    return {f: vu[i * n2:(i + 1) * n2].reshape(n, n)
            for i, f in enumerate(VEL_FIELDS)}


def pack_vel(op: MultiphaseOperator, x: dict) -> jax.Array:
    return jnp.concatenate([x[f].ravel() for f in VEL_FIELDS])


# ---------------------------------------------------------------------------
# Schur-complement building blocks (stencil-composed, never dense)
# ---------------------------------------------------------------------------
def lsc_products(op: MultiphaseOperator):
    """Gt_G = (-D) G and Gt_F_G = (-D) F G as exact stencil operators —
    the structured-SpGEMM replacement of reference solve.py:246-249."""
    GtG = op.minus_D @ op.G
    GtFG = (op.minus_D @ op.F) @ op.G
    return GtG, GtFG


# ---------------------------------------------------------------------------
# Inner solvers
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ILUInner:
    """ILUT/ILU(0) inner solve via level-scheduled tri-solves.

    `refine` wraps the factor apply in steps of iterative refinement
    z <- z + M^-1 (v - A z) using the matrix-free stencil apply — legal under
    a flexible outer Krylov method and roughly squaring the factor accuracy
    per step (the TPU-friendly alternative to deeper fill)."""

    ilu: ILUPreconditioner
    refine: int = 0
    matvec: Callable | None = None

    @classmethod
    def ilut_of(cls, A_stencil: StencilOperator, fill=100, tau=1e-3,
                dtype=jnp.float64, drop_tol=1e-14, refine=0,
                apply="level", sweeps=24):
        csr = A_stencil.to_csr(drop_tol=drop_tol)
        mv = _stencil_matvec(A_stencil, dtype) if refine else None
        return cls(ILUPreconditioner.ilut(csr, fill=fill, tau=tau,
                                          dtype=dtype, apply=apply,
                                          sweeps=sweeps), refine, mv)

    @classmethod
    def ilu0_of(cls, A_stencil: StencilOperator, dtype=jnp.float64,
                drop_tol=1e-14, refine=0, apply="level", sweeps=24):
        csr = A_stencil.to_csr(drop_tol=drop_tol)
        mv = _stencil_matvec(A_stencil, dtype) if refine else None
        return cls(ILUPreconditioner.ilu0(csr, dtype=dtype, apply=apply,
                                          sweeps=sweeps), refine, mv)

    def __call__(self, v: jax.Array) -> jax.Array:
        z = self.ilu.solve(v)
        for _ in range(self.refine):
            z = z + self.ilu.solve(v - self.matvec(z))
        return z


def _stencil_matvec(A_stencil: StencilOperator, dtype) -> Callable:
    tmpl = {f: jnp.zeros(A_stencil.shape_grid, dtype)
            for f in A_stencil.in_fields}
    return krylov.flatten_op(A_stencil.apply, tmpl, A_stencil.in_fields)


@dataclasses.dataclass(eq=False)
class KrylovInner:
    """Fixed-budget inner Krylov solve (matrix-free). Because the outer
    driver is *flexible* GMRES, a varying inner solve is legal — this is the
    author's stated production target ('GMRES with multigrid PC',
    reference solve.py:266, 274)."""

    matvec: Callable
    tol: float = 1e-6
    maxiter: int = 50
    method: str = "gmres"      # "gmres" | "cg"
    M: Callable | None = None

    def __call__(self, v: jax.Array) -> jax.Array:
        if self.method == "cg":
            res = krylov.cg(self.matvec, v, tol=self.tol, maxiter=self.maxiter,
                            M=self.M if self.M is not None else (lambda x: x))
        else:
            res = krylov.gmres(self.matvec, v, tol=self.tol,
                               maxiter=self.maxiter, M=self.M)
        return res.x


@dataclasses.dataclass(eq=False)
class JacobiInner:
    """Fixed Jacobi sweeps (reference solve.py:149-159 analog)."""

    matvec: Callable
    diag: jax.Array
    iters: int = 200

    def __call__(self, v: jax.Array) -> jax.Array:
        return krylov.jacobi(self.matvec, self.diag, v, iters=self.iters)


@dataclasses.dataclass(eq=False)
class DenseInner:
    """Precomputed dense (pseudo-)inverse — small grids / tests only
    (the reference's pinv/lstsq path, solve.py:218-219)."""

    inv: jax.Array

    @classmethod
    def of(cls, A_stencil: StencilOperator, pseudo=False):
        d = A_stencil.to_dense()
        inv = np.linalg.pinv(d) if pseudo else np.linalg.inv(d)
        return cls(jnp.asarray(inv))

    def __call__(self, v: jax.Array) -> jax.Array:
        return jnp.matmul(self.inv, v, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# The LSC / approximate-commutator preconditioner (reference solve.py:240-286)
# ---------------------------------------------------------------------------
def make_lsc_pc(op: MultiphaseOperator,
                f_inner: Callable,
                p_inner: Callable) -> Callable:
    """Approximate-commutator Schur PC.

    apply(v):
      u_hat = F~^-1 v_u                       (reference solve.py:258)
      r_p   = D u_hat + v_p                   (solve.py:259)
      x_a   = (GtG)~^-1 r_p                   (solve.py:265)
      x_b   = (Gt F G) x_a                    (solve.py:267)
      x_p   = (GtG)~^-1 x_b                   (solve.py:271)
      u     = u_hat - F~^-1 (G x_p)           (solve.py:273-275)
      return [u, x_p]
    """
    _, GtFG = lsc_products(op)
    n = op.grid.n

    def apply(v):
        vu, vp = split_uv_p(op, v)
        u_hat = f_inner(vu)
        uh = unpack_vel(op, u_hat)
        rp = op.D.apply(uh)["p"] + vp.reshape(n, n)
        x_a = p_inner(rp.ravel())
        x_b = GtFG.apply({"p": x_a.reshape(n, n)})["p"]
        x_p = p_inner(x_b.ravel())
        gxp = op.G.apply({"p": x_p.reshape(n, n)})
        u = u_hat - f_inner(pack_vel(op, gxp))
        return jnp.concatenate([u, x_p])

    return apply


def scaled32_apply(inner32: Callable, v64: jax.Array) -> jax.Array:
    """Run an f32 inner solver on an f64 input: scale-normalize before the
    cast (Krylov solves are scale-invariant; the input magnitude after the
    LSC glue cancellations is not), solve in f32, rescale in f64. Shared by
    the flat (make_lsc_pc_mixed) and stacked/sharded
    (parallel.sharding.make_sharded_lsc_pc_mixed) mixed assemblies."""
    s = jnp.maximum(jnp.max(jnp.abs(v64)), 1e-300)
    return inner32((v64 / s).astype(jnp.float32)).astype(jnp.float64) * s


def make_lsc_pc_mixed(op64: MultiphaseOperator,
                      f_inner32: Callable,
                      p_inner32: Callable,
                      refine_inners: bool = True) -> Callable:
    """LSC apply with f64 glue and f32 inner solves — the TPU mixed-
    precision configuration for grids past the f32 conditioning frontier.

    Why: an all-f32 LSC apply has output error ~ eps_f32 * kappa(A) on
    arbitrary (rough) inputs — measured 3.5e-4 at n=256 and ~2e-2 at n=512
    (contrast 100) — and flexible GMRES stalls exactly at that floor after
    one iteration, because the error is incoherent noise rather than an
    inexact-but-consistent operator. Keeping the *formula* arithmetic
    (reference solve.py:257-277: rp = D u_hat + v_p; u = u_hat - F~^-1 G x_p
    — the two cancellation-heavy lines) in f64 while the inner solves run
    f32 restores per-application quality to the inner-solve tolerance at
    ~f32 cost: the inner MG/Krylov sweeps are >95% of the flops.

    refine_inners=True additionally wraps EACH f32 inner solve in one f64
    residual-refinement pass (x += solve32(r - Op64 x)): without it the f32
    inner noise (~eps_f32 * kappa of the block) floors the outer FGMRES at
    ~2e-6 (n=128) / 2e-4 (n=512, measured on chip) regardless of restarts;
    with it the mixed PC converges iteration-for-iteration with the all-f64
    PC (10 outers to 1e-8 at n=128, measured) while all heavy inner work
    stays f32. Cost: 2x the inner solves + one cheap f64 block matvec each.
    """
    from mpbp_tpu.models.fused import make_f_apply

    GtG64, GtFG = lsc_products(op64)
    n = op64.grid.n
    f32, f64 = jnp.float32, jnp.float64

    scaled32 = scaled32_apply

    if refine_inners:
        fmv64 = make_f_apply(op64)

        def gtg_mv64(p):
            return GtG64.apply({"p": p.reshape(n, n)})["p"].ravel()

        def f_inner(vu64):
            x = scaled32(f_inner32, vu64)
            return x + scaled32(f_inner32, vu64 - fmv64(x))

        def p_inner(rp64):
            x = scaled32(p_inner32, rp64)
            return x + scaled32(p_inner32, rp64 - gtg_mv64(x))
    else:
        def f_inner(vu64):
            return scaled32(f_inner32, vu64)

        def p_inner(rp64):
            return scaled32(p_inner32, rp64)

    def apply(v):
        vu, vp = split_uv_p(op64, v)
        u_hat = f_inner(vu)
        rp = op64.D.apply(unpack_vel(op64, u_hat))["p"] + vp.reshape(n, n)
        x_a = p_inner(rp.ravel())
        x_b = GtFG.apply({"p": x_a.reshape(n, n)})["p"]
        x_p = p_inner(x_b.ravel())
        gxp = op64.G.apply({"p": x_p.reshape(n, n)})
        u = u_hat - f_inner(pack_vel(op64, gxp))
        return jnp.concatenate([u, x_p])

    return apply


def make_lsc_pc_from_dia(minus_D, F, G, inner_tol: float = 1e-4,
                         inner_iters: int = 60) -> Callable:
    """LSC preconditioner built ENTIRELY from general banded (DIA) matrix
    data — no stencil closures, no host factorization. The setup products
    GtG = (-D) G and GtFG = (-D) F G run on device through the banded
    SpGEMM (ops/spgemm.py, the reference's dense products at
    solve.py:246-249); the apply uses matrix-free inner Krylov solves on
    the DIA matvecs. This is the path for operators that arrive as
    matrices (loaded / externally assembled systems — the PETSc-Mat role)
    rather than as this package's stencil operators.

    minus_D: (np, nu) DIA;  F: (nu, nu) DIA;  G: (nu, np) DIA
    (flat non-periodic offsets, DIAMatrix.from_csr(periodic=False)).
    """
    from mpbp_tpu.ops.spgemm import lsc_products_device

    GtG, GtFG = lsc_products_device(minus_D, F, G)
    nu = F.shape[0]

    fdiag = F.data[F.offsets.index(0)]
    f_inner = KrylovInner(F.matvec, tol=inner_tol, maxiter=inner_iters,
                          method="gmres", M=lambda v: v / fdiag)
    p_inner = KrylovInner(GtG.matvec, tol=inner_tol, maxiter=inner_iters,
                          method="cg")

    def apply(v):
        vu, vp = v[:nu], v[nu:]
        u_hat = f_inner(vu)
        rp = -minus_D.matvec(u_hat) + vp          # D = -minus_D
        x_a = p_inner(rp)
        x_p = p_inner(GtFG.matvec(x_a))
        u = u_hat - f_inner(G.matvec(x_p))
        return jnp.concatenate([u, x_p])

    return apply


# ---------------------------------------------------------------------------
# Exact Schur-complement preconditioner (reference solve.py:210-238)
# ---------------------------------------------------------------------------
def make_exact_schur_pc(op: MultiphaseOperator, inner_tol: float = 1e-5,
                        inner_maxiter: int = 200,
                        project_nullspace: bool = True) -> Callable:
    """Dense exact-Schur block back-substitution. O((4n^2)^3) setup — small
    grids only, mirroring the reference's explicit S (preconditioner.py:344).

    `project_nullspace` removes the constant-pressure component from the
    inner Schur rhs and solution. S = G^T F^-1 G is singular on the periodic
    domain (constants); without the projection the inner GMRES residual
    recurrence diverges from the true residual on inconsistent rhs — the
    problem the reference's commented-out projections chased
    (reference solve.py:260-272)."""
    F = op.F.to_dense()
    G = op.G.to_dense()
    D = op.D.to_dense()
    Finv = np.linalg.pinv(F)
    S = (-D) @ Finv @ G
    Fi = jnp.asarray(Finv)
    Sj = jnp.asarray(S)
    Gj = jnp.asarray(G)
    Dj = jnp.asarray(D)

    def s_matvec(x):
        return jnp.matmul(Sj, x, precision=jax.lax.Precision.HIGHEST)

    def apply(v):
        vu, vp = split_uv_p(op, v)
        u_hat = jnp.matmul(Fi, vu, precision=jax.lax.Precision.HIGHEST)
        rhs = jnp.matmul(Dj, u_hat, precision=jax.lax.Precision.HIGHEST) + vp
        if project_nullspace:
            rhs = rhs - jnp.mean(rhs)
        # inner GMRES on S (reference solve.py:221 'Using GMRES here gives
        # 2nd order convergence'). Non-restarted: this apply runs inside the
        # traced outer FGMRES, so it must be a single jittable cycle.
        x_p = -krylov.gmres(s_matvec, rhs, tol=inner_tol,
                            maxiter=inner_maxiter).x
        if project_nullspace:
            x_p = x_p - jnp.mean(x_p)
        u = u_hat - jnp.matmul(Fi, jnp.matmul(Gj, x_p, precision=jax.lax.Precision.HIGHEST), precision=jax.lax.Precision.HIGHEST)
        return jnp.concatenate([u, x_p])

    return apply


# ---------------------------------------------------------------------------
# Classical block PCs (BASELINE.json configs[0]-[1])
# ---------------------------------------------------------------------------
def make_block_diagonal_pc(op: MultiphaseOperator, f_inner: Callable,
                           schur_inner: Callable) -> Callable:
    """M = blockdiag(F~, S~): z_u = F~^-1 v_u, z_p = S~^-1 v_p."""

    def apply(v):
        vu, vp = split_uv_p(op, v)
        return jnp.concatenate([f_inner(vu), schur_inner(vp)])

    return apply


def make_block_triangular_pc(op: MultiphaseOperator, f_inner: Callable,
                             schur_inner: Callable) -> Callable:
    """Block lower-triangular M = [[F, 0], [-D, S~]]:
    z_u = F~^-1 v_u; z_p = S~^-1 (v_p + D z_u)."""
    n = op.grid.n

    def apply(v):
        vu, vp = split_uv_p(op, v)
        zu = f_inner(vu)
        rp = op.D.apply(unpack_vel(op, zu))["p"].ravel() + vp
        return jnp.concatenate([zu, schur_inner(rp)])

    return apply


def make_mass_schur_inner(op: MultiphaseOperator) -> Callable:
    """Viscosity-weighted pressure-mass approximation of the Schur inverse:
    S ~ -(1/eta_mix) Mp  =>  S~^-1 v ~ -eta_mix * v (unit cell mass after the
    dx*dy weighting cancels in the saddle-point scaling). The classical
    spectrally-equivalent Schur approximation for variable-viscosity Stokes
    (BASELINE configs[1]); eta_mix = eta_n theta_n + eta_s theta_s at cells."""
    p = op.params
    eta_mix = (p["eta_n"] * op.phase_n.cell
               + p["eta_s"] * op.phase_s.cell)
    scale = jnp.asarray(-(p["d"] * -1.0) * eta_mix).ravel()

    def apply(v):
        return scale * v

    return apply


# ---------------------------------------------------------------------------
# Pressure-nullspace projection: the periodic problem has the constant-p
# nullspace the reference fought with commented-out projections
# (reference solve.py:260-272); provide the principled version.
# ---------------------------------------------------------------------------
def project_pressure_mean(op: MultiphaseOperator, v: jax.Array) -> jax.Array:
    nu, np_ = _sizes(op)
    vu, vp = v[:nu], v[nu:]
    vp = vp - jnp.mean(vp)
    return jnp.concatenate([vu, vp])


def wrap_with_pressure_projection(op: MultiphaseOperator,
                                  pc: Callable) -> Callable:
    def apply(v):
        return project_pressure_mean(op, pc(v))

    return apply
