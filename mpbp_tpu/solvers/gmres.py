"""JAX-native Krylov drivers: FGMRES / GMRES / CG.

TPU-native replacement for the reference's outer Krylov layer
(pyamg.krylov.fgmres at reference solve.py:8, 207, 237, 285 and
scipy gmres at solve.py:221). Design choices for TPU:

  * The whole solve is one `lax.while_loop` under `jit` — no host round-trips
    per iteration (the reference pays a Python->BLAS boundary every matvec).
  * Orthogonalization is classical Gram-Schmidt with one re-orthogonalization
    pass (CGS2): two (m x N) GEMVs per iteration instead of m sequential dots,
    so the reductions are two fused all-reduces on a sharded mesh — the
    "fused Arnoldi reduction" of SURVEY.md section 2.4. CGS2 has MGS-grade
    stability in practice (Giraud et al.).
  * The Hessenberg QR is maintained incrementally with Givens rotations on
    SMEM-resident scalars; the residual estimate |g[j+1]| is monitored inside
    the loop, so convergence checks cost nothing.
  * Flexible preconditioning stores Z_j = M(v_j) (pyamg fgmres semantics):
    required because inner solves (ILU sweeps, inner Krylov, multigrid) vary
    per iteration.

Solvers are shape-agnostic: vectors may be flat 1-D arrays or stacked grid
fields (e.g. (5, n, n) sharded over a device mesh — inner products then lower
to per-shard partials + one all-reduce). Use `flatten_op` to adapt grid-field
operators to flat vectors where convenient.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KrylovResult(NamedTuple):
    x: jax.Array
    iters: jax.Array          # number of iterations performed
    relres: jax.Array         # final relative residual estimate
    res_history: jax.Array    # (maxiter+1,) residual-norm estimates, NaN-padded
    converged: jax.Array


class ArnoldiState(NamedTuple):
    """Mid-solve FGMRES/GMRES state (the while_loop carry) — checkpointable
    via utils.checkpoint.save_arnoldi_state (SURVEY.md section 5.3:
    'checkpoint Arnoldi state for restart'). Resuming with the same
    (matvec, b, x0, maxiter, M) continues the identical Krylov recurrence."""

    j: jax.Array       # iterations completed
    V: jax.Array       # (m+1, *S) orthonormal basis
    Z: jax.Array       # (m or 0, *S) flexible preconditioned basis
    H: jax.Array       # (m+1, m) rotated Hessenberg (R factor)
    cs: jax.Array      # (m,) Givens cosines
    sn: jax.Array      # (m,) Givens sines
    g: jax.Array       # (m+1,) rotated rhs
    hist: jax.Array    # (m+1,) residual estimates, NaN-padded
    done: jax.Array    # convergence/breakdown flag


def flatten_op(op_apply: Callable, template: dict, fields) -> Callable:
    """Adapt a grid-field operator to flat vectors."""
    fields = tuple(fields)
    shapes = {f: template[f].shape for f in fields}
    sizes = [int(np.prod(shapes[f])) for f in fields]
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    def matvec(v):
        x = {f: v[int(offsets[i]):int(offsets[i + 1])].reshape(shapes[f])
             for i, f in enumerate(fields)}
        y = op_apply(x)
        return jnp.concatenate([y[f].ravel() for f in fields])

    return matvec


def _identity(v):
    return v


# ---------------------------------------------------------------------------
# Closure-constant hoisting. The jitted Krylov cycles take matvec/M as STATIC
# arguments, so every array they close over (stencil coefficient planes, MG
# hierarchies, ILU factors) is baked into the compiled program as an HLO
# constant. At 2048^2 the LSC-MG preconditioner's planes total >500 MB and the
# AOT compile payload blows past the remote-compile relay's request limit
# (observed on chip: HTTP 413 at n=2048, fine at n=512). jax.closure_convert
# lifts those arrays into explicit arguments, which the cycle jits below
# thread through as ordinary device buffers instead.
# ---------------------------------------------------------------------------
from mpbp_tpu.utils.hoist import hoist_closure as _hoist  # noqa: E402


def _tdot(a, b, axes):
    """Arnoldi contraction at HIGHEST precision. On TPU the default matmul
    precision multiplies in bf16 (~3 decimal digits) — fatal for
    Gram-Schmidt on ill-conditioned systems (measured: the 512^2 stiff solve
    stalls at relres ~2e-2 with default-precision projections). These GEMVs
    are HBM-bound (streaming V), so exact-f32 multiplies cost ~nothing.

    f64 takes a broadcast-multiply + tree-sum path instead of tensordot:
    the TPU f64 dot lowers to a ~8x-slower emulation (measured r4 at
    (19, 1.31M): tensordot 24.9 ms vs mul+sum 3.1 ms — it was 97% of the
    hybrid solve's outer-iteration cost). Only the two contraction shapes
    the Arnoldi code uses are specialized; anything else falls through.
    Under a sharded mesh the sum over sharded axes is still one psum (the
    fused all-reduce), same as the tensordot lowering."""
    if jnp.result_type(a, b) == jnp.float64:
        a_ax, b_ax = axes
        if (len(b_ax) == jnp.ndim(b)
                and tuple(a_ax) == tuple(range(1, jnp.ndim(a)))):
            # (m, *S) x (*S) -> (m,): projection GEMV
            return jnp.sum(a * b[None], axis=tuple(range(1, jnp.ndim(a))))
        if (tuple(a_ax) == (0,) and tuple(b_ax) == (0,)
                and jnp.ndim(a) == 1):
            # (m,) x (m, *S) -> (*S): basis expansion
            return jnp.sum(
                a.reshape(a.shape + (1,) * (jnp.ndim(b) - 1)) * b, axis=0)
    return jnp.tensordot(a, b, axes=axes, precision=jax.lax.Precision.HIGHEST)


def _vdot(a, b):
    """Inner product over all axes — on sharded operands this is a local
    partial sum + one all-reduce (the fused Arnoldi reduction)."""
    return jnp.sum(a * b)


# Row-chunk size for the chunked orthogonalization path. 8 basis rows per
# dynamic slice keeps each partial GEMV large enough to stream at full HBM
# rate while the dynamic trip count stops the projections from touching the
# zero rows beyond the current Krylov dimension.
_CHUNK = 8


def _chunk_auto(dtype, m: int) -> bool:
    """Whether the Arnoldi orthogonalization should stream the basis in
    j-proportional chunks instead of all m+1 rows every iteration.

    The full-basis contraction costs O(m * N) HBM traffic per iteration
    regardless of how many basis vectors exist yet. That is invisible for
    small f32 cycles but dominates two regimes (measured on chip, r4/r5):
      * f64 bases stream at the emulated-f64 25-65 GB/s — at 512^2 with
        m=32 the four CGS2 contractions alone cost ~20-50 ms/iter;
      * long f32 cycles (inner_maxiter >= ~64) multiply the streamed bytes
        by m/j_avg ~ 2-4x.
    Chunking makes the cost scale with the CURRENT dimension j: the loop
    runs ceil((j+1)/8) dynamic-sliced partial GEMVs. Exact same sums, so
    the recurrence is bit-compatible up to reduction order."""
    return dtype == jnp.float64 or (m + 1) > 4 * _CHUNK


def _vnorm(a):
    return jnp.sqrt(_vdot(a, a))


def _arnoldi_init(matvec, b, x0, m: int, use_z: bool, tol,
                  chunked: bool = False) -> ArnoldiState:
    """Fresh Arnoldi state from the initial residual. With `chunked` the V
    row count is padded to a _CHUNK multiple (extra rows stay zero and never
    enter the recurrence) so the chunked projections slice exact blocks."""
    S = b.shape
    dtype = b.dtype
    b_norm = _vnorm(b)
    safe_bnorm = jnp.where(b_norm == 0, 1.0, b_norm)

    r0 = b - matvec(x0)
    beta = _vnorm(r0)

    mv_rows = (-(-(m + 1) // _CHUNK) * _CHUNK) if chunked else (m + 1)
    V = jnp.zeros((mv_rows, *S), dtype)
    Z = jnp.zeros((m if use_z else 0, *S), dtype)
    H = jnp.zeros((m + 1, m), dtype)       # stores the R factor (rotated)
    cs = jnp.zeros(m, dtype)
    sn = jnp.zeros(m, dtype)
    g = jnp.zeros(m + 1, dtype).at[0].set(beta)
    hist = jnp.full(m + 1, jnp.nan, dtype).at[0].set(beta)
    V = V.at[0].set(jnp.where(beta > 0, r0 / beta, r0))
    return ArnoldiState(jnp.array(0), V, Z, H, cs, sn, g, hist,
                        (beta / safe_bnorm) < tol)


def _arnoldi_body(matvec, M, use_z: bool, orthog: str, m: int, tol,
                  safe_bnorm, chunked: bool = False, aug=None):
    """The FGMRES iteration as a while_loop body over ArnoldiState.

    `aug`: optional (k, *S) augmentation directions consumed as the LAST k
    flexible directions of the cycle (z_j = aug[j - (m-k)] for j >= m-k
    instead of M(v_j)) — the LGMRES augmented-restart scheme (Baker-
    Jessup-Manteuffel 2005). The flexible recurrence never requires
    z_j = M(v_j), so the minimization runs over K_{m-k} + span{aug} with
    zero extra machinery: x = x0 + Z y already accounts for arbitrary Z
    columns. The aug directions must come LAST: the Krylov chain grows
    from whatever the previous v_j was, so aug-first would build the
    'Krylov' part on A*aug instead of r0 (measured: aug-first is WORSE
    than plain restarts; aug-last cuts the restarted iteration count).
    Cycles seeded with the previous cycles' error directions break the
    alternating stagnation plain restarts suffer on hard systems."""

    def body(carry):
        j, V, Z, H, cs, sn, g, hist, done = carry
        v = V[j]
        if aug is not None:
            k_aug = aug.shape[0]
            start = m - k_aug
            z = jax.lax.cond(
                j >= start,
                lambda: aug[jnp.clip(j - start, 0, k_aug - 1)].astype(
                    v.dtype),
                lambda: M(v))
        else:
            z = M(v)
        w = matvec(z)
        if use_z:
            Z = Z.at[j].set(z)

        # Rows of V beyond j are zero, so the masked dots vanish.
        # Each projection is one tensordot => one fused all-reduce.
        vdims = tuple(range(1, V.ndim))
        wdims = tuple(range(w.ndim))

        if chunked:
            # j-proportional basis streaming (see _chunk_auto): the
            # projections/expansions run ceil((j+1)/_CHUNK) partial GEMVs
            # over exact row blocks instead of one m-row contraction. Same
            # sums (rows beyond j are zero), cost scales with j not m.
            Vb = V.reshape(V.shape[0] // _CHUNK, _CHUNK, *V.shape[1:])
            bdims = tuple(range(1, V.ndim))

            def _proj(w, nch):
                def pbody(c, h):
                    hb = _tdot(Vb[c], w, (bdims, wdims))
                    return jax.lax.dynamic_update_slice_in_dim(
                        h, hb, c * _CHUNK, 0)
                h0 = jnp.zeros(V.shape[0], w.dtype)
                return jax.lax.fori_loop(0, nch, pbody, h0)

            def _expand_sub(w, h, nch):
                def ebody(c, w):
                    hb = jax.lax.dynamic_slice_in_dim(h, c * _CHUNK,
                                                      _CHUNK, 0)
                    return w - _tdot(hb, Vb[c], ((0,), (0,)))
                return jax.lax.fori_loop(0, nch, ebody, w)
        else:
            def _proj(w, nch):
                return _tdot(V, w, (vdims, wdims))

            def _expand_sub(w, h, nch):
                return w - _tdot(h, V, ((0,), (0,)))

        # chunks covering basis rows 0..j
        nch = (j + _CHUNK) // _CHUNK

        if orthog == "cgs2":
            # classical Gram-Schmidt + one re-orthogonalization pass:
            # two reductions per iteration, MGS-grade stability.
            wnorm_pre = _vnorm(w)
            h1 = _proj(w, nch)
            w = _expand_sub(w, h1, nch)
            h2 = _proj(w, nch)
            w = _expand_sub(w, h2, nch)
            h = (h1 + h2)[:m + 1]
            wnorm = _vnorm(w)
        elif chunked:  # "cgs1" chunked: the concat-fused single reduction
            # would stream all m rows; chunked form keeps the DGKS guard
            # with a separate ||w||^2 reduction (still O(j) basis traffic).
            def _cgs_pass(w):
                hp = _proj(w, nch)
                ww = _vdot(w, w)
                w = _expand_sub(w, hp, nch)
                est2 = ww - jnp.sum(hp * hp)
                return hp[:m + 1], ww, est2, w

            h, ww, est2, w = _cgs_pass(w)
            wnorm_pre = jnp.sqrt(jnp.maximum(ww, 0.0))

            def _reorth(h, w):
                h2, _ww2, est2b, w = _cgs_pass(w)
                return (h + h2, jnp.sqrt(jnp.maximum(est2b, 0.0)), w)

            def _accept(h, w):
                return (h, jnp.sqrt(jnp.maximum(est2, 0.0)), w)

            h, wnorm, w = jax.lax.cond(est2 < 0.5 * ww, _reorth, _accept,
                                       h, w)
        else:  # "cgs1": communication-avoiding / pipelined variant
            # ONE fused reduction per iteration: [V; w]^T w yields all the
            # projection coefficients AND ||w||^2 together, and the new
            # basis norm comes from the Pythagorean identity
            # ||w - V h||^2 = ||w||^2 - ||h||^2 (Ghysels & Vanroose-style
            # latency hiding — the TPU analog keeps one psum per iteration).
            # Stability guard: DGKS selective reorthogonalization — when the
            # projection removed more than 1/sqrt(2) of w's norm, run one
            # corrective CGS pass (one extra fused reduction on just those
            # iterations; with an effective preconditioner most iterations
            # skip it, so the steady-state cost stays ~1 reduction/iter).
            def _cgs_pass(w):
                Vw = jnp.concatenate([V, w[None]], axis=0)
                dots = _tdot(Vw, w, (vdims, wdims))
                hp, ww = dots[:-1], dots[-1]
                w = w - _tdot(hp, V, ((0,), (0,)))
                est2 = ww - jnp.sum(hp * hp)
                return hp, ww, est2, w

            h, ww, est2, w = _cgs_pass(w)
            wnorm_pre = jnp.sqrt(jnp.maximum(ww, 0.0))

            def _reorth(h, w):
                h2, _ww2, est2b, w = _cgs_pass(w)
                return (h + h2, jnp.sqrt(jnp.maximum(est2b, 0.0)), w)

            def _accept(h, w):
                return (h, jnp.sqrt(jnp.maximum(est2, 0.0)), w)

            h, wnorm, w = jax.lax.cond(est2 < 0.5 * ww, _reorth, _accept,
                                       h, w)
        # Happy breakdown: A z landed (numerically) inside the current Krylov
        # space. Normalizing the O(eps) remainder would inject a garbage
        # basis vector and silently decouple the residual recurrence from the
        # true residual (seen on singular Schur complements) — instead the
        # column ends here and the solve stops after this update.
        breakdown = wnorm <= 1e-12 * wnorm_pre
        h = h.at[j + 1].set(jnp.where(breakdown, 0.0, wnorm))
        V = V.at[j + 1].set(
            jnp.where(breakdown, jnp.zeros_like(w), w / jnp.where(
                wnorm > 0, wnorm, 1.0)))

        # Apply existing Givens rotations to the new column.
        def rot_body(i, hv):
            hi = cs[i] * hv[i] + sn[i] * hv[i + 1]
            hip = -sn[i] * hv[i] + cs[i] * hv[i + 1]
            valid = i < j
            hv = hv.at[i].set(jnp.where(valid, hi, hv[i]))
            hv = hv.at[i + 1].set(jnp.where(valid, hip, hv[i + 1]))
            return hv

        h = jax.lax.fori_loop(0, m, rot_body, h)

        # New rotation annihilating h[j+1].
        rho = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
        rho_safe = jnp.where(rho == 0, 1.0, rho)
        c_new = jnp.where(rho == 0, 1.0, h[j] / rho_safe)
        s_new = jnp.where(rho == 0, 0.0, h[j + 1] / rho_safe)
        cs = cs.at[j].set(c_new)
        sn = sn.at[j].set(s_new)
        h = h.at[j].set(c_new * h[j] + s_new * h[j + 1]).at[j + 1].set(0.0)
        H = H.at[:, j].set(h)

        g_jp1 = -s_new * g[j]
        g = g.at[j + 1].set(g_jp1).at[j].set(c_new * g[j])
        res = jnp.abs(g_jp1)
        hist = hist.at[j + 1].set(res)

        done = ((res / safe_bnorm) < tol) | breakdown
        return ArnoldiState(j + 1, V, Z, H, cs, sn, g, hist, done)

    return body


def _arnoldi_solution(state: ArnoldiState, x0, m: int, M, use_z: bool,
                      safe_bnorm) -> KrylovResult:
    """Assemble x from the (possibly mid-solve) Arnoldi state."""
    j, V, Z, H, cs, sn, g, hist, done = state
    dtype = H.dtype

    # Back-substitution on the j x j triangular system (masked to full m).
    valid = jnp.arange(m) < j
    diag = jnp.where(valid, jnp.diagonal(H[:m, :m]), 1.0)
    Hsolve = jnp.where(valid[None, :] & valid[:, None], H[:m, :m],
                       jnp.eye(m, dtype=dtype))
    Hsolve = Hsolve.at[jnp.arange(m), jnp.arange(m)].set(
        jnp.where(valid, diag, 1.0))
    rhs = jnp.where(valid, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Hsolve, rhs, lower=False)
    y = jnp.where(valid, y, 0.0)

    if use_z:
        dx = _tdot(y, Z, ((0,), (0,)))
    else:
        dx = M(_tdot(y, V[:m], ((0,), (0,))))
    x = x0 + dx
    res_final = jnp.where(j > 0, jnp.abs(g[jnp.minimum(j, m)]), hist[0])
    return KrylovResult(x, j, res_final / safe_bnorm, hist, done)


@partial(jax.jit, static_argnames=("matvec", "M", "maxiter", "use_z",
                                   "orthog", "chunked"))
def _fgmres_cycle(matvec, b, x0, tol, maxiter: int, M, use_z: bool,
                  orthog: str = "cgs2", mv_consts=(), M_consts=(),
                  chunked: bool = False, aug=None):
    """One FGMRES cycle. `b`/`x0` may be ANY array shape (1-D flat vectors or
    stacked grid fields (5, n, n) for the sharded path); the Krylov basis adds
    a leading axis. matvec/M are hoisted forms fn(v, *consts) — see _hoist —
    with their closure arrays arriving through mv_consts/M_consts as dynamic
    arguments. The jit here is what makes the hoist effective: un-jitted,
    the while_loop body would close over the consts as concrete arrays and
    re-bake them into the computation as HLO literals — the compile payload
    then scales with operator size and the remote-compile relay rejects the
    2048^2 inner solve with HTTP 413 (observed on chip, r3)."""
    mv = lambda v: matvec(v, *mv_consts)        # noqa: E731
    Mp = lambda v: M(v, *M_consts)              # noqa: E731
    m = maxiter
    b_norm = _vnorm(b)
    safe_bnorm = jnp.where(b_norm == 0, 1.0, b_norm)

    state = _arnoldi_init(mv, b, x0, m, use_z, tol, chunked)
    body = _arnoldi_body(mv, Mp, use_z, orthog, m, tol, safe_bnorm, chunked,
                         aug)

    def cond(c):
        return (~c.done) & (c.j < m)

    state = jax.lax.while_loop(cond, body, state)
    return _arnoldi_solution(state, x0, m, Mp, use_z, safe_bnorm)


@partial(jax.jit, static_argnames=("matvec", "M", "maxiter", "use_z",
                                   "orthog", "max_steps", "chunked"))
def _fgmres_steps(matvec, b, x0, tol, maxiter: int, M, use_z: bool,
                  orthog: str, state: ArnoldiState | None,
                  max_steps: int | None, mv_consts=(), M_consts=(),
                  chunked: bool = False):
    """Run at most `max_steps` more iterations from `state` (fresh state if
    None), returning (KrylovResult, ArnoldiState) — the checkpointable
    driver behind fgmres_resumable."""
    mv = lambda v: matvec(v, *mv_consts)        # noqa: E731
    Mp = lambda v: M(v, *M_consts)              # noqa: E731
    m = maxiter
    b_norm = _vnorm(b)
    safe_bnorm = jnp.where(b_norm == 0, 1.0, b_norm)

    if state is None:
        state = _arnoldi_init(mv, b, x0, m, use_z, tol, chunked)
    body = _arnoldi_body(mv, Mp, use_z, orthog, m, tol, safe_bnorm, chunked)
    j_stop = m if max_steps is None else jnp.minimum(state.j + max_steps, m)

    def cond(c):
        return (~c.done) & (c.j < j_stop)

    state = jax.lax.while_loop(cond, body, state)
    return _arnoldi_solution(state, x0, m, Mp, use_z, safe_bnorm), state


def fgmres_resumable(matvec: Callable, b: jax.Array,
                     x0: jax.Array | None = None, tol: float = 1e-8,
                     maxiter: int = 100, M: Callable | None = None,
                     orthog: str = "cgs2", state: ArnoldiState | None = None,
                     max_steps: int | None = None,
                     chunked: bool | None = None
                     ) -> tuple[KrylovResult, ArnoldiState]:
    """Flexible GMRES that can stop mid-solve and resume exactly.

    Returns (result, state). Run with `max_steps=k` to advance at most k
    iterations; persist the state with utils.checkpoint.save_arnoldi_state;
    resume by passing the loaded state back (with the same b/x0/maxiter/M).
    A resumed solve walks the identical Krylov recurrence, so iterates and
    history match the uninterrupted solve (tests/test_gmres.py)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if chunked is None:
        chunked = _chunk_auto(b.dtype, maxiter)
    matvec, mvc = _hoist(matvec, b)
    M, Mc = _hoist(M, b)
    return _fgmres_steps(matvec, b, x0, tol, maxiter, M, True, orthog,
                         state, max_steps, mvc, Mc, chunked)


def fgmres(matvec: Callable, b: jax.Array, x0: jax.Array | None = None,
           tol: float = 1e-8, maxiter: int = 100,
           M: Callable | None = None, restart: int | None = None,
           orthog: str = "cgs2", chunked: bool | None = None,
           aug_k: int = 0) -> KrylovResult:
    """Flexible right-preconditioned GMRES.

    Matches the reference usage (pyamg fgmres with restrt=None, reference
    solve.py:285): no restarts by default — maxiter is the Krylov dimension.
    Pass `restart` to run restarted cycles (host loop over jitted cycles).

    orthog: 'cgs2' (default; two fused all-reduces per iteration,
    MGS-grade stability) or 'cgs1' (pipelined/communication-avoiding: ONE
    fused all-reduce per iteration with a Pythagorean norm estimate —
    the right choice when the mesh spans hosts and reduction latency rivals
    the matvec, BASELINE configs[4]).

    aug_k > 0 (restarted solves only) enables LGMRES-style AUGMENTED
    restarts: each cycle's first aug_k flexible directions are the
    normalized error approximations dx of the previous cycles, so the
    minimization runs over span{dx_prev} + K_{restart-aug_k}. This breaks
    the alternating stagnation plain restarts suffer when the restart
    length is memory-bound (measured r5, 2048^2 hybrid restart 15: 116
    plain restarted iterations vs 21 unrestarted at 1024^2).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if chunked is None:
        chunked = _chunk_auto(b.dtype, restart or maxiter)
    matvec, mvc = _hoist(matvec, b)
    M, Mc = _hoist(M, b)
    if restart is None or restart >= maxiter:
        return _fgmres_cycle(matvec, b, x0, tol, maxiter, M, True, orthog,
                             mvc, Mc, chunked)

    return _restarted(matvec, b, x0, tol, maxiter, restart, M, True, orthog,
                      mvc, Mc, chunked, aug_k)


def gmres(matvec: Callable, b: jax.Array, x0: jax.Array | None = None,
          tol: float = 1e-8, maxiter: int = 100,
          M: Callable | None = None, restart: int | None = None,
          orthog: str = "cgs2", chunked: bool | None = None) -> KrylovResult:
    """Right-preconditioned GMRES with a *fixed* preconditioner: avoids
    storing the Z basis (halves Krylov memory) by re-applying M once at the
    solution update. See `fgmres` for `orthog`."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if chunked is None:
        chunked = _chunk_auto(b.dtype, restart or maxiter)
    matvec, mvc = _hoist(matvec, b)
    M, Mc = _hoist(M, b)
    if restart is None or restart >= maxiter:
        return _fgmres_cycle(matvec, b, x0, tol, maxiter, M, False, orthog,
                             mvc, Mc, chunked)
    return _restarted(matvec, b, x0, tol, maxiter, restart, M, False, orthog,
                      mvc, Mc, chunked)


@partial(jax.jit, static_argnames=("matvec",))
def _resnorm_jit(matvec, b, x, mv_consts=()):
    r = b - matvec(x, *mv_consts)
    return r, jnp.sqrt(jnp.sum(r * r))


def residual_norm(matvec: Callable, b: jax.Array, x: jax.Array):
    """(r, ||r||) = (b - A x, its 2-norm) as ONE jitted call with hoisted
    operator constants. The drivers' outer loops and end-of-solve true-
    residual checks must use this instead of calling `matvec` eagerly: an
    un-jitted stencil apply dispatches ~100 individual ops — measured r5 on
    chip through the remote-device relay, seconds per call vs ~1 ms jitted
    (it was most of the unexplained 'ir' solve-loop overhead, VERDICT r4
    weak #1)."""
    mv, mvc = _hoist(matvec, b)
    return _resnorm_jit(mv, b, x, tuple(mvc))


def _host_scalar(x):
    """Host value of a replicated solver scalar — multi-process jax refuses
    plain np.asarray on arrays spanning non-addressable devices; for
    replicated values the local shard is the value."""
    if hasattr(x, "addressable_shards"):
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def _restarted(matvec, b, x0, tol, maxiter, restart, M, use_z, orthog,
               mv_consts=(), M_consts=(), chunked: bool = False,
               aug_k: int = 0) -> KrylovResult:
    """Host loop over jitted cycles with a correctly stitched history.

    The stitched history has one entry per residual-norm estimate: the
    initial residual, then one per iteration — a cycle's entry 0 duplicates
    the previous cycle's final residual, so it is dropped for every cycle
    after the first. `iters` therefore always equals len(history) - 1.

    aug_k > 0 keeps the last aug_k normalized cycle corrections dx and
    seeds the next cycle with them (LGMRES augmentation; see fgmres)."""
    x = x0
    total_iters = 0
    hists = []
    result = None
    remaining = maxiter
    augs: list = []
    while remaining > 0:
        cycle = min(restart, remaining)
        # aug needs room for a genuine Krylov part (cycle > k+1); the final
        # short cycle runs plain
        aug = (jnp.stack(augs) if augs and cycle > len(augs) + 1 else None)
        result = _fgmres_cycle(matvec, b, x, tol, cycle, M, use_z, orthog,
                               mv_consts, M_consts, chunked, aug)
        it = int(_host_scalar(result.iters))
        if aug_k > 0 and it > 0:
            dx = result.x - x
            nrm = float(_host_scalar(jnp.sqrt(jnp.sum(dx * dx))))
            if nrm > 0:
                augs = (augs + [dx / nrm])[-aug_k:]
            else:               # no progress: next cycle runs plain
                augs = []
        x = result.x
        total_iters += it
        h = _host_scalar(result.res_history)[: it + 1]
        hists.append(h if not hists else h[1:])
        remaining -= it if it > 0 else cycle   # breakdown: don't loop forever
        if bool(_host_scalar(result.converged)) or it == 0:
            break
    hist = np.concatenate(hists) if hists else np.array([])
    full_hist = jnp.full(maxiter + 1, jnp.nan, b.dtype)
    full_hist = full_hist.at[: len(hist)].set(jnp.asarray(hist))
    return KrylovResult(x, jnp.asarray(total_iters), result.relres,
                        full_hist, result.converged)


def cg(matvec: Callable, b: jax.Array, x0: jax.Array | None = None,
       tol: float = 1e-8, maxiter: int = 200, M: Callable = _identity
       ) -> KrylovResult:
    """Preconditioned conjugate gradients for SPD operators (inner solves on
    the pressure Poisson block Gt_G — the SPD analog of the reference's ILU
    inner solve at solve.py:265). Closure arrays are hoisted to jit
    arguments like fgmres (see _hoist)."""
    matvec, mvc = _hoist(matvec, b)
    M, Mc = _hoist(M, b)
    return _cg_jit(matvec, b, x0, tol, maxiter, M, mvc, Mc)


@partial(jax.jit, static_argnames=("matvec", "M", "maxiter"))
def _cg_jit(matvec, b, x0, tol, maxiter: int, M, mv_consts=(), M_consts=()
            ) -> KrylovResult:
    mv = matvec
    matvec = lambda v: mv(v, *mv_consts)        # noqa: E731
    Mh = M
    M = lambda v: Mh(v, *M_consts)              # noqa: E731
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_norm = _vnorm(b)
    safe_bnorm = jnp.where(b_norm == 0, 1.0, b_norm)

    r = b - matvec(x0)
    z = M(r)
    p = z
    rz = _vdot(r, z)
    hist = jnp.full(maxiter + 1, jnp.nan, b.dtype).at[0].set(_vnorm(r))

    def cond(carry):
        j, x, r, z, p, rz, hist, done = carry
        return (~done) & (j < maxiter)

    def body(carry):
        j, x, r, z, p, rz, hist, done = carry
        Ap = matvec(p)
        pAp = _vdot(p, Ap)
        alpha = jnp.where(pAp != 0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _vdot(r, z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p = z + beta * p
        rn = _vnorm(r)
        hist = hist.at[j + 1].set(rn)
        done = (rn / safe_bnorm) < tol
        return (j + 1, x, r, z, p, rz_new, hist, done)

    init = (jnp.array(0), x0, r, z, p, rz, hist,
            (_vnorm(r) / safe_bnorm) < tol)
    j, x, r, z, p, rz, hist, done = jax.lax.while_loop(cond, body, init)
    return KrylovResult(x, j, _vnorm(r) / safe_bnorm, hist, done)


def jacobi(matvec: Callable, diag: jax.Array, b: jax.Array,
           iters: int = 200, x0: jax.Array | None = None) -> jax.Array:
    """Jacobi sweeps x <- x + D^-1 (b - A x) (reference solve.py:149-159)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    inv_d = 1.0 / diag

    def body(_, x):
        return x + inv_d * (b - matvec(x))

    return jax.lax.fori_loop(0, iters, body, x)
