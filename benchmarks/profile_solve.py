"""On-chip decomposition of the END-TO-END solve loop (VERDICT r4 item #1).

SOLVE_r04 recorded ~190 ms per ir-mode inner iteration while the measured
components (PC apply 23 ms, matvec <1 ms, contractions ~3 ms) account for
~25 ms. This harness attributes the rest by timing each layer of the solve
separately on the real chip, and quantifies the three structural fixes
landed in r5:

  1. jitted outer residual steps (the eager f64 stencil apply dispatched
     ~100 individual ops through the remote-device relay per outer step);
  2. accelerator-resident hoisted consts (CPU-committed jit arguments
     re-transferred the operator planes + MG hierarchy per call);
  3. chunked Arnoldi orthogonalization (the projections streamed all m+1
     basis rows every iteration — j-proportional now).

Sections (all JSON lines; --out writes the full artifact):
  eager_vs_jit   — one f64 A-apply: eager op-by-op vs one jitted call
  cycle_f32/f64  — identity-PC FGMRES cycles at several m, chunked on/off:
                   per-iteration cost of the bare Krylov recurrence
                   (matvec + orthogonalization + basis carry)
  ir_warm        — full warm fgmres_ir at 512^2 (production ir mode)
  hybrid_warm    — full warm hybrid solve (f64 FGMRES + mixed PC)
  trace          — jax.profiler device trace of a few warm cycles (best
                   effort; the relay may not support profiling)

Usage: python benchmarks/profile_solve.py [--n 512] [--out PROFILE_r05.json]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sections", default=None,
                    help="comma list: eager_vs_jit,cycles,ir,hybrid,trace")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = _os.path.join(_REPO_ROOT, ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from mpbp_tpu.drivers import a_matvec, make_preconditioner, \
        make_preconditioner_mixed, pack_fields
    from mpbp_tpu.models import mms
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.solvers import gmres as krylov
    from mpbp_tpu.solvers.mixed import block_scales, fgmres_ir
    from mpbp_tpu.utils.hoist import to_accelerator

    n = args.n
    dev = jax.devices()[0]
    log(f"profile_solve: device={dev}, n={n}")
    cpu0 = jax.devices("cpu")[0]
    results = []

    def emit(section, **kw):
        row = {"section": section, "n": n, **kw}
        results.append(row)
        print(json.dumps(row), flush=True)

    t0 = time.time()
    with jax.default_device(cpu0):
        op32 = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0,
                                        eta_n=100.0, eta_s=1.0,
                                        dtype=jnp.float32)
        op64 = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0,
                                        eta_n=100.0, eta_s=1.0,
                                        dtype=jnp.float64)
        prob = mms.variable_thn_problem(1.0, -1.0, 1.0, 100.0, 1.0)
        u_exact, b = mms.fill_sol_and_rhs(op64.grid, prob)
        b64 = pack_fields(op64, b)
    emit("setup", seconds=round(time.time() - t0, 2))

    b64 = to_accelerator(b64)
    b32 = to_accelerator(b64.astype(jnp.float32))
    mv64 = a_matvec(op64)
    mv32 = a_matvec(op32)
    bnorm = float(jnp.linalg.norm(b64))

    sel = set(args.sections.split(",")) if args.sections else None

    def on(name):
        return sel is None or name in sel

    # ---------------------------------------------------------------- #
    if on("eager_vs_jit"):
        try:
            x = jnp.zeros_like(b64)
            # jitted (residual_norm): warm then time
            _, rn = krylov.residual_norm(mv64, b64, x)
            float(rn)
            t0 = time.time()
            for _ in range(3):
                _, rn = krylov.residual_norm(mv64, b64, x)
                float(rn)
            t_jit = (time.time() - t0) / 3
            # eager: each op dispatched individually (old fgmres_ir outer)
            t0 = time.time()
            r = b64 - mv64(x)
            float(jnp.linalg.norm(r))
            t_eager = time.time() - t0
            emit("eager_vs_jit", eager_apply_s=round(t_eager, 3),
                 jitted_apply_s=round(t_jit, 4),
                 speedup=round(t_eager / max(t_jit, 1e-9), 1))
        except Exception as e:
            emit("eager_vs_jit", failed=f"{type(e).__name__}: {e}"[:300])

    # ---------------------------------------------------------------- #
    # bare-cycle per-iteration cost: identity PC, real fused matvec,
    # tol=0 forces exactly m iterations.
    def time_cycle(mv, bvec, m, chunked, label, reps=2):
        try:
            def run():
                t0 = time.time()
                res = krylov.fgmres(mv, bvec, tol=0.0, maxiter=m,
                                    chunked=chunked)
                float(res.relres)
                return time.time() - t0, int(res.iters)

            t_first, _ = run()
            ts = [run() for _ in range(reps)]
            t = min(s for s, _ in ts)
            it = ts[0][1]
            emit(label, m=m, chunked=chunked, iters=it,
                 compile_s=round(t_first, 1),
                 warm_s=round(t, 3),
                 ms_per_iter=round(1e3 * t / max(it, 1), 2))
        except Exception as e:
            emit(label, m=m, chunked=chunked,
                 failed=f"{type(e).__name__}: {e}"[:300])

    if on("cycles"):
        for m in (16, 40, 150):
            for chunked in (False, True):
                time_cycle(mv32, b32, m, chunked, "cycle_f32")
        for m in (16, 32):
            for chunked in (False, True):
                time_cycle(mv64, b64, m, chunked, "cycle_f64")

    # ---------------------------------------------------------------- #
    if on("ir"):
        try:
            with jax.default_device(cpu0):
                M32 = make_preconditioner(op32, "lsc_mg_full",
                                          inner_tol=1e-4, inner_iters=40,
                                          dtype=jnp.float32)
            scale = block_scales(op64)

            def run_ir():
                t0 = time.time()
                res = fgmres_ir(mv64, mv32, b64, tol=1e-8, max_outer=5,
                                inner_tol=1e-6, inner_maxiter=40, M32=M32,
                                scale=scale)
                return res, time.time() - t0

            res, t_first = run_ir()
            res, t_warm = run_ir()
            res2, t_warm2 = run_ir()
            t_warm = min(t_warm, t_warm2)
            emit("ir_warm", compile_s=round(t_first, 1),
                 warm_s=round(t_warm, 2),
                 outer=res.outer_iters, inner=res.total_inner_iters,
                 relres=float(res.relres), converged=bool(res.converged),
                 ms_per_inner_iter=round(
                     1e3 * t_warm / max(res.total_inner_iters, 1), 1))
        except Exception as e:
            emit("ir_warm", failed=f"{type(e).__name__}: {e}"[:300])

    # ---------------------------------------------------------------- #
    if on("hybrid"):
        try:
            with jax.default_device(cpu0):
                Mh = make_preconditioner_mixed(op64, op32, "lsc_mg_full",
                                               inner_tol=1e-4,
                                               inner_iters=40)

            def run_h():
                t0 = time.time()
                res = krylov.fgmres(mv64, b64, tol=1e-10, maxiter=40, M=Mh)
                _, rn = krylov.residual_norm(mv64, b64, res.x)
                relres = float(rn) / bnorm
                return res, relres, time.time() - t0

            res, relres, t_first = run_h()
            res, relres, t_warm = run_h()
            res2, relres2, t_warm2 = run_h()
            t_warm = min(t_warm, t_warm2)
            it = int(res.iters)
            emit("hybrid_warm", compile_s=round(t_first, 1),
                 warm_s=round(t_warm, 2), iters=it, relres=relres,
                 converged=bool(res.converged),
                 ms_per_iter=round(1e3 * t_warm / max(it, 1), 1))
        except Exception as e:
            emit("hybrid_warm", failed=f"{type(e).__name__}: {e}"[:300])

    # ---------------------------------------------------------------- #
    if on("trace"):
        try:
            tdir = _os.path.join(_REPO_ROOT, "artifacts", "trace_r05")
            _os.makedirs(tdir, exist_ok=True)
            with jax.profiler.trace(tdir):
                res = krylov.fgmres(mv32, b32, tol=0.0, maxiter=8)
                float(res.relres)
            files = []
            for root, _d, fs in _os.walk(tdir):
                files += [f for f in fs]
            emit("trace", dir=tdir, n_files=len(files),
                 supported=len(files) > 0)
        except Exception as e:
            emit("trace", failed=f"{type(e).__name__}: {e}"[:300])

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"device": str(dev), "n": n, "results": results},
                      f, indent=1)


if __name__ == "__main__":
    main()
