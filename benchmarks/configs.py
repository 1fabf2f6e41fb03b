"""Run the five BASELINE.json benchmark configs end to end.

Prints one JSON line per config: {config, n, pc, iters, relres, converged,
solve_s, ...}. Usable on CPU (functional validation; pass --small to shrink
grids) or on the TPU chip (perf). configs[3]-[4] exercise the sharded code
path over whatever devices are visible (a real slice, or the virtual CPU
mesh under XLA_FLAGS=--xla_force_host_platform_device_count=8).

  0. 64^2 constant-coefficient Stokes, FGMRES + block-diagonal PC
  1. variable-viscosity Stokes, block lower-triangular PC w/ mass Schur
  2. 256^2 multiphase, approximate-commutator (LSC) Schur via SpGEMM
  3. 512^2 multiphase, sharded, matrix-free MG-LSC inner solves
  4. 1024^2+ multiphase row-partitioned across the mesh, halo-overlap SpMV

Reference never published numbers (SURVEY.md section 6); iteration counts
are checked against the measured CPU baselines in BASELINE.md instead.
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


def _emit(d):
    print(json.dumps(d), flush=True)


def config0(small):
    import jax.numpy as jnp
    from mpbp_tpu.models.stokes import make_stokes_operator, stokes_mms
    from mpbp_tpu.solvers import gmres as krylov
    from mpbp_tpu.solvers.preconditioners import ILUInner

    n = 32 if small else 64
    op = make_stokes_operator(n, c=1.0, d=-1.0, eta=1.0)
    u_ex, b = stokes_mms(op.grid, 1.0, -1.0, eta=1.0)
    mv = krylov.flatten_op(op.A.apply, u_ex, ("u", "v", "p"))
    b_vec = jnp.concatenate([b[f].ravel() for f in ("u", "v", "p")])
    f_inner = ILUInner.ilut_of(op.F, fill=100, tau=1e-3)
    n2 = n * n

    def pc(v):
        return jnp.concatenate([f_inner(v[:2 * n2]), -v[2 * n2:]])

    t0 = time.time()
    res = krylov.fgmres(mv, b_vec, tol=1e-8, maxiter=200, M=pc)
    _emit({"config": 0, "desc": "stokes const-eta block_diag", "n": n,
           "iters": int(res.iters), "relres": float(res.relres),
           "converged": bool(res.converged),
           "solve_s": round(time.time() - t0, 3)})


def config1(small):
    import jax.numpy as jnp
    import numpy as np
    from mpbp_tpu.models.stokes import make_stokes_operator
    from mpbp_tpu.solvers import gmres as krylov
    from mpbp_tpu.solvers.preconditioners import ILUInner

    n = 32 if small else 128
    PI = np.pi

    def eta_fn(y, x):
        return 1.0 + 0.5 * jnp.sin(2 * PI * x) * jnp.sin(2 * PI * y)

    op = make_stokes_operator(n, c=1.0, d=-1.0, eta_fn=eta_fn)
    n2 = n * n
    rng = np.random.default_rng(0)
    b_vec = jnp.asarray(rng.normal(size=3 * n2))
    b_vec = b_vec.at[2 * n2:].add(-jnp.mean(b_vec[2 * n2:]))
    tmpl = {f: jnp.zeros((n, n)) for f in ("u", "v", "p")}
    mv = krylov.flatten_op(op.A.apply, tmpl, ("u", "v", "p"))
    f_inner = ILUInner.ilut_of(op.F, fill=100, tau=1e-3)
    eta_j = jnp.asarray(np.asarray(op.grid.eval_at_cells(eta_fn)).ravel())

    def pc(v):
        zu = f_inner(v[:2 * n2])
        du = op.D.apply({"u": zu[:n2].reshape(n, n),
                         "v": zu[n2:].reshape(n, n)})["p"].ravel()
        return jnp.concatenate([zu, -eta_j * (v[2 * n2:] + du)])

    t0 = time.time()
    res = krylov.fgmres(mv, b_vec, tol=1e-8, maxiter=200, M=pc)
    _emit({"config": 1, "desc": "stokes var-eta block_tri mass-schur", "n": n,
           "iters": int(res.iters), "relres": float(res.relres),
           "converged": bool(res.converged),
           "solve_s": round(time.time() - t0, 3)})


def config2(small):
    from mpbp_tpu.drivers import solve_multiphase

    n = 64 if small else 256
    t0 = time.time()
    rep = solve_multiphase(n=n, c=1, d=-1, xi=1.0, eta_n=100.0, eta_s=1.0,
                           pc="lsc_mg_full", tol=1e-8, maxiter=60)
    t_first = time.time() - t0
    # warm rerun: assembly/setup/jit caches all hit, splitting one-time
    # compile+setup cost from the steady-state solve (VERDICT r4 item #8:
    # the unexplained 433 s config-2 row was ~all first-call cost)
    t0 = time.time()
    rep = solve_multiphase(n=n, c=1, d=-1, xi=1.0, eta_n=100.0, eta_s=1.0,
                           pc="lsc_mg_full", tol=1e-8, maxiter=60)
    t_warm = time.time() - t0
    _emit({"config": 2, "desc": "multiphase LSC (SpGEMM products)", "n": n,
           "pc": "lsc_mg_full", "iters": int(rep.iters),
           "relres": float(rep.relres), "converged": bool(rep.converged),
           "error_l2": rep.error_norms["l2"],
           "first_s": round(t_first, 1),
           "compile_setup_s": round(t_first - t_warm, 1),
           "solve_s": round(t_warm, 3)})


def config3(small):
    """BASELINE configs[3] as specified (VERDICT r4 missing #4): CONVERGED
    sharded 512^2 solves — block-Jacobi ILU(0) tri-solve inner solves
    head-to-head against the MG default, same tolerance."""
    from benchmarks.big_sharded import solve_once

    n = 128 if small else 512
    for pc in ("mg", "block_ilu0"):
        r = solve_once(n, _n_devices(), pc, 1e-8, 200, 1e-4, 40)
        r["config"] = 3
        r["desc"] = f"multiphase sharded LSC({pc}) converged"
        _emit(r)


def config4(small):
    """BASELINE configs[4]: converged large-grid row-partitioned solve
    (1024^2; the 2048^2 mixed-precision run is SHARDED_r05.json)."""
    from benchmarks.big_sharded import solve_once

    n = 256 if small else 1024
    r = solve_once(n, _n_devices(), "mg", 1e-8, 60, 1e-4, 40,
                   precision="hybrid")
    r["config"] = 4
    r["desc"] = "multiphase row-partitioned hybrid (f64 outer, f32 inner)"
    _emit(r)


def _n_devices():
    import jax
    return len(jax.devices())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="shrink grids for CPU functional runs")
    ap.add_argument("--configs", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)
    log(f"configs: devices={jax.devices()}")
    fns = [config0, config1, config2, config3, config4]
    for i in args.configs:
        t0 = time.time()
        fns[i](args.small)
        log(f"config {i}: {time.time() - t0:.1f}s total")


if __name__ == "__main__":
    main()
