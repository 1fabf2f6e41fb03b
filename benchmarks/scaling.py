"""Weak/strong-scaling harness for the sharded solver paths.

Measures matvec throughput (nnz/s) and FGMRES time-to-solve across mesh
sizes, covering BASELINE.json configs[3] (single host multi-chip, 512^2) and
configs[4] (1024^2-2048^2 across hosts). On this container the mesh is the
8-virtual-device CPU mesh (SURVEY.md section 4 strategy) or the single TPU
chip; the same code runs on a real pod slice unchanged.

Usage:
  python benchmarks/scaling.py --devices 1 2 4 8 --n 512 --mode weak
Outputs one JSON line per configuration.
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


def run_config(n: int, n_devices: int, dtype_str: str, maxiter: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from mpbp_tpu.models import mms
    from mpbp_tpu.models.fused import make_fused_apply
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.parallel import sharding as sh

    dtype = jnp.float64 if dtype_str == "float64" else jnp.float32
    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), axis_names=("x",))

    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                  eta_s=1.0, dtype=dtype)
    nnz = sum(len(om) for om in op.A.terms.values()) * n * n
    prob = mms.variable_thn_problem(1.0, -1.0, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op.grid, prob)

    sop = sh.shard_multiphase(op, mesh)
    vsh = sh.vector_sharding(mesh)
    bv = jax.device_put(sh.stack_state(
        {k: v.astype(dtype) for k, v in b.items()}), vsh)

    mv = jax.jit(make_fused_apply(sop))

    # matvec throughput: marginal time between two chained iteration counts,
    # synchronized by a scalar fetch (block_until_ready is not trusted under
    # the remote-device relay — see bench.py).
    @jax.jit
    def chain(v, k):
        def body(_, x):
            return mv(x) * (1.0 / jnp.asarray(n, dtype))
        return jax.lax.fori_loop(0, k, body, v)

    def run_chain(k):
        t0 = time.perf_counter()
        float(jnp.sum(chain(bv, k)))
        return time.perf_counter() - t0

    run_chain(5)
    run_chain(5)     # warm/compile
    t_lo = min(run_chain(30) for _ in range(3))
    t_hi = min(run_chain(120) for _ in range(3))
    dt = (t_hi - t_lo) / 90.0

    # FGMRES (no PC, fixed iteration count) time per iteration; fgmres
    # returns host scalars so this is naturally synchronized
    from mpbp_tpu.solvers import gmres as krylov

    res = krylov.fgmres(mv, bv, tol=0.0, maxiter=maxiter)
    float(jnp.sum(res.x))
    t0 = time.perf_counter()
    res = krylov.fgmres(mv, bv, tol=0.0, maxiter=maxiter)
    float(jnp.sum(res.x))
    t_solve = time.perf_counter() - t0

    return {
        "n": n,
        "devices": n_devices,
        "matvec_us": round(dt * 1e6, 1),
        "matvec_gnnz_s": round(nnz / dt / 1e9, 2),
        "fgmres_iters": int(res.iters),
        "fgmres_s": round(t_solve, 3),
        "fgmres_s_per_iter": round(t_solve / max(int(res.iters), 1), 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--mode", choices=["weak", "strong"], default="strong")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--maxiter", type=int, default=20)
    args = ap.parse_args(argv)

    results = []
    base = None
    for nd in args.devices:
        n = args.n if args.mode == "strong" else int(args.n * (nd ** 0.5))
        # weak mode: grow the grid so per-device work is ~constant
        n = (n // (2 * nd)) * (2 * nd) if n % nd else n
        r = run_config(n, nd, args.dtype, args.maxiter)
        if base is None:
            base = r
        if args.mode == "strong":
            r["speedup"] = round(base["matvec_us"] / r["matvec_us"], 2)
            r["efficiency"] = round(r["speedup"] / nd, 2)
        else:
            work = (r["n"] ** 2) / (base["n"] ** 2)
            r["efficiency"] = round(
                (base["matvec_us"] * work / nd) / r["matvec_us"], 2)
        print(json.dumps(r), flush=True)
        results.append(r)
    return results


if __name__ == "__main__":
    main()
