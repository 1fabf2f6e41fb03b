"""Multi-process (multi-"host") sharded-solve harness.

Launches N separate Python processes, each owning a disjoint set of CPU
devices, initializes the JAX distributed runtime across them
(mpbp_tpu/parallel/distributed.py), and runs the SAME sharded FGMRES
multiphase solve as benchmarks/big_sharded.py on the GLOBAL mesh — the
full BASELINE configs[4] program shape (row partition across hosts, halo
permutes at host seams, cross-host psum Arnoldi with the cgs1 single-
reduction orthogonalization) minus only the physical DCN fabric.

On a real TPU pod, run the worker directly on every host (no launcher):
  python benchmarks/multihost_launch.py --worker --n 2048 [...]
with MPBP_COORDINATOR/MPBP_NUM_PROCS/MPBP_PROC_ID exported per host (or
omitted — TPU runtimes auto-detect), under JAX_PLATFORMS=tpu.

Local CPU emulation (this container):
  python benchmarks/multihost_launch.py --procs 2 --devices-per-proc 4 --n 64
Process 0 prints one JSON line with iters/relres; the launcher also runs a
single-process reference solve and asserts iteration-count equality — the
multi-host half of the invariance artifact.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import os
import subprocess
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker(args) -> dict | None:
    """Runs inside EVERY process: init distributed, solve on the global
    mesh, return the result dict on process 0 (None elsewhere)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    from mpbp_tpu.parallel.distributed import (fetch_replicated,
                                               global_mesh_1d,
                                               init_distributed)

    info = init_distributed()
    log(f"proc {info['process_id']}/{info['num_processes']}: "
        f"{info['local_devices']} local / {info['global_devices']} global "
        "devices")

    import jax.numpy as jnp

    from mpbp_tpu.models import mms
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.parallel import sharding as sh

    op = make_multiphase_operator(args.n, c=1.0, d=-1.0, xi=1.0,
                                  eta_n=100.0, eta_s=1.0, dtype=jnp.float64)
    prob = mms.variable_thn_problem(1.0, -1.0, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op.grid, prob)

    mesh = global_mesh_1d()
    sop = sh.shard_multiphase(op, mesh)
    M = sh.make_sharded_lsc_pc(sop, inner_tol=args.inner_tol,
                               inner_iters=args.inner_iters,
                               p_solver=args.pc, setup_op=op)
    # cgs1: ONE cross-host reduction per Arnoldi iteration (the DCN default
    # — parallel/distributed.py module docstring)
    res = sh.sharded_solve(sop, b, mesh, tol=args.tol, maxiter=args.maxiter,
                           pc=M, orthog="cgs1")
    out = {
        "metric": "multihost_sharded_solve",
        "n": args.n,
        "processes": info["num_processes"],
        "global_devices": info["global_devices"],
        "iters": int(fetch_replicated(res.iters)),
        "relres": float(fetch_replicated(res.relres)),
        "converged": bool(fetch_replicated(res.converged)),
    }
    if jax.process_index() == 0:
        return out
    return None


def launch(args) -> int:
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS",
                             "PALLAS_AXON_REMOTE_COMPILE")}
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
        # oversubscribed-core rendezvous tolerance (see big_sharded.py)
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
    env_base["MPBP_COORDINATOR"] = f"localhost:{args.port}"
    env_base["MPBP_NUM_PROCS"] = str(args.procs)

    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--n", str(args.n), "--tol", str(args.tol),
           "--maxiter", str(args.maxiter), "--pc", args.pc,
           "--inner-tol", str(args.inner_tol),
           "--inner-iters", str(args.inner_iters)]
    procs = []
    for pid in range(args.procs):
        env = dict(env_base, MPBP_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            cmd, env=env,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=sys.stderr))
    out0, _ = procs[0].communicate(timeout=args.timeout)
    for p in procs[1:]:
        p.wait(timeout=60)
    rcs = [p.returncode for p in procs]
    if any(rcs):
        log(f"worker exit codes: {rcs}")
        return 1
    multi = json.loads(out0.decode().strip().splitlines()[-1])
    print(json.dumps(multi), flush=True)

    # single-process reference with the same global device count: iteration
    # counts must match (process boundaries are invisible to the math)
    env = dict(env_base)
    env.pop("MPBP_COORDINATOR"), env.pop("MPBP_NUM_PROCS")
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{args.devices_per_proc * args.procs}")
    ref_out = subprocess.run(
        cmd, env=env, check=True, timeout=args.timeout,
        stdout=subprocess.PIPE).stdout
    ref = json.loads(ref_out.decode().strip().splitlines()[-1])
    ok = multi["iters"] == ref["iters"] and multi["converged"]
    print(json.dumps({"metric": "multihost_iteration_match",
                      "procs": args.procs,
                      "iters_multiproc": multi["iters"],
                      "iters_singleproc": ref["iters"],
                      "match": ok}), flush=True)
    return 0 if ok else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--port", type=int, default=9811)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--maxiter", type=int, default=40)
    ap.add_argument("--pc", default="mg", choices=["mg", "cg"])
    ap.add_argument("--inner-tol", type=float, default=1e-4)
    ap.add_argument("--inner-iters", type=int, default=40)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args(argv)

    if args.worker:
        out = worker(args)
        if out is not None:
            print(json.dumps(out), flush=True)
        return 0
    return launch(args)


if __name__ == "__main__":
    raise SystemExit(main())
