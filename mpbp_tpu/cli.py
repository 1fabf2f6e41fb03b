"""Command-line drivers — the L5 layer (reference README.md:17-18:
`python solve.py` / `python apply.py`), as `python -m mpbp_tpu <cmd>`.

Commands:
  solve   — assemble + FGMRES-solve the MMS multiphase system, print a
            structured report (reference solve.py:288-327 capability)
  apply   — apply A to the exact MMS solution, print error norms
            (reference apply.py:8-82 capability, bugs fixed)
  eigs    — spectra of A and of the preconditioned operator
            (reference solve.py:103-147, 306-327 capability)
  export  — CSV dump of the block matrices (reference utils.py:28-40)
"""

from __future__ import annotations

import argparse
import json
import sys

from mpbp_tpu.utils import config as cfg


def _add_common(p: argparse.ArgumentParser):
    cfg.add_dataclass_args(p, cfg.ProblemConfig)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mpbp_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_solve = sub.add_parser("solve", help="MMS solve with a block PC")
    _add_common(p_solve)
    cfg.add_dataclass_args(p_solve, cfg.SolverConfig)
    p_solve.add_argument("--metrics-json", default="",
                         help="write SolveMetrics JSON to this path")
    p_solve.add_argument("--checkpoint", default="",
                         help="write solution checkpoint (npz) to this path")
    p_solve.add_argument("--true-res-monitor", action="store_true",
                         help="recompute + print the TRUE residual "
                              "||b - A x_k|| every iteration (the reference "
                              "fgmres callback, reference solve.py:161-170); "
                              "costs one extra matvec per iteration")
    p_solve.add_argument("--sharded", action="store_true",
                         help="row-shard the solve over all visible devices "
                              "(drivers.solve_multiphase_sharded; "
                              "BASELINE configs[3]-[4])")
    p_solve.add_argument("--sharded-pc", default="mg",
                         choices=["mg", "cg", "block_ilu0"],
                         help="sharded LSC inner-solve family (block_ilu0 = "
                              "block-Jacobi ILU(0) tri-solves)")
    p_solve.add_argument("--restart", type=int, default=None,
                         help="restarted outer cycles (bounds the Krylov "
                              "basis memory; sharded + hybrid modes)")

    p_apply = sub.add_parser("apply", help="operator-apply MMS check")
    _add_common(p_apply)

    p_eigs = sub.add_parser("eigs", help="spectral analysis of A and A*M^-1")
    _add_common(p_eigs)
    cfg.add_dataclass_args(p_eigs, cfg.SolverConfig)
    p_eigs.add_argument("--k", type=int, default=10)
    p_eigs.add_argument("--report", default="",
                        help="write a plot-ready spectrum report (JSON: "
                             "spec(A) + spec(A*M^-1) per PC + clustering "
                             "radii) to this path")
    p_eigs.add_argument("--pcs", default="",
                        help="comma-separated PC kinds for --report "
                             "(default: the --pc value, or exact_schur,"
                             "lsc_ilut)")
    p_eigs.add_argument("--exact", action="store_true",
                        help="dense full spectrum (small n only) instead of "
                             "matrix-free Arnoldi")
    p_eigs.add_argument("--plot", default="",
                        help="also render the --report spectra to this image "
                             "path (the reference's eigenvalue scatter, "
                             "reference solve.py:311-327)")

    p_exp = sub.add_parser("export", help="CSV dump of block matrices")
    _add_common(p_exp)
    p_exp.add_argument("--outdir", default=".")
    p_exp.add_argument("--phase", default="n", choices=["n", "s"])

    args = parser.parse_args(argv)

    import jax

    prob = cfg.dataclass_from_args(cfg.ProblemConfig, args)

    if args.cmd == "solve":
        sol = cfg.dataclass_from_args(cfg.SolverConfig, args)
        if sol.dtype == "float64":
            jax.config.update("jax_enable_x64", True)
        from mpbp_tpu.drivers import solve_multiphase
        from mpbp_tpu.models.multiphase import make_multiphase_operator
        from mpbp_tpu.utils.metrics import Timer, collect_solve_metrics
        import jax.numpy as jnp

        dtype = jnp.float64 if sol.dtype == "float64" else jnp.float32
        if sol.precision != "full":
            jax.config.update("jax_enable_x64", True)
        if args.sharded:
            jax.config.update("jax_enable_x64", True)
            from mpbp_tpu.drivers import solve_multiphase_sharded

            if sol.precision == "ir":
                parser.error("--sharded supports precision full (f64) or "
                             "hybrid; 'ir' has no sharded configuration "
                             "(use --precision hybrid — same f32-dominant "
                             "inner work, f64-certified outer)")
            with Timer() as t_all:
                rep = solve_multiphase_sharded(
                    n=prob.n, c=prob.c, d=prob.d, xi=prob.xi,
                    eta_n=prob.eta_n, eta_s=prob.eta_s, problem=prob.problem,
                    pc=args.sharded_pc, tol=sol.tol, maxiter=sol.maxiter,
                    precision=("hybrid" if sol.precision == "hybrid"
                               else "f64"),
                    restart=args.restart, inner_tol=sol.inner_tol,
                    inner_iters=sol.inner_iters)
            print(f"solve (sharded over {rep.params['devices']} devices): "
                  f"n={rep.n} pc={rep.pc} iters={rep.iters} "
                  f"relres={rep.relres:.3e} converged={rep.converged}")
            print(f"error norms vs MMS exact: "
                  f"L1={rep.error_norms['l1']:.6e} "
                  f"L2={rep.error_norms['l2']:.6e} "
                  f"max={rep.error_norms['max']:.6e}")
            return 0 if rep.converged else 2
        with Timer() as t_all:
            rep = solve_multiphase(
                n=prob.n, c=prob.c, d=prob.d, xi=prob.xi, eta_n=prob.eta_n,
                eta_s=prob.eta_s, problem=prob.problem, pc=sol.pc,
                tol=sol.tol, maxiter=sol.maxiter, dtype=dtype,
                ilut_fill=sol.ilut_fill, ilut_tau=sol.ilut_tau,
                ilut_refine=sol.ilut_refine, inner_tol=sol.inner_tol,
                inner_iters=sol.inner_iters, precision=sol.precision,
                fused_pallas=sol.fused_pallas, restart=args.restart,
                true_res_monitor=args.true_res_monitor)
        nnz = 11 * 5 * prob.n * prob.n  # stencil-tap estimate
        m = collect_solve_metrics(rep, nnz, 0.0, t_all.elapsed)
        print(f"solve: n={rep.n} pc={rep.pc} iters={rep.iters} "
              f"relres={rep.relres:.3e} converged={rep.converged}")
        print(f"error norms vs MMS exact: "
              f"L1={rep.error_norms['l1']:.6e} "
              f"L2={rep.error_norms['l2']:.6e} "
              f"max={rep.error_norms['max']:.6e}")
        print("residual history:",
              " ".join(f"{r:.3e}" for r in rep.res_history[:10]),
              "..." if len(rep.res_history) > 10 else "")
        if args.metrics_json:
            with open(args.metrics_json, "w") as f:
                f.write(m.to_json())
        if args.checkpoint:
            from mpbp_tpu.utils.checkpoint import save_krylov_state
            save_krylov_state(args.checkpoint, rep.x, rep.res_history,
                              rep.iters, meta=rep.params)
        return 0 if rep.converged else 2

    if args.cmd == "apply":
        jax.config.update("jax_enable_x64", True)
        from mpbp_tpu.drivers import apply_report
        rep = apply_report(n=prob.n, c=prob.c, d=prob.d, xi=prob.xi,
                           eta_n=prob.eta_n, eta_s=prob.eta_s,
                           problem=prob.problem)
        print(f"apply: n={prob.n} "
              f"L1={rep['l1']:.6e} L2={rep['l2']:.6e} max={rep['max']:.6e}")
        return 0

    if args.cmd == "eigs":
        sol = cfg.dataclass_from_args(cfg.SolverConfig, args)
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from mpbp_tpu.drivers import a_matvec, make_preconditioner
        from mpbp_tpu.models.multiphase import make_multiphase_operator
        from mpbp_tpu.solvers.eigen import eigs as eig_solve
        from mpbp_tpu.solvers.eigen import preconditioned_spectrum

        if args.report:
            from mpbp_tpu.drivers import spectrum_report
            pcs = ([p for p in args.pcs.split(",") if p] if args.pcs
                   else ([sol.pc] if sol.pc != "none"
                         else ["exact_schur", "lsc_ilut"]))
            rep = spectrum_report(
                n=prob.n, c=prob.c, d=prob.d, xi=prob.xi, eta_n=prob.eta_n,
                eta_s=prob.eta_s, pcs=pcs, k=args.k,
                exact=args.exact or None,
                ilut_fill=sol.ilut_fill, ilut_tau=sol.ilut_tau)
            with open(args.report, "w") as f:
                json.dump(rep, f, indent=1)
            for kind, spec in rep["preconditioned"].items():
                print(f"pc={kind}: clustering radius around 1 = "
                      f"{spec['clustering_radius_1']:.3g} "
                      f"(n_converged={spec['n_converged']})")
            print("wrote", args.report)
            if args.plot:
                from mpbp_tpu.utils.plots import render_spectrum_report
                print("wrote", render_spectrum_report(rep, args.plot))
            return 0

        op = make_multiphase_operator(prob.n, c=prob.c, d=prob.d, xi=prob.xi,
                                      eta_n=prob.eta_n, eta_s=prob.eta_s)
        mv = a_matvec(op)
        ex = jnp.ones(5 * prob.n * prob.n)
        res = eig_solve(mv, ex, k=args.k, tol=1e-4, maxiter=40)
        print("eigenvalues of A (largest |.|):")
        for ev in res.eigenvalues[: res.n_converged]:
            print(f"  {ev:.6g}")
        if sol.pc != "none":
            pc = make_preconditioner(op, sol.pc, ilut_fill=sol.ilut_fill,
                                     ilut_tau=sol.ilut_tau)
            pres = preconditioned_spectrum(mv, pc, ex, k=args.k, tol=1e-4,
                                           maxiter=40)
            print(f"eigenvalues of A*M^-1 (pc={sol.pc}):")
            for ev in pres.eigenvalues[: pres.n_converged]:
                print(f"  {ev:.6g}")
            print(f"clustering radius around 1: {pres.clustering(1.0):.3g}")
        return 0

    if args.cmd == "export":
        jax.config.update("jax_enable_x64", True)
        from mpbp_tpu.models.multiphase import make_multiphase_operator
        from mpbp_tpu.utils.csv_export import write_blocks_to_csv
        op = make_multiphase_operator(prob.n, c=prob.c, d=prob.d, xi=prob.xi,
                                      eta_n=prob.eta_n, eta_s=prob.eta_s)
        paths = write_blocks_to_csv(op, args.outdir, args.phase)
        for p in paths:
            print("wrote", p)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
