"""Production-scale spectral analysis of the TPU-default preconditioner.

The reference's core scientific loop — eigenvalues of the preconditioned
operator A*M^-1 (reference solve.py:103-147, 306-327) — could only run at
toy sizes because it materializes dense matrices into PETSc element by
element. The framework's eigensolver is matrix-free (solvers/eigen.py), so
the same study runs at production grids: this harness records the spectrum
clustering of A*M^-1 for the `lsc_mg_full` PC at n=64/128/256 (VERDICT r4
weak #8 / item #6) and renders the reference-style scatter plots.

A tight cluster around 1 is the quantitative statement of WHY the production
solve converges in ~11-18 mesh-independent outer iterations (SOLVE_r05).

Usage: python benchmarks/spectrum_prod.py [--ns 64 128 256] [--k 12]
       [--out artifacts/SPECTRUM_r05.json]
Writes one JSON artifact + one PNG per grid size under artifacts/.
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
    ap.add_argument("--ns", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--maxiter", type=int, default=60)
    ap.add_argument("--pc", default="lsc_mg_full")
    ap.add_argument("--out",
                    default=_os.path.join(_REPO_ROOT, "artifacts",
                                          "SPECTRUM_r05.json"))
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = _os.path.join(_REPO_ROOT, ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from mpbp_tpu.drivers import spectrum_report
    from mpbp_tpu.utils.plots import render_spectrum_report

    dev = jax.devices()[0]
    log(f"spectrum_prod: device={dev}")
    out = {"device": str(dev), "pc": args.pc, "k": args.k,
           "reports": []}
    for n in args.ns:
        t0 = time.time()
        rep = spectrum_report(n=n, eta_n=100.0, eta_s=1.0,
                              pcs=(args.pc,), k=args.k, tol=args.tol,
                              maxiter=args.maxiter, exact=False)
        dt = time.time() - t0
        pcs = rep["preconditioned"][args.pc]
        row = {"n": n, "seconds": round(dt, 1),
               "clustering_radius_1": pcs["clustering_radius_1"],
               "n_converged": pcs["n_converged"],
               "n_nullspace": pcs["n_nullspace"]}
        png = _os.path.join(_REPO_ROOT, "artifacts",
                            f"spectrum_n{n}_{args.pc}.png")
        try:
            render_spectrum_report(rep, png)
            row["plot"] = _os.path.relpath(png, _REPO_ROOT)
        except Exception as e:  # pragma: no cover - matplotlib optional
            row["plot_failed"] = str(e)[:200]
        rep_small = {k: v for k, v in rep.items()}
        row["report"] = rep_small
        out["reports"].append(row)
        print(json.dumps({k: v for k, v in row.items() if k != "report"}),
              flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
