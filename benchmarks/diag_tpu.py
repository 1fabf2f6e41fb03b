"""TPU numerical-trust diagnostic: compare on-device operator applies and
preconditioner quality against host numpy ground truth at a given n.

Checks, in order:
  1. f32 stencil A-apply on device vs host scipy CSR (f64) — relative error
     should be ~1e-6 (f32 rounding), NOT ~1e-3 (bf16 contamination).
  2. emulated-f64 A-apply on device vs host f64 — should be ~1e-15.
  3. one M32 (lsc_mg_full) apply: finite? magnitude?
  4. 10 equilibrated f32 FGMRES iterations with M32: reported relres vs
     TRUE host-f64 residual of the returned iterate — catches a divergence
     between the Krylov recurrence and reality.
"""


import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--pc", default="lsc_mg_full")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from mpbp_tpu.drivers import a_matvec, make_preconditioner, pack_fields
    from mpbp_tpu.models import mms
    from mpbp_tpu.models.multiphase import make_multiphase_operator
    from mpbp_tpu.solvers import gmres as krylov
    from mpbp_tpu.solvers.mixed import block_scales

    n = args.n
    log(f"diag: device={jax.devices()[0]}, n={n}")
    op32 = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                    eta_s=1.0, dtype=jnp.float32)
    op64 = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                    eta_s=1.0, dtype=jnp.float64)
    prob = mms.variable_thn_problem(1.0, -1.0, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op64.grid, prob)
    b64 = pack_fields(op64, b)
    rng = np.random.default_rng(0)
    x_h = rng.standard_normal(5 * n * n)

    # host ground truth via CSR in f64
    t0 = time.time()
    csr = op64.A.to_csr()
    ip, ix, vals = csr.host_arrays()
    import scipy.sparse as sp
    S = sp.csr_matrix((np.asarray(vals), np.asarray(ix), ip),
                      shape=csr.shape)
    y_true = S @ x_h
    log(f"host CSR ground truth: {time.time()-t0:.1f}s")

    mv32 = a_matvec(op32)
    mv64 = a_matvec(op64)
    x32 = jnp.asarray(x_h, jnp.float32)
    x64 = jnp.asarray(x_h, jnp.float64)

    y32 = np.asarray(jax.jit(mv32)(x32), np.float64)
    y64 = np.asarray(jax.jit(mv64)(x64), np.float64)
    den = np.linalg.norm(y_true)
    e32 = float(np.linalg.norm(y32 - y_true) / den)
    e64 = float(np.linalg.norm(y64 - y_true) / den)
    log(f"device f32 apply rel err: {e32:.3e} (expect ~1e-6)")
    log(f"device f64 apply rel err: {e64:.3e} (expect ~1e-15)")

    t0 = time.time()
    M32 = make_preconditioner(op32, args.pc, dtype=jnp.float32,
                              inner_tol=1e-4, inner_iters=40)
    log(f"pc setup: {time.time()-t0:.1f}s")
    z = M32(b64.astype(jnp.float32))
    zn = float(jnp.linalg.norm(z))
    log(f"M32(b) norm: {zn:.3e} finite={bool(jnp.isfinite(zn))}")

    # PC quality: how close is z to A^{-1} b? Measure the residual of the
    # PC output as an approximate solve: ||b - A z|| / ||b||. A useful PC
    # gives per-outer-iteration contraction ~ this number.
    z64 = np.asarray(z, np.float64)
    pc_res = float(np.linalg.norm(np.asarray(b64) - S @ z64)
                   / np.linalg.norm(np.asarray(b64)))
    log(f"PC-as-solver relres ||b - A M32(b)||/||b||: {pc_res:.3e}")

    scale = block_scales(op64)
    d32 = scale.astype(jnp.float32)
    mv32s = lambda v: d32 * mv32(d32 * v)                    # noqa: E731
    Ms = lambda v: M32(v / d32) / d32                        # noqa: E731
    r32 = (scale * b64).astype(jnp.float32)
    t0 = time.time()
    res = krylov.fgmres(mv32s, r32, tol=1e-6, maxiter=args.iters, M=Ms)
    log(f"f32 fgmres({args.iters}): {time.time()-t0:.1f}s, reported "
        f"relres {float(res.relres):.3e}")

    # true residual of the de-equilibrated iterate, in host f64
    xs = np.asarray(res.x, np.float64) * np.asarray(scale, np.float64)
    b_h = np.asarray(b64, np.float64)
    true_rel = float(np.linalg.norm(b_h - S @ xs) / np.linalg.norm(b_h))
    log(f"TRUE f64 relres of iterate: {true_rel:.3e}")

    print(json.dumps({
        "metric": "tpu_numerical_diag", "n": n,
        "f32_apply_rel_err": e32, "f64_apply_rel_err": e64,
        "pc_apply_norm": zn,
        "fgmres_reported_relres": float(res.relres),
        "fgmres_true_relres": true_rel,
    }))


if __name__ == "__main__":
    main()
