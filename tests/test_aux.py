"""Auxiliary subsystem tests: config/CLI, metrics, checkpoint, CSV export
(SURVEY.md section 5)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mpbp_tpu.models.multiphase import make_multiphase_operator
from mpbp_tpu.utils import config as cfg
from mpbp_tpu.utils import checkpoint as ckpt
from mpbp_tpu.utils.csv_export import write_blocks_to_csv


def test_config_roundtrip():
    p = cfg.ProblemConfig(n=32, eta_n=7.0)
    s = cfg.SolverConfig(pc="block_tri", tol=1e-6)
    j = cfg.to_json(p, s)
    p2, s2 = cfg.from_json(j)
    assert p2 == p and s2 == s


def test_cli_arg_binding():
    import argparse

    parser = argparse.ArgumentParser()
    cfg.add_dataclass_args(parser, cfg.ProblemConfig)
    args = parser.parse_args(["--n", "64", "--eta-n", "5.5"])
    p = cfg.dataclass_from_args(cfg.ProblemConfig, args)
    assert p.n == 64 and p.eta_n == 5.5 and p.eta_s == 1.0


def test_cli_solve_smoke(tmp_path, capsys):
    from mpbp_tpu import cli

    mpath = tmp_path / "m.json"
    rc = cli.main(["solve", "--n", "8", "--eta-n", "1", "--maxiter", "120",
                   "--metrics-json", str(mpath)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "converged=True" in out
    m = json.loads(mpath.read_text())
    assert m["converged"] and m["iters"] > 0


def test_cli_apply_smoke(capsys):
    from mpbp_tpu import cli

    rc = cli.main(["apply", "--n", "16", "--eta-n", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "L2=1.27" in out  # baseline 1.278 at n=16


def test_checkpoint_krylov_state(tmp_path):
    x = jnp.arange(10.0)
    hist = np.array([1.0, 0.1, 0.01])
    path = str(tmp_path / "state.npz")
    ckpt.save_krylov_state(path, x, hist, 3, meta={"n": 4})
    x2, h2, it, meta = ckpt.load_krylov_state(path)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    np.testing.assert_array_equal(h2, hist)
    assert it == 3 and meta["n"] == 4


def test_checkpoint_operator_roundtrip(tmp_path):
    op = make_multiphase_operator(8, eta_n=3.0)
    path = str(tmp_path / "op.npz")
    ckpt.save_operator(path, op)
    op2 = ckpt.load_operator(path)
    np.testing.assert_allclose(op2.A.to_dense(), op.A.to_dense(),
                               rtol=1e-12, atol=1e-12)


def test_theta_planes_injection():
    """Explicit plane-keyed theta injection (utils/checkpoint._replace_theta
    path) reproduces the closed-form assembly exactly — including for a
    non-default theta field, where the old coordinate-sniffing dispatch was
    unspecified."""
    import jax.numpy as jnp

    def thn(y, x):
        return 0.3 + 0.1 * jnp.cos(2 * np.pi * x) * jnp.sin(4 * np.pi * y)

    op = make_multiphase_operator(8, eta_n=7.0, thn_fn=thn)
    op2 = make_multiphase_operator(
        8, eta_n=7.0,
        theta_planes={"cell": op.phase_n.cell,
                      "xface_pt": op.phase_n.xface_pt,
                      "yface_pt": op.phase_n.yface_pt})
    np.testing.assert_allclose(op2.A.to_dense(), op.A.to_dense(),
                               rtol=1e-14, atol=1e-14)


def test_csv_export_matches_dense(tmp_path):
    op = make_multiphase_operator(4)
    paths = write_blocks_to_csv(op, str(tmp_path))
    assert len(paths) == 4
    L = np.loadtxt(os.path.join(str(tmp_path), "L_matrix.csv"), delimiter=",")
    assert L.shape == (32, 32)
    # spot value: diagonal of L should be negative (Laplacian)
    assert np.all(np.diag(L) < 0)


def test_solve_resume_from_checkpoint(tmp_path):
    """Failure-recovery workflow (SURVEY.md 5.3/5.4): solve with a small
    iteration budget, checkpoint, resume with x0 and converge."""
    from mpbp_tpu.drivers import a_matvec, solve_multiphase
    from mpbp_tpu.models import mms
    from mpbp_tpu.drivers import pack_fields, make_preconditioner
    from mpbp_tpu.solvers import gmres as krylov

    op = make_multiphase_operator(16, eta_n=100.0)
    prob = mms.variable_thn_problem(1, -1, 1.0, 100.0, 1.0)
    _, b = mms.fill_sol_and_rhs(op.grid, prob)
    b_vec = pack_fields(op, b)
    mv = a_matvec(op)
    M = make_preconditioner(op, "lsc_ilut")

    r1 = krylov.fgmres(mv, b_vec, tol=1e-8, maxiter=20, M=M)
    assert not bool(r1.converged)
    path = str(tmp_path / "mid.npz")
    ckpt.save_krylov_state(path, r1.x, np.asarray(r1.res_history), 20)
    x0, _, _, _ = ckpt.load_krylov_state(path)
    r2 = krylov.fgmres(mv, b_vec, x0=x0, tol=1e-8, maxiter=130, M=M)
    assert bool(r2.converged)
    # restart costs little: total iterations comparable to the one-shot 45
    assert 20 + int(r2.iters) <= 60, int(r2.iters)


def test_true_residual_monitor():
    """Per-iteration true-residual monitor (the reference's fgmres callback,
    reference solve.py:161-170): history present, one entry per iteration,
    and the final true residual matches the converged tolerance."""
    from mpbp_tpu.drivers import solve_multiphase

    rep = solve_multiphase(n=8, eta_n=1.0, eta_s=1.0, pc="lsc_ilut",
                           tol=1e-8, maxiter=60, true_res_monitor=True)
    hist = rep.params["true_res_history"]
    assert rep.converged
    assert len(hist) == rep.iters
    assert hist[-1] < 1e-7
    # the monitor measures TRUE residuals: they track the recurrence history
    rec = rep.res_history[1:len(hist) + 1] / rep.res_history[0]
    np.testing.assert_allclose(hist, rec, rtol=1e-6, atol=1e-10)


def test_spectrum_plot_renders(tmp_path):
    """Spectrum scatter artifact (reference solve.py:311-327 capability)."""
    import os

    from mpbp_tpu.drivers import spectrum_report
    from mpbp_tpu.utils.plots import render_spectrum_report

    rep = spectrum_report(n=8, eta_n=1.0, eta_s=1.0, pcs=("exact_schur",),
                          exact=True)
    path = render_spectrum_report(rep, str(tmp_path / "spec.png"))
    assert os.path.exists(path) and os.path.getsize(path) > 10_000
