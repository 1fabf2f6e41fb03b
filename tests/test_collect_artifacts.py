"""benchmarks/collect_artifacts.py round-trip: suite stdout -> root artifacts."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_collect_round_trip(tmp_path, monkeypatch):
    suite = tmp_path / "suite"
    suite.mkdir()
    (suite / "kernels.out").write_text(
        'noise\n{"kernel": "dia_resident_spmv", "gnnz_s": 123.4}\n')
    (suite / "solve_ir.out").write_text(
        json.dumps({"metric": "time_to_solve_multiphase", "n": 512,
                    "mode": "ir", "outer_iters": 3}) + "\n")
    (suite / "bench.out").write_text(
        json.dumps({"metric": "spmv_nnz_per_s_512sq_multiphase",
                    "value": 663.0, "unit": "Gnnz/s"}) + "\n")

    # run in a scratch "repo" so the real artifacts are untouched
    scratch = tmp_path / "repo"
    (scratch / "benchmarks").mkdir(parents=True)
    src = open(os.path.join(REPO, "benchmarks", "collect_artifacts.py")).read()
    (scratch / "benchmarks" / "collect_artifacts.py").write_text(src)
    r = subprocess.run(
        [sys.executable, str(scratch / "benchmarks" / "collect_artifacts.py"),
         "--suite-dir", str(suite)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    kernels = json.load(open(scratch / "KERNELS_r04.json"))
    assert kernels == [{"kernel": "dia_resident_spmv", "gnnz_s": 123.4}]
    solves = [json.loads(l) for l in open(scratch / "SOLVE_r04.json")]
    assert solves[0]["mode"] == "ir" and solves[0]["outer_iters"] == 3
    bench = json.load(open(scratch / "BENCH_sample.json"))
    assert bench["value"] == 663.0


def test_collect_unwraps_suite_dict(tmp_path):
    """kernels_tpu.py --out writes {"device":..., "results":[...]} — the
    collector must unwrap it, not dump the dict verbatim (advisor r3)."""
    suite = tmp_path / "suite"
    suite.mkdir()
    recs = [{"kernel": "dia_resident_spmv", "gnnz_per_s": 700.0},
            {"kernel": "banded_ell_spmv", "failed": "W over VMEM gate"}]
    (suite / "KERNELS.json").write_text(
        json.dumps({"device": "TPU v5 lite0", "results": recs}))
    scratch = tmp_path / "repo"
    (scratch / "benchmarks").mkdir(parents=True)
    src = open(os.path.join(REPO, "benchmarks", "collect_artifacts.py")).read()
    (scratch / "benchmarks" / "collect_artifacts.py").write_text(src)
    r = subprocess.run(
        [sys.executable, str(scratch / "benchmarks" / "collect_artifacts.py"),
         "--suite-dir", str(suite), "--round", "7"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "2 kernel records" in r.stdout
    assert json.load(open(scratch / "KERNELS_r07.json")) == recs
