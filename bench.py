"""Benchmark: SpMV (multiphase operator apply) throughput on the 512^2 grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.json north star: sustained nnz/s of the sparse
saddle-point operator apply (the body of every Krylov iteration) on the
512^2 multiphase Stokes system, on one chip. nnz is the count of stored
stencil coefficients (identical to the CSR nonzero count modulo exact-zero
cancellations, BASELINE.md sparsity row). vs_baseline is the speedup over
the same operator applied through a SciPy CSR SpMV on the container CPU —
the reference's execution model (dense numpy in the reference proper;
scipy.sparse is the strongest CPU stand-in).

Timing methodology: device work is measured as the MARGINAL time per apply
between two chained-iteration counts (Delta t / Delta k), with each chain
synchronized by fetching a scalar reduction of the result to the host.
This removes dispatch/relay fixed costs AND avoids trusting
block_until_ready, which under the remote-device relay can return before
device execution completes (measured: chain timings shorter than the
device-time lower bound). The per-apply figure includes one extra
renormalization pass over the 5 state planes that keeps the chained values
finite — i.e. the reported number slightly UNDER-states the raw apply rate.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # First TPU compile goes through the remote-compile relay (~minutes);
    # cache compiled executables across bench runs.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    n = int(os.environ.get("BENCH_N", "512"))
    dtype = jnp.float32

    from mpbp_tpu.models.fused import make_fused_apply, make_fused_apply_pallas
    from mpbp_tpu.models.multiphase import make_multiphase_operator

    dev = jax.devices()[0]
    log(f"bench: device={dev}, n={n}, dtype={dtype.__name__}")

    t0 = time.time()
    op = make_multiphase_operator(n, c=1.0, d=-1.0, xi=1.0, eta_n=100.0,
                                  eta_s=1.0, dtype=dtype)
    # stored stencil coefficients = nnz of the ELL/CSR export
    nnz = sum(len(offmap) for offmap in op.A.terms.values()) * n * n
    log(f"assembly: {time.time()-t0:.2f}s, nnz={nnz/1e6:.2f}M")

    # production matvec: single hand-fused apply recomputing all
    # theta-derived coefficients in registers (numerically identical to the
    # stencil apply — tests/test_fused.py). The winner among the halo
    # strategies is TOOLCHAIN-DEPENDENT: r3 measured in-kernel-halo Pallas
    # at 807 Gnnz/s vs 223 for the XLA roll apply; the r4 toolchain inverts
    # that (649 XLA vs 463 in-kernel). So the hero kernel is picked
    # EMPIRICALLY here: every candidate that compiles gets a short marginal
    # timing race and the fastest runs the full methodology below.
    v = jnp.ones((5, n, n), dtype)
    scale0 = 1.0 / np.float32(8.0 * float(op.params["eta_n"])
                              / op.grid.dx**2)
    candidates = []
    for maker, name in [
            (lambda: make_fused_apply_pallas(op, block_rows=64,
                                             halo="inkernel"),
             "pallas fused (in-kernel halo, TR=64)"),
            (lambda: make_fused_apply_pallas(op, block_rows=128,
                                             halo="inkernel"),
             "pallas fused (in-kernel halo, TR=128)"),
            (lambda: make_fused_apply_pallas(op, block_rows=256,
                                             halo="inkernel"),
             "pallas fused (in-kernel halo, TR=256)"),
            (lambda: make_fused_apply_pallas(op, halo="pipelined"),
             "pallas fused (pipelined halo)"),
            (lambda: make_fused_apply_pallas(op, block_rows=64,
                                             halo="extend"),
             "pallas fused (row-extend)"),
            (lambda: make_fused_apply(op), "xla roll fused")]:
        try:
            raw = maker()
            cand = jax.jit(raw)
            t0 = time.time()
            float(jnp.sum(cand(v)))
            log(f"{name}: compile+first {time.time()-t0:.2f}s")
            candidates.append((raw, cand, name))
        except Exception as e:  # pragma: no cover - toolchain-dependent
            log(f"{name} failed ({type(e).__name__}: {str(e)[:120]})")
    assert candidates

    def race_time(raw):
        """Quick marginal per-apply time (short window — selection only)."""
        @jax.jit
        def ch(v, k):
            def body(_, x):
                return raw(x) * scale0
            return jax.lax.fori_loop(0, k, body, v)

        def r(k):
            t0 = time.time()
            float(jnp.sum(ch(v, k)))
            return time.time() - t0

        r(5)
        r(5)
        return min((r(400) - r(100)) / 300.0 for _ in range(3))

    if len(candidates) > 1:
        timed_c = [(race_time(raw), raw, cand, name)
                   for raw, cand, name in candidates]
        for t, _, _, name in timed_c:
            log(f"  race: {name}: {t*1e6:.1f} us/apply")
        _, raw_mv, mv, name = min(timed_c, key=lambda x: x[0])
    else:
        raw_mv, mv, name = candidates[0]
    log(f"hero kernel: {name}")

    # on-chip parity guard: the timed kernel must match the XLA fused apply
    # (never benchmark a silently-wrong kernel)
    rng = np.random.default_rng(0)
    vr = jnp.asarray(rng.normal(size=(5, n, n)).astype(np.float32))
    ref = jax.jit(make_fused_apply(op))(vr)
    got = mv(vr)
    perr = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    log(f"parity vs XLA fused apply: {perr:.2e}")
    if not perr < 1e-4:
        log("*** parity FAILED — falling back to the XLA roll path ***")
        raw_mv = make_fused_apply(op)
        mv = jax.jit(raw_mv)

    # steady-state: chain applies on device; renormalize each step so the
    # chained values stay finite (the extra 5-plane scale pass is included
    # in — i.e. slightly inflates — the reported per-apply time).
    @jax.jit
    def chain(v, k):
        def body(_, x):
            return raw_mv(x) * scale0
        return jax.lax.fori_loop(0, k, body, v)

    def run(k):
        t0 = time.time()
        float(jnp.sum(chain(v, k)))  # scalar fetch = real device sync
        return time.time() - t0

    run(10)
    run(10)  # warm both compile paths
    # Methodology (judge r2): >=5 independent marginal samples — each sample
    # is (t(2000 applies) - t(500 applies)) / 1500 with fresh timings — report
    # best AND median, record the MEDIAN (robust to relay/host jitter, which
    # r2 measured at 35% on this link; the 1500-apply marginal window ~33 ms
    # keeps that jitter to a few percent of the window, vs ~30% at the r2
    # 300-apply window).
    samples = []
    for _ in range(5):
        t_lo = min(run(500) for _ in range(2))
        t_hi = min(run(2000) for _ in range(2))
        samples.append((t_hi - t_lo) / 1500.0)
    dt_best, dt = min(samples), float(np.median(samples))
    nnz_s = nnz / dt
    log(f"marginal device apply: median {dt*1e6:.1f} us "
        f"(best {dt_best*1e6:.1f} us; samples "
        f"{' '.join(f'{s*1e6:.1f}' for s in sorted(samples))} us) "
        f"-> {nnz_s/1e9:.2f} Gnnz/s median, {nnz/dt_best/1e9:.2f} best")

    # roofline context: the fused kernel reads 8 planes (theta + 5 state)
    # and writes 5 — coefficients are recomputed in registers, not streamed.
    bytes_min = 13 * n * n * np.dtype(np.float32).itemsize
    hbm_bw = 819e9   # v5e
    bw = bytes_min / dt
    log(f"fused min HBM traffic {bytes_min/1e6:.1f} MB -> implied BW "
        f"{bw/1e9:.0f} GB/s (v5e HBM ~819 GB/s, {bw/hbm_bw*100:.0f}%)")
    if bw < 0.70 * hbm_bw:
        log("*** WARNING: implied bandwidth below the 70%-of-roofline bar "
            "(BASELINE.md target). Investigate relay/host interference: "
            "compare the best-sample number and re-run before recording. ***")

    # CPU scipy baseline on the same operator
    try:
        import scipy.sparse as sp

        csr = op.A.to_csr()
        ip, ix, vals = csr.host_arrays()
        S = sp.csr_matrix((vals, ix, ip), shape=csr.shape)
        x = np.ones(csr.shape[1], np.float32)
        S = S.astype(np.float32)
        S @ x
        reps = max(1, int(2e8 // max(S.nnz, 1)))
        t0 = time.time()
        for _ in range(reps):
            y = S @ x
        cpu_dt = (time.time() - t0) / reps
        cpu_nnz_s = S.nnz / cpu_dt
        log(f"scipy CSR SpMV: {cpu_dt*1e3:.2f} ms -> {cpu_nnz_s/1e9:.3f} Gnnz/s")
        vs = nnz_s / cpu_nnz_s
    except Exception as e:  # pragma: no cover
        log("cpu baseline failed:", e)
        vs = float("nan")

    print(json.dumps({
        "metric": "spmv_nnz_per_s_512sq_multiphase",
        "value": round(nnz_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
