#!/bin/bash
# Runs the full on-chip artifact suite sequentially, gating EVERY step on a
# relay-health probe (the axon remote-compile relay wedges for tens of
# minutes at a time — measured r3; a wedged relay absorbs whole step
# timeouts otherwise). Each step under its own timeout. Logs to
# /tmp/tpu_suite/.
set -u
OUT=${TPU_SUITE_OUT:-/tmp/tpu_suite}
mkdir -p $OUT
cd /root/repo

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" >/dev/null 2>&1
}

wait_relay() {
  until probe; do
    echo "$(date +%T) relay wedged" >> $OUT/status.log
    sleep 120
  done
  echo "$(date +%T) relay up" >> $OUT/status.log
}

run_step() {
  name=$1; tmo=$2; shift 2
  wait_relay
  echo "$(date +%T) step $name start" >> $OUT/status.log
  timeout "$tmo" "$@" > $OUT/$name.out 2> $OUT/$name.err
  echo "$(date +%T) step $name rc=$?" >> $OUT/status.log
}

run_step bench        1800 python bench.py
run_step kernels      3000 python benchmarks/kernels_tpu.py --out $OUT/KERNELS.json
run_step solve_ir     1800 python benchmarks/solve_tpu.py --n 512 --mode ir
# hybrid needs tol 1e-10: at 512^2 a 7.5e-9 residual leaves ~4e-5 algebraic
# error on top of the 2.3e-5 discretization error (see solve_tpu.py --mode)
run_step solve_hyb    2400 python benchmarks/solve_tpu.py --n 512 --mode hybrid --tol 1e-10
# r5 reconciliation (ADVICE r4): the unrestarted 1024^2 f64 basis FITS —
# the r4 'OOM' was per-call const re-transfer inflation, fixed in r5 —
# and unrestarted is fastest (5.2s/21 iters vs restart-16 5.6s/22,
# SOLVE_r05). 2048^2 is the size that needs restart (16).
run_step solve_1024   3000 python benchmarks/solve_tpu.py --n 1024 --mode hybrid --tol 1e-10 --max-outer 4
run_step solve_1024ir 3000 python benchmarks/solve_tpu.py --n 1024 --mode ir
# 2048^2 converges single-chip (r5): restart 15 fits the chunk-aligned
# 16-row f64 basis in HBM; aug-k 2 (LGMRES) breaks restart stagnation
# (72 iters/99s vs 116/170 plain, L2 1.456e-6 = discretization level)
run_step solve_2048   4200 python benchmarks/solve_tpu.py --n 2048 --mode hybrid --tol 1e-10 --restart 15 --max-outer 15 --aug-k 2
echo "$(date +%T) suite done" >> $OUT/status.log
