#!/bin/bash
# Waits for the TPU remote-compile relay to recover, then runs the full
# on-chip artifact suite sequentially. Each step under its own timeout so a
# re-wedged relay cannot absorb the whole budget. Probe results and step
# logs go to /tmp/tpu_suite/.
set -u
OUT=/tmp/tpu_suite
mkdir -p $OUT
cd /root/repo

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" >/dev/null 2>&1
}

echo "$(date +%T) waiting for TPU relay..." >> $OUT/status.log
until probe; do
  echo "$(date +%T) relay still wedged" >> $OUT/status.log
  sleep 180
done
echo "$(date +%T) RELAY UP — running suite" >> $OUT/status.log

run_step() {
  name=$1; tmo=$2; shift 2
  echo "$(date +%T) step $name start" >> $OUT/status.log
  timeout "$tmo" "$@" > $OUT/$name.out 2> $OUT/$name.err
  echo "$(date +%T) step $name rc=$?" >> $OUT/status.log
}

run_step bench        900 python bench.py
run_step kernels     2400 python benchmarks/kernels_tpu.py --out $OUT/KERNELS_r03.json
run_step solve_ir    1800 python benchmarks/solve_tpu.py --n 512 --mode ir
run_step solve_hyb   2400 python benchmarks/solve_tpu.py --n 512 --mode hybrid
run_step solve_2048  2400 python benchmarks/solve_tpu.py --n 2048 --mode ir --tol 1e-6 --max-outer 3
echo "$(date +%T) suite done" >> $OUT/status.log
