#!/bin/bash
# Final measurement queue: official bench first, then stage breakdown + SoL.
LOG=${1:-/tmp/tpu_probe4.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver4 start $(date)" >> "$LOG"

alive() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print('ALIVE', float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))" 2>/dev/null | grep -q ALIVE
}

wait_alive() {
  for i in $(seq 1 45); do
    if alive; then echo "[driver] alive after $i probes $(date +%T)" >> "$LOG"; return 0; fi
    sleep 60
  done
  echo "[driver] never recovered" >> "$LOG"; return 1
}

run_step() {
  local name="$1"; local tmo="$2"; shift 2
  for attempt in 1 2; do
    wait_alive || return 1
    echo "--- $name attempt$attempt ($(date +%T))" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "--- $name attempt$attempt exit=$rc ($(date +%T))" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

run_step fullbench 1150 python bench.py --reps 3
cp /tmp/tpu_probe4.log /tmp/after_bench.marker 2>/dev/null
run_step stageACD 1150 python scripts/bench_stages.py --stages A,C,D --iters 4
run_step stageE 1150 python scripts/bench_stages.py --stages E --iters 32
run_step kernels_sol 900 python scripts/benchmark_kernels.py --reps 2 --impl pallas
echo "=== driver4 done $(date)" >> "$LOG"
