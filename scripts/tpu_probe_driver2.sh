#!/bin/bash
# Round 2 probe driver: longer budgets, shared persistent compile cache.
LOG=${1:-/tmp/tpu_probe2.log}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/fstpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
echo "=== driver2 start $(date)" >> "$LOG"

alive() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print('ALIVE', float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))" 2>/dev/null | grep -q ALIVE
}

wait_alive() {
  for i in $(seq 1 40); do
    if alive; then echo "alive after $i probes $(date +%T)" >> "$LOG"; return 0; fi
    sleep 60
  done
  echo "never recovered" >> "$LOG"; return 1
}

run_step() {
  local name="$1"; local tmo="$2"; shift 2
  echo "--- step $name ($(date +%T))" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- step $name exit=$rc ($(date +%T))" >> "$LOG"
  if [ $rc -ne 0 ]; then wait_alive; fi
}

wait_alive || exit 1
run_step stageC 900 python scripts/bench_stages.py --stages C --iters 4
run_step stageE 900 python scripts/bench_stages.py --stages E --iters 4
run_step stageD 900 python scripts/bench_stages.py --stages D
run_step stageA 900 python scripts/bench_stages.py --stages A
run_step stageF 1200 python scripts/bench_stages.py --stages F --iters 32
run_step fullbench 1200 python bench.py --reps 3
echo "=== driver2 done $(date)" >> "$LOG"
