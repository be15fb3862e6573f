#!/bin/bash
# Autonomous experiment queue: aliveness-gated, retry-once, generous budgets.
LOG=${1:-/tmp/tpu_probe3.log}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/fstpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
echo "=== driver3 start $(date)" >> "$LOG"

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

run_step lk2_scan8 880 env PYTHONPATH=/root/repo:/root/.axon_site python /tmp/probe_lk2.py
run_step cv_static 880 python scripts/bench_stages.py --stages C --iters 4
run_step stageF8 1100 python scripts/bench_stages.py --stages F --iters 8
run_step stageF32 1100 python scripts/bench_stages.py --stages F --iters 32
run_step fullbench 1150 python bench.py --reps 3
echo "=== driver3 done $(date)" >> "$LOG"
