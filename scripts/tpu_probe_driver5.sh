#!/bin/bash
# Round-4 measurement queue: GRU/DPT micro rates, official bench with the
# bf16-resize change + jit-arg init, batch-2 throughput probe, stage A.
LOG=${1:-/tmp/tpu_probe5.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver5 start $(date)" >> "$LOG"

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

run_step gru_micro 1150 python scripts/bench_gru_micro.py
run_step bench_b1 1150 python bench.py --reps 3
run_step bench_b2 1400 python bench.py --batch 2 --reps 2
run_step stageA 900 python scripts/bench_stages.py --stages A --reps 2
echo "=== driver5 done $(date)" >> "$LOG"
