# Shared helpers for the TPU probe drivers (source this file; set LOG first).
#
# The tunnelled TPU runtime wedges for minutes after interrupted executions:
# gate every step on short-lived subprocess probes, retry each step once, and
# never enable the persistent compilation cache (deserialized executables
# wedge this runtime on re-execution — bench.py note).

alive() {
  # 240s: fresh-process first dispatch over the tunnel was measured at
  # 90-120s on 2026-08-19 (blocked in the runtime, not CPU-starved) — a 90s
  # probe timeout produced endless false NOT-ALIVE loops.
  timeout 240 python -c "
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
