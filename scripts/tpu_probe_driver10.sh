#!/bin/bash
# Round-4 backward-split measurement + fresh on-chip demo/hiera evidence.
LOG=${1:-/tmp/tpu_probe10.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver10 start $(date)" >> "$LOG"

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

# Backward split at the bs1 paper crop: full step (known 0.818 s) vs
# test-mode forward at the same 22 iters, vs 1-iter train, vs no-EMA.
run_step fwd_only 1400 python scripts/bench_train_step.py \
  --batch 1 --height 736 --width 320 --reps 3 --mode eval
run_step train_i1 1400 python scripts/bench_train_step.py \
  --batch 1 --height 736 --width 320 --reps 3 --iters 1
run_step train_noema 1400 python scripts/bench_train_step.py \
  --batch 1 --height 736 --width 320 --reps 3 --ema 0

# Demo + hierarchical demo with the 1500-step checkpoint (full loop: train
# on chip -> checkpoint -> demo CLI -> point cloud, on current round-4 code).
printf '100 0 400 0 100 192 0 0 1\n0.06\n' > /tmp/K_r4.txt
run_step demo_1500 1800 python -m foundationstereo_tpu.inference.demo \
  --left_file /tmp/fsd_eval/left/rgb/00005.jpg \
  --right_file /tmp/fsd_eval/right/rgb/00005.jpg \
  --intrinsic_file /tmp/K_r4.txt --ckpt_dir /tmp/ws_r4d/checkpoints \
  --valid_iters 32 --out_dir /tmp/demo_r4 --denoise_cloud 1
run_step demo_hiera 1800 python -m foundationstereo_tpu.inference.demo \
  --left_file /tmp/fsd_eval/left/rgb/00005.jpg \
  --right_file /tmp/fsd_eval/right/rgb/00005.jpg \
  --intrinsic_file /tmp/K_r4.txt --ckpt_dir /tmp/ws_r4d/checkpoints \
  --valid_iters 32 --hiera 1 --out_dir /tmp/demo_r4_hiera --denoise_cloud 0
echo "=== driver10 done $(date)" >> "$LOG"
