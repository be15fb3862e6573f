#!/bin/bash
# Round-4 measurement queue: GRU/DPT micro rates, official bench with the
# bf16-resize change + jit-arg init, batch-2 throughput probe, stage A.
LOG=${1:-/tmp/tpu_probe5.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver5 start $(date)" >> "$LOG"

. "$(dirname "$0")/tpu_probe_lib.sh"

run_step gru_micro 1150 python scripts/bench_gru_micro.py
run_step bench_b1 1150 python bench.py --reps 3
run_step bench_b2 1400 python bench.py --batch 2 --reps 2
run_step stageA 900 python scripts/bench_stages.py --stages A --reps 2
echo "=== driver5 done $(date)" >> "$LOG"
