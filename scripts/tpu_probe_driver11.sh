#!/bin/bash
# Round-4 finale: on-chip RESUME from the step-1500 checkpoint (+750 steps)
# — r2 VERDICT weak #4 noted resume-then-step had only CPU coverage — then
# eval the 2250-step weights for the accuracy trend.
LOG=${1:-/tmp/tpu_probe11.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver11 start $(date)" >> "$LOG"

. "$(dirname "$0")/tpu_probe_lib.sh"

run_step resume_2250 3600 python scripts/train.py \
  --config configs/train/stereo_v1.json --workspace /tmp/ws_r4d \
  --num_iterations 2250 --batch_size 2 --log_every 50 --save_every 750 \
  --checkpoint latest --n_devices 1 --seed 4 \
  --override model.vit_size=vits \
  --override data.datasets.0.path=/tmp/fsd_train512

run_step eval_raw2250 2400 python scripts/eval.py --dataset fsd \
  --root /tmp/fsd_eval --ckpt_dir /tmp/ws_r4d/checkpoints --ema 0 \
  --vit_size vits --max_disp 192 --valid_iters 32 \
  --out bench_logs/eval_fsd_r4_raw2250.jsonl
echo "=== driver11 done $(date)" >> "$LOG"
