#!/bin/bash
# Round-4 wrap-up: bs1 CLI train throughput on the fixed host path (the
# fork's ~1.17 it/s reference point is bs "1-2"), and the 300-step
# checkpoint's raw-weights eval for the accuracy-anchor trend.
LOG=${1:-/tmp/tpu_probe8.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver8 start $(date)" >> "$LOG"

. "$(dirname "$0")/tpu_probe_lib.sh"

run_step train_bs1 2400 python scripts/train.py \
  --config configs/train/stereo_v1.json --workspace /tmp/ws_r4c \
  --num_iterations 120 --batch_size 1 --log_every 20 --save_every 1000 \
  --checkpoint none --n_devices 1 --seed 3 \
  --override model.vit_size=vits \
  --override data.datasets.0.path=/tmp/fsd_train

run_step eval_raw300 2400 python scripts/eval.py --dataset fsd \
  --root /tmp/fsd_eval --ckpt_dir /tmp/ws_r4/checkpoints --ema 0 \
  --vit_size vits --max_disp 192 --valid_iters 32 \
  --out bench_logs/eval_fsd_r4_raw300.jsonl --step 300
echo "=== driver8 done $(date)" >> "$LOG"
