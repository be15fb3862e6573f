#!/bin/bash
# Round-4 follow-ups: raw-weights eval of the 600-step checkpoint, a short
# bs2 train run on the FIXED host data path (f32 aug + host-side padding +
# batched metric fetch) for the CLI-throughput number, and the official
# bench re-run.
LOG=${1:-/tmp/tpu_probe7.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver7 start $(date)" >> "$LOG"

. "$(dirname "$0")/tpu_probe_lib.sh"

run_step eval_raw600 2400 python scripts/eval.py --dataset fsd \
  --root /tmp/fsd_eval --ckpt_dir /tmp/ws_r4/checkpoints --ema 0 \
  --vit_size vits --max_disp 192 --valid_iters 32 \
  --out bench_logs/eval_fsd_r4_raw600.jsonl

run_step train_fastpath 2400 python scripts/train.py \
  --config configs/train/stereo_v1.json --workspace /tmp/ws_r4b \
  --num_iterations 80 --batch_size 2 --log_every 20 --save_every 1000 \
  --checkpoint none --n_devices 1 --seed 2 \
  --override model.vit_size=vits \
  --override data.datasets.0.path=/tmp/fsd_train

run_step bench_final 1400 python bench.py --reps 3
echo "=== driver7 done $(date)" >> "$LOG"
