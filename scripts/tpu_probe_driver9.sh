#!/bin/bash
# Round-4 accuracy-trend run: 512-image synthetic set (the 48-image set
# overfits — 3/8 held-out frames collapse), 1500 steps bs2 at the paper
# crop, then raw + EMA evals on the same held-out seed-777 set.
LOG=${1:-/tmp/tpu_probe9.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver9 start $(date)" >> "$LOG"

. "$(dirname "$0")/tpu_probe_lib.sh"

JAX_PLATFORMS=cpu python scripts/make_synth_data.py --out /tmp/fsd_train512 \
  --n 512 --height 512 --width 960 --max_disp 160 --seed 10 >> "$LOG" 2>&1

run_step train_1500 5400 python scripts/train.py \
  --config configs/train/stereo_v1.json --workspace /tmp/ws_r4d \
  --num_iterations 1500 --batch_size 2 --log_every 50 --save_every 750 \
  --checkpoint none --n_devices 1 --seed 4 \
  --override model.vit_size=vits \
  --override data.datasets.0.path=/tmp/fsd_train512

run_step eval_raw1500 2400 python scripts/eval.py --dataset fsd \
  --root /tmp/fsd_eval --ckpt_dir /tmp/ws_r4d/checkpoints --ema 0 \
  --vit_size vits --max_disp 192 --valid_iters 32 \
  --out bench_logs/eval_fsd_r4_raw1500.jsonl

run_step eval_ema1500 2400 python scripts/eval.py --dataset fsd \
  --root /tmp/fsd_eval --ckpt_dir /tmp/ws_r4d/checkpoints --ema 1 \
  --vit_size vits --max_disp 192 --valid_iters 32 \
  --out bench_logs/eval_fsd_r4_ema1500.jsonl
echo "=== driver9 done $(date)" >> "$LOG"
