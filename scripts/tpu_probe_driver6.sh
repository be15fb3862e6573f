#!/bin/bash
# Round-4 training queue: device-side train-step timing (bs1/bs2), a longer
# on-chip training run (>=600 steps bs2 at 320x736), eval of the resulting
# EMA checkpoint on the held-out synthetic set, and the honest (DCE-fixed)
# full-ViT timing.
LOG=${1:-/tmp/tpu_probe6.log}
cd /root/repo
unset JAX_COMPILATION_CACHE_DIR
echo "=== driver6 start $(date)" >> "$LOG"

. "$(dirname "$0")/tpu_probe_lib.sh"

# Data (host-only; no chip needed)
JAX_PLATFORMS=cpu python scripts/make_synth_data.py --out /tmp/fsd_train --n 48 \
  --height 512 --width 960 --max_disp 160 --seed 0 >> "$LOG" 2>&1
JAX_PLATFORMS=cpu python scripts/make_synth_data.py --out /tmp/fsd_eval --n 8 \
  --height 384 --width 800 --max_disp 160 --seed 777 >> "$LOG" 2>&1

# Shapes match the shipped config's crop ([[320, 736]] = width 320 x
# height 736, the reference's own convention — train/dataloader.py:111).
run_step trainstep_b1 1400 python scripts/bench_train_step.py \
  --batch 1 --height 736 --width 320 --reps 3
run_step trainstep_b2 1400 python scripts/bench_train_step.py \
  --batch 2 --height 736 --width 320 --reps 3

run_step train_long 4200 python scripts/train.py \
  --config configs/train/stereo_v1.json --workspace /tmp/ws_r4 \
  --num_iterations 600 --batch_size 2 --log_every 20 --save_every 300 \
  --checkpoint none --n_devices 1 --seed 1 \
  --override model.vit_size=vits \
  --override data.datasets.0.path=/tmp/fsd_train

run_step eval_trained 2400 python scripts/eval.py --dataset fsd \
  --root /tmp/fsd_eval --ckpt_dir /tmp/ws_r4/checkpoints --ema 1 \
  --vit_size vits --max_disp 192 --valid_iters 32 \
  --out bench_logs/eval_fsd_r4_trained600.jsonl

run_step vit_full 1400 python scripts/bench_vit_full.py --parts vit_flash,dpt
echo "=== driver6 done $(date)" >> "$LOG"
