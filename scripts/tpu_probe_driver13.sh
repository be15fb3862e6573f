#!/bin/bash
# Round-5 driver 13: main on-chip sequence after the knockout matrix.
#  1. bench.py — validate the consumer-fusion default on the official number
#  2. 5000-step bs2 training on the 4.6k fixed-geometry synthetic set
#  3. holdout evals (raw + EMA) on the seed-999 64-frame set
#  4. kernel SoL re-audit incl. the new fused-consumer row
#  5. bs1/bs2 inference memory analysis (compile-only)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
unset JAX_COMPILATION_CACHE_DIR
LOG=/root/repo/bench_logs/driver13.log
source scripts/tpu_probe_lib.sh

run_step bench_official 1800 python bench.py

run_step train_5000 14400 python scripts/train.py \
  --config configs/train/stereo_synth_r5.json --workspace /tmp/ws_r5 \
  --num_iterations 5000 --batch_size 2 --log_every 50 --save_every 1250 \
  --checkpoint none --n_devices 1 --seed 5

run_step eval_raw5000 2400 python scripts/eval.py --dataset fsd \
  --root data_synth/holdout --ckpt_dir /tmp/ws_r5/checkpoints --ema 0 \
  --vit_size vits --max_disp 192 --valid_iters 32 --max_frames 32 \
  --out bench_logs/eval_fsd_r5_raw5000.jsonl

run_step eval_ema5000 2400 python scripts/eval.py --dataset fsd \
  --root data_synth/holdout --ckpt_dir /tmp/ws_r5/checkpoints --ema 1 \
  --vit_size vits --max_disp 192 --valid_iters 32 --max_frames 32 \
  --out bench_logs/eval_fsd_r5_ema5000.jsonl

run_step kernels_sol_r5b 1200 bash -c \
  "python scripts/benchmark_kernels.py --device_json bench_logs/device_r5.json \
   --reps 3 | tee bench_logs/sol_r5b_raw.json"

run_step memory_bs12 2400 python scripts/bench_memory.py --batches 1,2 \
  --out bench_logs/memory_bs12_r5.json
echo DONE >> "$LOG"
