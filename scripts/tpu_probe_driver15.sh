#!/bin/bash
# Round-5 driver 15: post-knockout chip sequence. Waits for driver14's
# knockout matrix to finish, then:
#  1. kernel SoL re-audit incl. the new DMA-floor rows (floor derivation
#     for the >=80% north star — BASELINE.md)
#  2. compile-only memory analysis: bs2 inference (VERDICT item 6) and
#     bs2 train step (gates the training batch size below)
#  3. step-capped training on the 4.6k-image fixed-geometry synthetic set
#     (VERDICT item 5 — held-out collapse check), then raw+EMA evals on
#     the 64-frame holdout.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
unset JAX_COMPILATION_CACHE_DIR
LOG=/root/repo/bench_logs/driver15.log
source scripts/tpu_probe_lib.sh

for i in $(seq 1 120); do
  grep -q DONE bench_logs/knockouts_r5b_driver.log 2>/dev/null && break
  sleep 60
done

run_step kernels_sol_r5b 2400 bash -c \
  "python scripts/benchmark_kernels.py --device_json bench_logs/device_r5.json \
   --reps 3 | tee bench_logs/sol_r5b_raw.json"

run_step memory_bs2_infer 2400 python scripts/bench_memory.py --batches 2 \
  --out bench_logs/memory_bs2_infer_r5.json

if run_step mem_train_bs2 1500 python scripts/bench_train_memory.py --batch 2; then
  TRAIN_BS=2
else
  TRAIN_BS=1
fi
echo "train batch size: $TRAIN_BS" >> "$LOG"

run_step train_r5 10800 python scripts/train.py \
  --config configs/train/stereo_synth_r5.json --workspace /tmp/ws_r5 \
  --num_iterations 2500 --batch_size "$TRAIN_BS" --log_every 50 \
  --save_every 1250 --checkpoint none --n_devices 1 --seed 5

run_step eval_raw2500 2400 python scripts/eval.py --dataset fsd \
  --root data_synth/holdout --ckpt_dir /tmp/ws_r5/checkpoints --ema 0 \
  --vit_size vits --max_disp 192 --valid_iters 32 --max_frames 32 \
  --out bench_logs/eval_fsd_r5_raw2500.jsonl

run_step eval_ema2500 2400 python scripts/eval.py --dataset fsd \
  --root data_synth/holdout --ckpt_dir /tmp/ws_r5/checkpoints --ema 1 \
  --vit_size vits --max_disp 192 --valid_iters 32 --max_frames 32 \
  --out bench_logs/eval_fsd_r5_ema2500.jsonl
echo DONE >> "$LOG"
