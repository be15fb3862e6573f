#!/bin/bash
# Round-5 driver 16: consolidated chip sequence after the compiler-regression
# fix. Replaces driver14's remaining rows (the no-remat knockouts OOM at
# compile under the regressed chipless AOT compiler — 20.6 GB plans — so
# retrying them only burns chip time; their "price" is now the OOM itself,
# recorded in knockouts_r5b_driver.log) and driver15.
#
# Knockouts (bench_train_step, bs1 320x736 vits 22 iters):
#   ko_base_c2 / ko_base_c11 — upsample-scan chunk sweep (c=1 already
#     measured: 0.956 s; folded OOMs). Picks the production default.
#   ko_bn_frozen_remat — BN running-stats under grad WITH production remat
#     (isolates batch-stat reduction + recompute cost without the no-remat
#     OOM).
#   ko_fwd_only — eval-mode forward at the same shapes (backward+update =
#     baseline - this).
# Then: SoL re-audit incl. DMA-floor rows, bs2 memory analyses, 2500-step
# training on the 4.6k synthetic set, raw+EMA holdout evals.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
unset JAX_COMPILATION_CACHE_DIR
LOG=/root/repo/bench_logs/driver16.log
source scripts/tpu_probe_lib.sh

B="python scripts/bench_train_step.py --batch 1 --iters 22 --reps 2"

run_step ko_base_c2       1500 bash -c "$B --scan_upsample_chunk 2"
run_step ko_base_c11      1500 bash -c "$B --scan_upsample_chunk 11"
run_step ko_bn_frozen_remat 1500 bash -c "$B --bn_frozen 1"
run_step ko_fwd_only      1500 bash -c "$B --mode eval"

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
