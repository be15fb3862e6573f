#!/bin/bash
# Round-5 driver 14: train-step utilization knockout matrix (VERDICT item 1),
# relaunched on the scan_upsample train path. The original driver12 matrix
# never produced a baseline: between round 4 and round 5 the environment's
# chipless AOT compiler regressed its layout assignment (size-1/iters axes
# minormost, 15x average tile padding) and the UNCHANGED r4 train step went
# from running at 0.818 s to a 30.4 GB compile-time OOM. The r5 fix (per-
# phase tap accumulation + per-iteration remat scan of the spx head)
# compiles at 6.2 GB temps. ko_folded_up keeps the old folded formulation
# as a knockout row — expected to fail at compile under this compiler;
# its exit status IS the measurement.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/bench_logs/knockouts_r5b_driver.log
source scripts/tpu_probe_lib.sh

B="python scripts/bench_train_step.py --batch 1 --iters 22 --reps 2"

run_step ko_baseline      1500 bash -c "$B"
run_step ko_loss_last     1500 bash -c "$B --loss_last_only 1"
run_step ko_bn_frozen     1500 bash -c "$B --remat_filter 0 --remat_refine 0 --bn_frozen 1"
run_step ko_no_rrefine    1500 bash -c "$B --remat_refine 0"
run_step ko_no_rfilter    1500 bash -c "$B --remat_filter 0"
run_step ko_fwd_only      1500 bash -c "$B --mode eval"
run_step ko_folded_up     1200 bash -c "$B --scan_upsample 0"
echo DONE >> "$LOG"
