#!/bin/bash
# Round-5 driver 12: train-step utilization knockout matrix (VERDICT item 1).
# Each run is the bs1 320x736 vits 22-iter step with ONE cost source removed;
# the delta vs the baseline row is that source's price on this chip.
cd /root/repo
# Keep /root/.axon_site on the path — clobbering it unregisters the TPU
# plugin and every aliveness probe fails with "Unable to initialize backend".
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/bench_logs/knockouts_r5_driver.log
source scripts/tpu_probe_lib.sh

B="python scripts/bench_train_step.py --batch 1 --iters 22 --reps 2"

run_step ko_baseline      1500 bash -c "$B"
run_step ko_no_rrefine    1500 bash -c "$B --remat_refine 0"
run_step ko_no_rfilter    1500 bash -c "$B --remat_filter 0"
run_step ko_no_remat      1500 bash -c "$B --remat_filter 0 --remat_refine 0"
run_step ko_loss_last     1500 bash -c "$B --loss_last_only 1"
run_step ko_bn_frozen     1500 bash -c "$B --remat_filter 0 --remat_refine 0 --bn_frozen 1"
run_step ko_fwd_only      1500 bash -c "$B --mode eval"
echo DONE >> "$LOG"
