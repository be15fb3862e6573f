#!/usr/bin/env python
"""Pure device-side train-step timing on synthetic batches.

`scripts/train.py`'s logged it/s folds in host dataloading, padding, the
tunnel transfer of each batch, and the per-step metrics readback. This bench
isolates the compiled step: one synthetic batch placed on device once, the
jitted train_step dispatched and fenced `--reps` times (state is re-donated
each call). The it/s gap between this and the train CLI's number is the
host-side share.

Usage: python scripts/bench_train_step.py [--batch 2] [--height 320
       --width 736] [--vit_size vits] [--iters 22] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=736)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--vit_size", default="vits")
    ap.add_argument("--max_disp", type=int, default=192)
    ap.add_argument("--iters", type=int, default=22)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ema", type=int, default=1)
    ap.add_argument("--mode", default="train", choices=("train", "eval"),
                    help="train = full step; eval = test-mode forward only "
                         "(same shapes/iters) — the difference isolates "
                         "backward+update cost")
    # Stage-knockout flags (round-5 utilization split). Each removes ONE
    # cost source from the compiled step; the delta vs the default step is
    # that source's price. Knockouts change semantics — measurement only.
    ap.add_argument("--remat_filter", type=int, default=1,
                    help="0 = keep cost-filter activations (no recompute)")
    ap.add_argument("--remat_refine", type=int, default=1,
                    help="0 = keep refine-iteration activations")
    ap.add_argument("--bn_frozen", type=int, default=0,
                    help="1 = BatchNorm uses running stats under grad "
                         "(knocks out batch-stat reductions + their remat)")
    ap.add_argument("--loss_last_only", type=int, default=0,
                    help="1 = L1 on the final pred only (knocks out the "
                         "22x full-res upsample/loss stack backward)")
    ap.add_argument("--scan_upsample", type=int, default=1,
                    help="0 = folded (iters*B) upsample head instead of the "
                         "chunked scan (r5 default)")
    ap.add_argument("--scan_upsample_chunk", type=int, default=1,
                    help="iterations folded per upsample-scan step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.train.trainer import Trainer, make_label_index

    stereo_loss = (
        {"function": "disparity_l1_loss", "weight": 1.0,
         "params": {"max_disparity": float(args.max_disp)}}
        if args.loss_last_only else
        {"function": "foundation_stereo_loss", "weight": 1.0,
         "params": {"gamma": 0.9, "max_disparity": float(args.max_disp)}})
    config = {
        "model": {
            "max_disp": args.max_disp, "vit_size": args.vit_size,
            "mixed_precision": True, "train_iters": args.iters,
            "valid_iters": args.iters,
            "remat_filter": bool(args.remat_filter),
            "remat_refine": bool(args.remat_refine),
            "scan_upsample": bool(args.scan_upsample),
            "scan_upsample_chunk": args.scan_upsample_chunk,
            # bn_frozen runs the fwd-under-grad with train=False; pin the
            # XLA kernels so _pallas_mode doesn't flip to the inference-only
            # (non-differentiable) Pallas lookup and skew the comparison.
            **({"use_pallas": False} if args.bn_frozen else {}),
        },
        "loss": {
            "stereo": {"main": stereo_loss},
            "invalid": {"dummy": {"function": "disparity_l1_loss", "weight": 0.0,
                                  "params": {"max_disparity": float(args.max_disp)}}},
        },
        "optimizer": {"type": "AdamW", "params": [
            {"params": {"include": ["*"], "exclude": []}, "lr": 1e-4,
             "weight_decay": 1e-4}]},
        "lr_scheduler": {"type": "LambdaLR",
                         "params": {"lr_lambda":
                                    "Piecewise((1.0, epoch < 160000), (0.1, True))"}},
    }
    b, h, w = args.batch, args.height, args.width
    rng = np.random.default_rng(0)
    batch = {
        "left": jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "right": jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)),
        "disparity": jnp.asarray(rng.uniform(0, 60, (b, h, w)).astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(size=(b, h, w)) > 0.2),
        "label_idx": jnp.asarray(make_label_index(["stereo"] * b, config["loss"])),
        "rng": jnp.asarray([0, 1], jnp.uint32),
    }
    print(f"devices: {jax.devices()}  batch={b} {h}x{w} {args.vit_size} "
          f"iters={args.iters}", flush=True)

    trainer = Trainer(config, seed=0, enable_ema=bool(args.ema))
    if args.bn_frozen:
        trainer.train_flag = False  # measurement-only: see Trainer.train_flag
    t0 = time.time()
    state = trainer.init_state(batch)
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    metric_name = "epe" if args.mode == "eval" else "loss"
    if args.mode == "eval":
        def step_once(state):
            disp, metrics = trainer.eval_step(state, batch)
            return state, float(jnp.mean(metrics["epe"]))  # (B,) per-sample
    else:
        def step_once(state):
            new_state, metrics = trainer.train_step(state, batch)
            loss = float(metrics["loss"])   # fences the dispatch
            return new_state, loss

    t0 = time.time()
    state, val = step_once(state)
    print(f"compile+step0: {time.time() - t0:.1f}s {metric_name}={val:.4f}", flush=True)

    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        state, val = step_once(state)
        times.append(time.perf_counter() - t0)
        print(f"step{i+1}: {times[-1]:.3f}s {metric_name}={val:.4f}", flush=True)
    best = min(times)
    print(f"best device step: {best:.3f}s = {1.0 / best:.3f} it/s "
          f"({b / best:.3f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
