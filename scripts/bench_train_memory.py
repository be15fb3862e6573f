#!/usr/bin/env python
"""Compile-only HLO memory analysis of the TRAIN step (no execution).

Round-5 tool: the knockout baseline train step started failing at COMPILE
time with an XLA:TPU hbm plan of 30.4G (vs 15.75G) — the AOT compiler
assigns pathological layouts (size-1 broadcast dims minormost, iters axis
on lanes) to the stacked upsample/loss backward. This probe AOT-compiles
the bs1 train step from ShapeDtypeStructs — no init on device, no dispatch
— and prints either the memory analysis or the compiler's OOM breakdown,
so layout fixes can be iterated in ~compile time.

Usage: python scripts/bench_train_memory.py [--batch 1 --iters 22
       --height 320 --width 736 --vit_size vits --max_disp 192]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=736)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--vit_size", default="vits")
    ap.add_argument("--max_disp", type=int, default=192)
    ap.add_argument("--iters", type=int, default=22)
    ap.add_argument("--ema", type=int, default=1)
    ap.add_argument("--loss_last_only", type=int, default=0)
    ap.add_argument("--remat_filter", type=int, default=1)
    ap.add_argument("--remat_refine", type=int, default=1)
    ap.add_argument("--scan_upsample", type=int, default=1)
    ap.add_argument("--scan_upsample_chunk", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.train.trainer import Trainer

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
        },
        "loss": {
            "stereo": {"main": stereo_loss},
            "invalid": {"dummy": {"function": "disparity_l1_loss", "weight": 0.0,
                                  "params": {"max_disparity": float(args.max_disp)}}},
        },
        "optimizer": {"type": "AdamW", "params": [
            {"params": {"include": ["*"], "exclude": []},
             "lr": 1e-4, "weight_decay": 1e-4}]},
    }

    B, H, W = args.batch, args.height, args.width
    f32 = jnp.float32
    batch_shapes = {
        "left": jax.ShapeDtypeStruct((B, H, W, 3), f32),
        "right": jax.ShapeDtypeStruct((B, H, W, 3), f32),
        "disparity": jax.ShapeDtypeStruct((B, H, W), f32),
        "mask": jax.ShapeDtypeStruct((B, H, W), jnp.bool_),
        "label_idx": jax.ShapeDtypeStruct((B,), jnp.int32),
        "rng": jax.ShapeDtypeStruct((2,), jnp.uint32),
    }

    trainer = Trainer(config, seed=0, enable_ema=bool(args.ema))
    t0 = time.time()
    state_shapes = jax.eval_shape(trainer.init_state, batch_shapes)
    print(f"eval_shape(init): {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    lowered = type(trainer).train_step.lower(trainer, state_shapes, batch_shapes)
    print(f"lower: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    try:
        compiled = lowered.compile()
    except Exception as e:
        msg = str(e)
        print(f"COMPILE FAILED after {time.time()-t0:.1f}s", flush=True)
        print("\n".join(msg.splitlines()[:120]), flush=True)
        sys.exit(1)
    print(f"compile: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    row = {"batch": B, "iters": args.iters, "vit_size": args.vit_size,
           "loss_last_only": args.loss_last_only}
    try:
        ma = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                row[k] = int(v)
        row["temp_gb"] = round(row.get("temp_size_in_bytes", 0) / 2**30, 3)
    except Exception as e:
        row["memory_analysis_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
