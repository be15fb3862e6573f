#!/usr/bin/env python
"""Benchmark evaluation: run the model over a dataset and report metrics.

Covers the reference's headline evaluation axes (Middlebury BP-2, ETH3D
bad-1, KITTI D1 — BASELINE.md) on locally available data.

Usage:
  python scripts/eval.py --dataset middlebury --root /data/middlebury \
      [--ckpt_dir ...] [--valid_iters 32] [--scale 1.0] [--hiera 0] \
      [--max_frames N] [--vit_size vitl] [--max_disp 416]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=["middlebury", "eth3d", "kitti2015", "kitti2012", "fsd"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--valid_iters", type=int, default=32)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hiera", type=int, default=0)
    ap.add_argument("--max_frames", type=int, default=0)
    ap.add_argument("--vit_size", default="vitl")
    ap.add_argument("--max_disp", type=int, default=416)
    ap.add_argument("--step", default="latest",
                    help="checkpoint step to evaluate (default latest)")
    ap.add_argument("--ema", type=int, default=0,
                    help="evaluate the checkpoint's EMA weights")
    ap.add_argument("--out", default=None, help="write per-frame metrics JSONL")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.inference.datasets import (
        DATASET_ITERATORS,
        stereo_eval_metrics,
    )
    from foundationstereo_tpu.inference.hierarchical import run_hierarchical
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo
    from foundationstereo_tpu.ops.pad import InputPadder
    from foundationstereo_tpu.ops.resize import resize2d

    cfg_dict = {"vit_size": args.vit_size, "max_disp": args.max_disp}
    if args.ckpt_dir and (Path(args.ckpt_dir) / "config.json").exists():
        cfg_dict = {**json.loads((Path(args.ckpt_dir) / "config.json").read_text()
                                 ).get("model", {}), **cfg_dict}
    cfg = ModelConfig.from_dict(cfg_dict)
    model = FoundationStereo(cfg)

    variables = None

    # `variables` is a jit ARGUMENT, not a closure: closed-over trees bake
    # into the executable as compile-time constants (ADVICE r3 pattern).
    @functools.partial(jax.jit, static_argnums=(3,))
    def _fwd(v, l, r, iters, init_disp):
        return model.apply(v, l, r, iters=iters, test_mode=True,
                           init_disp=init_disp)

    def apply_fn(l, r, iters, init_disp=None):
        return _fwd(variables, l, r, iters, init_disp)

    rows = []
    out_f = open(args.out, "w") if args.out else None
    for i, sample in enumerate(DATASET_ITERATORS[args.dataset](args.root)):
        if args.max_frames and i >= args.max_frames:
            break
        left = jnp.asarray(sample["left"][None].astype(np.float32))
        right = jnp.asarray(sample["right"][None].astype(np.float32))
        if args.scale != 1.0:
            h, w = left.shape[1:3]
            nh, nw = int(h * args.scale), int(w * args.scale)
            left = resize2d(left, (nh, nw), "bilinear")
            right = resize2d(right, (nh, nw), "bilinear")

        if variables is None:
            padder0 = InputPadder(left.shape, divis_by=32)
            l0, r0 = padder0.pad(left, right)
            # Jit the init: eager flax init is hundreds of tiny dispatches —
            # tens of minutes over the tunnelled TPU runtime (round-2 finding).
            # Images are passed as jit ARGUMENTS, not closed over: XLA
            # constant-folds closed-over arrays at compile time (ADVICE r3).
            variables = jax.jit(
                lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True)
            )(jax.random.PRNGKey(0), l0, r0)
            if args.ckpt_dir:
                from foundationstereo_tpu.train.checkpoints import CheckpointManager
                mgr = CheckpointManager(args.ckpt_dir)
                want = (args.step if args.step == "latest"
                        else int(args.step))
                variables, step = mgr.restore_inference(
                    want, use_ema=bool(args.ema))
                print(f"restored step {step}"
                      f"{' (EMA weights)' if args.ema else ''}", file=sys.stderr)

        t0 = time.perf_counter()
        if args.hiera:
            disp = run_hierarchical(apply_fn, left, right, iters=args.valid_iters)
        else:
            padder = InputPadder(left.shape, divis_by=32)
            lp, rp = padder.pad(left, right)
            disp = apply_fn(lp, rp, args.valid_iters)
            disp = padder.unpad(disp[..., None])[..., 0]
        disp = np.asarray(disp)[0]
        dt = time.perf_counter() - t0

        if args.scale != 1.0:
            hh, ww = sample["disparity"].shape
            disp = np.asarray(resize2d(jnp.asarray(disp[None, ..., None]),
                                       (hh, ww), "bilinear")[0, ..., 0]) / args.scale

        m = stereo_eval_metrics(disp, sample["disparity"], sample["mask"])
        m["name"], m["time_s"] = sample["name"], round(dt, 3)
        rows.append(m)
        print(json.dumps(m), file=sys.stderr)
        if out_f:
            # Rows in the JSONL are explicitly discriminated (ADVICE r4):
            # per-frame rows carry type=frame, the final aggregate type=summary.
            out_f.write(json.dumps({"type": "frame", **m}) + "\n")

    agg = {k: float(np.nanmean([r[k] for r in rows]))
           for k in ("epe", "bad05", "bad1", "bad2", "bad3", "d1_all", "rmse", "time_s")}
    agg["frames"] = len(rows)
    agg["dataset"] = args.dataset
    print(json.dumps(agg))
    if out_f:
        out_f.write(json.dumps({"type": "summary", **agg}) + "\n")
        out_f.close()


if __name__ == "__main__":
    main()
