#!/usr/bin/env python
"""Export the model at a fixed shape/iteration count (make_onnx.py analog).

Usage:
  python scripts/make_export.py --save_path out/model.stablehlo \
      [--ckpt_dir workspace/run/checkpoints] [--height 448 --width 672] \
      [--iters 22] [--vit_size vits] [--max_disp 192]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--height", type=int, default=448)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--iters", type=int, default=22)
    ap.add_argument("--vit_size", default="vits")
    ap.add_argument("--max_disp", type=int, default=192)
    ap.add_argument("--dynamic_batch", type=int, default=0,
                    help="1 = symbolic batch dim (reference make_onnx.py:60 "
                         "dynamic_axes analog). Requires the XLA kernel path "
                         "(Pallas grids are shape-specialized).")
    args = ap.parse_args()

    import jax

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.inference.export import export_stablehlo
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

    cfg_dict = {"vit_size": args.vit_size, "max_disp": args.max_disp}
    if args.ckpt_dir:
        cfg_path = Path(args.ckpt_dir) / "config.json"
        if cfg_path.exists():
            cfg_dict = {**json.loads(cfg_path.read_text()).get("model", {}), **cfg_dict}
    cfg = ModelConfig.from_dict(cfg_dict)
    model = FoundationStereo(cfg)

    import jax.numpy as jnp
    left = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
    variables = jax.jit(  # jitted: eager init is minutes of tiny dispatches
        # images as jit args, not closures (avoid compile-time constant
        # folding of closed-over arrays — ADVICE r3)
        lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True)
    )(jax.random.PRNGKey(0), left, left)
    if args.ckpt_dir:
        from foundationstereo_tpu.train.checkpoints import CheckpointManager
        mgr = CheckpointManager(args.ckpt_dir)
        restored, step = mgr.restore("latest", {"params": variables["params"],
                                               "batch_stats": variables.get("batch_stats", {})})
        variables = restored
        print(f"loaded checkpoint step {step}")

    if args.dynamic_batch:
        # Pallas pallas_call grids are specialized to concrete (B*H,) sizes;
        # a symbolic batch must take the pure-XLA path.
        cfg = cfg.replace(use_pallas=False)
        model = FoundationStereo(cfg)
    manifest = export_stablehlo(model, variables, args.height, args.width,
                                args.iters, args.save_path,
                                dynamic_batch=bool(args.dynamic_batch))
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
