#!/usr/bin/env python
"""HLO memory analysis of the inference program at batch sizes (VERDICT r4
item 6: name the allocation behind the bs2 throughput regression).

Compiles (AOT, no execution) the flagship test-mode forward at each batch
size and prints XLA's memory analysis — argument/output/temp/peak bytes —
plus the largest live buffers if the backend exposes them. Cheap on the
device: compile only, nothing is dispatched.

Usage: python scripts/bench_memory.py --batches 1,2 [--height 736
       --width 1280 --vit_size vitl --max_disp 416 --iters 32]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=736)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--vit_size", default="vitl")
    ap.add_argument("--max_disp", type=int, default=416)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--batches", default="1,2")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

    cfg = ModelConfig(max_disp=args.max_disp, vit_size=args.vit_size,
                      mixed_precision=True)
    model = FoundationStereo(cfg)
    rows = []
    for b in (int(s) for s in args.batches.split(",")):
        l = jax.ShapeDtypeStruct((b, args.height, args.width, 3), jnp.float32)
        # Params are shape-structs too: init traces without allocating.
        variables = jax.eval_shape(
            lambda k, li, ri: model.init(k, li, ri, iters=1, test_mode=True),
            jax.random.PRNGKey(0), l, l)
        fwd = jax.jit(lambda v, li, ri: model.apply(
            v, li, ri, iters=args.iters, test_mode=True))
        print(f"--- batch {b}: lowering/compiling ...", file=sys.stderr,
              flush=True)
        compiled = fwd.lower(variables, l, l).compile()
        row = {"batch": b}
        try:
            ma = compiled.memory_analysis()
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes",
                      "alias_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    row[k] = int(v)
            tot = sum(row.get(k, 0) for k in
                      ("argument_size_in_bytes", "output_size_in_bytes",
                       "temp_size_in_bytes"))
            row["total_gb"] = round(tot / 2**30, 3)
        except Exception as e:  # backend may not expose memory analysis
            row["memory_analysis_error"] = f"{type(e).__name__}: {e}"
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            for k in ("flops", "bytes accessed"):
                if k in ca:
                    row[k.replace(" ", "_")] = float(ca[k])
        except Exception as e:
            row["cost_analysis_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(row), flush=True)
        rows.append(row)

    if args.out:
        Path(args.out).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


if __name__ == "__main__":
    main()
