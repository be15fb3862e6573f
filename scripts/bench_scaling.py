#!/usr/bin/env python
"""Scaling-efficiency harness: test-mode pairs/s at mesh sizes 1/2/4/8.

Runs the inference forward under (data x spatial) meshes of increasing size
and reports throughput + scaling efficiency vs the 1-device run. On the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8,
JAX_PLATFORMS=cpu) this validates the sharded program end-to-end; on a real
multi-chip TPU slice the same command produces the BASELINE.md scaling
numbers (north star: >=80 % efficiency 1 chip -> N).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py --sizes 1,2,4,8 --height 192 --width 320
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
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--vit_size", default="vits")
    ap.add_argument("--max_disp", type=int, default=192)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = one pair per data-parallel group")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-virtual-device CPU mesh (env vars alone "
                         "are ignored — sitecustomize pins the TPU backend)")
    args = ap.parse_args()

    import os

    if args.cpu:
        n_max = max(int(s) for s in args.sizes.split(","))
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_max}").strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo
    from foundationstereo_tpu.parallel import make_mesh, mesh_context
    from foundationstereo_tpu.parallel.sharding import place_batch, replicate

    cfg = ModelConfig(max_disp=args.max_disp, vit_size=args.vit_size,
                      mixed_precision=jax.default_backend() == "tpu")
    model = FoundationStereo(cfg)
    rng = np.random.default_rng(0)

    rows = []
    base = None
    for n in [int(s) for s in args.sizes.split(",")]:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices", file=sys.stderr)
            continue
        mesh = make_mesh(n)
        b = args.batch or max(1, mesh.shape["data"])
        left = jnp.asarray(rng.uniform(0, 255, (b, args.height, args.width, 3))
                           .astype(np.float32))
        right = jnp.asarray(rng.uniform(0, 255, (b, args.height, args.width, 3))
                            .astype(np.float32))
        with mesh_context(mesh):
            variables = jax.jit(
                lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True)
            )(jax.random.PRNGKey(0), left, right)
            variables = jax.device_put(variables, replicate(mesh))
            batch = place_batch({"left": np.asarray(left),
                                 "right": np.asarray(right)}, mesh)
            fwd = jax.jit(lambda v, l, r: model.apply(
                v, l, r, iters=args.iters, test_mode=True))
            t0 = time.time()
            out = fwd(variables, batch["left"], batch["right"])
            float(jnp.sum(out))
            print(f"[n={n} mesh={dict(mesh.shape)}] compile+run0 "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = fwd(variables, batch["left"], batch["right"])
                float(jnp.sum(out))
                times.append(time.perf_counter() - t0)
        best = min(times)
        pps = b / best
        row = {"devices": n, "mesh": dict(mesh.shape), "batch": b,
               "time_s": round(best, 4), "pairs_per_s": round(pps, 4)}
        if base is None:
            base = pps / n
        row["scaling_eff"] = round(pps / (n * base), 4)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    result = {"config": {"height": args.height, "width": args.width,
                         "vit_size": args.vit_size, "max_disp": args.max_disp,
                         "iters": args.iters,
                         "backend": jax.default_backend()},
              "rows": rows}
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
