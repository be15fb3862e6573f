#!/usr/bin/env python
"""Per-kernel benchmark with speed-of-light accounting (north-star metric).

Times the hot ops at a given working shape and reports achieved vs roofline
time. Roofline model: time >= max(bytes/BW, flops/peak) for the op's minimal
data movement and arithmetic.

Usage:
  python scripts/benchmark_kernels.py [--height 184 --width 320 --maxdisp 104]
      [--iters 32] [--reps 3] [--impl pallas|xla|both]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# v5e per-chip peaks (public specs); override via env/flags for other gens.
# NOTE: a raw bf16 matmul probe on this tunnelled chip sustains ~24 TFLOP/s
# (scripts/bench_vit_full.py), so flops-limited rooflines built from the
# public peak are upper bounds well above what the device delivers.
HBM_GBPS = 819.0
BF16_TFLOPS = 197.0
FP32_TFLOPS = 49.0  # MXU fp32 ~= 1/4 bf16 on v5e


def emit(results, name, t, sol):
    import jax
    row = {"kernel": name, "time_s": round(t, 5), "sol_s": round(sol, 5),
           "sol_frac": round(sol / t, 4) if t > 0 else 0.0,
           "backend": jax.default_backend()}
    results.append(row)
    print(json.dumps(row), flush=True)


def timeit(fn, reps):
    import jax
    import jax.numpy as jnp
    float(jnp.sum(fn()))  # compile + fenced first run (overlap wedges the device)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))   # fence through host readback
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=184)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--maxdisp", type=int, default=104)
    ap.add_argument("--channels", type=int, default=224)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--impl", default="both", choices=["pallas", "xla", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.ops.cost_volume import (
        build_concat_volume,
        build_gwc_volume,
    )
    from foundationstereo_tpu.ops.pallas_kernels import (
        build_cost_volume_pallas,
        disparity_lookup_pallas_pre,
        to_kernel_layout,
    )
    from foundationstereo_tpu.ops.sampler import disparity_lookup, pool_last_axis

    B, H, W, C, D = 1, args.height, args.width, args.channels, args.maxdisp
    G, P, VC, R = 8, 12, 28, 4
    K = 2 * R + 1
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu

    key = jax.random.PRNGKey(0)
    mk = lambda shape: jax.random.normal(jax.random.fold_in(key, hash(shape) % 997),
                                         shape, jnp.float32)
    left, right = mk((B, H, W, C)), mk((B, H, W, C))
    lp, rp = mk((B, H, W, P)), mk((B, H, W, P))
    geo = mk((B, H, W, VC, D))
    corr = mk((B, H, W, W))
    disp = jnp.abs(mk((B, H, W))) * 20.0
    gp = tuple(pool_last_axis(geo, 3))
    cp = tuple(pool_last_axis(corr, 3))

    results = []

    # --- k1: cost volume -------------------------------------------------
    # Minimal traffic: read L/R/proj once + write (B,D,H,W,G+2P) fp32.
    vol_bytes = B * D * H * W * (G + 2 * P) * 4
    feat_bytes = 2 * B * H * W * (C + P) * 4
    k1_sol = (vol_bytes + feat_bytes) / (HBM_GBPS * 1e9)
    k1_flops = 2 * B * D * H * W * C  # gwc dot products dominate
    k1_sol = max(k1_sol, k1_flops / (FP32_TFLOPS * 1e12))

    if args.impl in ("pallas", "both"):
        f = jax.jit(lambda a, b, c, d: build_cost_volume_pallas(
            a, b, c, d, D, G, interpret=interp))
        t = timeit(lambda: f(left, right, lp, rp), args.reps)
        emit(results, "cost_volume_pallas", t, k1_sol)
    if args.impl in ("xla", "both"):
        f = jax.jit(lambda a, b, c, d: jnp.concatenate(
            [build_gwc_volume(a, b, D, G),
             build_concat_volume(c, d, D)], axis=-1))
        t = timeit(lambda: f(left, right, lp, rp), args.reps)
        emit(results, "cost_volume_xla", t, k1_sol)

    # --- k2: lookup (one GRU iteration x args.iters scan) ------------------
    # Minimal traffic per iteration: read the pyramids once.
    pyr_bytes = sum(int(np.prod(g.shape)) * 4 for g in gp) + \
        sum(int(np.prod(c.shape)) * 4 for c in cp)
    k2_sol = args.iters * pyr_bytes / (HBM_GBPS * 1e9)

    def scan_lookup(lookup_fn):
        # The pyramids MUST be jit arguments, not closed-over constants —
        # XLA constant-folds closures, and folding the multi-hundred-MB
        # pyramid transposes takes tens of minutes at compile time.
        def run(d0, g, c):
            def step(d, _):
                feat = lookup_fn(list(g), list(c), d, R)
                return d + 1e-4 * feat[..., 0], None
            return jax.lax.scan(step, d0, None, length=args.iters)[0]
        return jax.jit(run)

    if args.impl in ("pallas", "both"):
        from foundationstereo_tpu.ops.pallas_kernels import (
            disparity_lookup_pallas_fused,
        )
        # Kernel layout computed ONCE outside the scan (as the model does).
        gk, ck = to_kernel_layout(list(gp), list(cp))
        gk, ck = tuple(gk), tuple(ck)
        f = scan_lookup(lambda g, c, d, r: disparity_lookup_pallas_pre(
            g, c, d, r, interpret=interp))
        t = timeit(lambda: f(disp, gk, ck), args.reps)
        emit(results, f"lookup_pallas_x{args.iters}", t, k2_sol)
        # bf16 layouts halve the per-iteration pyramid traffic.
        gk16, ck16 = to_kernel_layout(list(gp), list(cp), dtype=jnp.bfloat16)
        gk16, ck16 = tuple(gk16), tuple(ck16)
        t = timeit(lambda: f(disp, gk16, ck16), args.reps)
        emit(results, f"lookup_pallas_bf16_x{args.iters}", t, k2_sol / 2)
        # Fused kernel needs bf16 layouts (fp32 overflows VMEM — see kernel doc).
        ff = scan_lookup(lambda g, c, d, r: disparity_lookup_pallas_fused(
            g, c, d, r, interpret=interp))
        t = timeit(lambda: ff(disp, gk16, ck16), args.reps)
        emit(results, f"lookup_pallas_fused_bf16_x{args.iters}", t, k2_sol / 2)
    if args.impl in ("xla", "both"):
        f = scan_lookup(disparity_lookup)
        t = timeit(lambda: f(disp, gp, cp), args.reps)
        emit(results, f"lookup_xla_x{args.iters}", t, k2_sol)



if __name__ == "__main__":
    main()
