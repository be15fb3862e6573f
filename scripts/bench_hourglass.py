#!/usr/bin/env python
"""Split the AHCF hourglass stage time: per-block timings at flagship scale.

The full hourglass measured 0.19 s (bench_stages D) while its matmul FLOPs
suggest ~10-20 ms at observed device rates — this script finds where the
time actually goes (APC disparity convs? FeatureAtt? deconvs? the DT?).

Every dispatch fenced with a scalar readback.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=184)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--maxdisp", type=int, default=416)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.models.layers import (
        BasicConv,
        Conv,
        Conv3dNormActReduced,
        CostVolumeDisparityAttention,
        FeatureAtt,
    )

    H4, W4, D = args.height, args.width, args.maxdisp // 4
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}  vol=(1,{D},{H4},{W4},28)", flush=True)

    def bench(name, module, x, *extra, flops=None):
        v = jax.jit(lambda k: module.init(k, x, *extra))(key)
        float(jnp.sum(jax.tree.leaves(v["params"])[0].astype(jnp.float32)))
        fn = jax.jit(lambda v_, x_: module.apply(v_, x_, *extra))
        t0 = time.time()
        out = fn(v, x)
        float(jnp.sum(out.astype(jnp.float32)))
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(v, x)
            float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        best = min(times)
        eff = f"  {flops / best / 1e12:.1f} TF/s" if flops else ""
        print(f"[{name}] {best * 1e3:.1f} ms (compile {compile_s:.0f}s){eff}",
              flush=True)

    c = 28
    x1 = jax.random.normal(key, (1, D, H4, W4, c), dt)

    # APC at level 0: (1,k,k) spatial conv + (17,1,1) disparity conv.
    apc_flops = 2 * D * H4 * W4 * (c * c * 9 + c * c * 17)
    bench("apc28_L0", Conv3dNormActReduced(c, kernel_size=3, kernel_disp=17,
                                           dtype=dt), x1, flops=apc_flops)

    # Stride-2 down conv 28->56.
    dn_flops = 2 * (D // 2) * (H4 // 2) * (W4 // 2) * c * (2 * c) * 27
    bench("down28_56", BasicConv(c * 2, 3, 2, 1, dtype=dt), x1, flops=dn_flops)

    x2 = jax.random.normal(key, (1, D // 2, H4 // 2, W4 // 2, c * 2), dt)
    apc2_flops = 2 * (D // 2) * (H4 // 2) * (W4 // 2) * ((2*c)**2) * (9 + 17)
    bench("apc56_L1", Conv3dNormActReduced(c * 2, kernel_size=3, kernel_disp=17,
                                           dtype=dt), x2, flops=apc2_flops)

    # Deconv 56->28 back to level 0.
    up_flops = 2 * D * H4 * W4 * (2 * c) * c * 64 / 8
    bench("deconv56_28", BasicConv(c, (4, 4, 4), 2, 1, deconv=True, dtype=dt),
          x2, flops=int(up_flops))

    # FeatureAtt gate at level 0 (feature 224 ch).
    feat = jax.random.normal(key, (1, H4, W4, 224), dt)
    bench("featatt28", FeatureAtt(c, dtype=dt), x1, feat)

    # DT branch: depthwise 4^3/4 patch conv + attention + x4 trilinear.
    bench("conv_patch", Conv(c, (4, 4, 4), 4, 0, groups=c, dtype=dt), x1)
    xp = jax.random.normal(key, (1, D // 4, H4 // 4, W4 // 4, c), dt)
    bench("dt_attn", CostVolumeDisparityAttention(
        d_model=c, nhead=4, dim_feedforward=c, num_transformer=4,
        max_len=args.maxdisp // 16, dtype=dt), xp)


if __name__ == "__main__":
    main()
