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

# v5e per-chip peaks (public specs). The tunnelled chip delivers far less:
# scripts/bench_device.py measures ~369 GB/s streaming HBM bandwidth and
# ~93 TF/s sustained bf16 matmul (bench_logs/device_r3.json) — pass
# --hbm_gbps/--tflops (or point --device_json at a bench_device output) so
# sol accounting is read against BOTH the public-spec and measured ceilings.
HBM_GBPS = 819.0
BF16_TFLOPS = 197.0
FP32_TFLOPS = 49.0  # MXU fp32 ~= 1/4 bf16 on v5e


def emit(results, name, t, sol, sol_measured=None, n_amortized=1):
    import jax
    row = {"kernel": name, "time_s": round(t, 5), "sol_s": round(sol, 6),
           "sol_frac": round(sol / t, 4) if t > 0 else 0.0,
           "backend": jax.default_backend(), "n_amortized": n_amortized}
    if sol_measured is not None:
        row["sol_s_measured_bw"] = round(sol_measured, 6)
        row["sol_frac_measured_bw"] = round(sol_measured / t, 4) if t > 0 else 0.0
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
    ap.add_argument("--hbm_gbps", type=float, default=None,
                    help="measured HBM bandwidth (bench_device.py)")
    ap.add_argument("--tflops", type=float, default=None,
                    help="measured sustained matmul TF/s (bench_device.py)")
    ap.add_argument("--device_json", default=None,
                    help="bench_device.py JSON to read measured ceilings from")
    ap.add_argument("--cv_scan", type=int, default=8,
                    help="amortize the cost-volume dispatch over a scan of N "
                         "builds (the ~24 ms tunnel round-trip otherwise "
                         "dominates a single dispatch)")
    args = ap.parse_args()

    meas_gbps, meas_tflops = args.hbm_gbps, args.tflops
    if args.device_json:
        dev = json.loads(Path(args.device_json).read_text())
        meas_gbps = meas_gbps or dev.get("hbm_gbps")
        meas_tflops = meas_tflops or dev.get("matmul_tflops")

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

    def attempt(name, thunk):
        """Run one kernel timing; a per-kernel compile failure (e.g. a Mosaic
        'Not implemented' on an experimental variant) becomes an error row
        instead of killing the whole suite."""
        try:
            thunk()
        except Exception as e:
            row = {"kernel": name,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
            results.append(row)
            print(json.dumps(row), flush=True)

    # --- k1: cost volume -------------------------------------------------
    # Minimal traffic: read L/R/proj once, write (B,D,H,W,G+2P) fp32, plus
    # ONE consumer read of the volume — the scan harness must consume every
    # element (a full sum) or XLA dead-code-eliminates unread disparities of
    # the fallback build, and the real pipeline re-reads the volume in
    # corr_stem anyway.
    vol_bytes = B * D * H * W * (G + 2 * P) * 4
    feat_bytes = 2 * B * H * W * (C + P) * 4
    k1_flops = 2 * B * D * H * W * C  # gwc dot products dominate

    def k1_sol_at(gbps, tflops_fp32):
        s = (2 * vol_bytes + feat_bytes) / (gbps * 1e9)
        return max(s, k1_flops / (tflops_fp32 * 1e12))

    k1_sol = k1_sol_at(HBM_GBPS, FP32_TFLOPS)
    k1_sol_meas = (k1_sol_at(meas_gbps, (meas_tflops or BF16_TFLOPS) / 4)
                   if meas_gbps else None)

    def scan_cv(build_fn):
        # Amortize the ~24 ms tunnel dispatch floor over cv_scan builds in
        # ONE program. The left feature varies per step (step-scaled) so XLA
        # cannot CSE the builds; each step reduces its volume to a scalar so
        # only O(cv_scan) floats leave the loop. Inputs are jit arguments
        # (closed-over constants constant-fold at compile time).
        n = args.cv_scan

        def run(a, b_, c_, d_):
            def step(acc, i):
                vol = build_fn(a + 1e-6 * i, b_, c_, d_)
                return acc + jnp.sum(vol), None
            return jax.lax.scan(step, jnp.float32(0),
                                jnp.arange(n, dtype=jnp.float32))[0]
        return jax.jit(run), n

    if args.impl in ("pallas", "both"):
        f, n = scan_cv(lambda a, b_, c_, d_: build_cost_volume_pallas(
            a, b_, c_, d_, D, G, interpret=interp))
        t = timeit(lambda: f(left, right, lp, rp), args.reps) / n
        emit(results, "cost_volume_pallas", t, k1_sol, k1_sol_meas, n)
    if args.impl in ("xla", "both"):
        f, n = scan_cv(lambda a, b_, c_, d_: jnp.concatenate(
            [build_gwc_volume(a, b_, D, G),
             build_concat_volume(c_, d_, D)], axis=-1))
        t = timeit(lambda: f(left, right, lp, rp), args.reps) / n
        emit(results, "cost_volume_xla", t, k1_sol, k1_sol_meas, n)

    # --- k1 fused consumer boundary (the default production path, r5):
    # kernel writes bf16 (gwc, rps) parts in kernel layout, CorrStem's 1x1
    # projection contracts them to the 28-ch NDHWC output — the 32-ch volume
    # never exists. Contract traffic: parts written + parts read + F-ch out
    # written + one consumer read of the output (the scan's sum; corr_stem's
    # 3x3x3 conv reads it in the real pipeline).
    parts_bytes = B * D * H * W * (G + P) * 2            # bf16 parts
    fout_bytes = B * D * H * W * VC * 2                  # bf16 28-ch output
    fused_bytes = 2 * parts_bytes + 2 * fout_bytes + feat_bytes
    fused_flops = k1_flops + 2 * B * D * H * W * (G + 2 * P) * VC

    def k1f_sol_at(gbps, tflops):
        s = fused_bytes / (gbps * 1e9)
        return max(s, fused_flops / (tflops * 1e12))

    k1f_sol = k1f_sol_at(HBM_GBPS, BF16_TFLOPS)
    k1f_sol_meas = k1f_sol_at(meas_gbps, meas_tflops) if meas_gbps else None

    if args.impl in ("pallas", "both"):
        kproj = mk((G + 2 * P, VC))
        kg, kl, kr = kproj[:G], kproj[G:G + P], kproj[G + P:]

        def fused_build(a, b_, c_, d_):
            gwc, rps = build_cost_volume_pallas(
                a, b_, c_, d_, D, G, interpret=interp, return_parts=True,
                out_dtype=jnp.bfloat16)
            out = (jnp.einsum("bdhgw,gf->bdhwf", gwc.astype(jnp.bfloat16),
                              kg.astype(jnp.bfloat16))
                   + jnp.einsum("bdhpw,pf->bdhwf", rps.astype(jnp.bfloat16),
                                kr.astype(jnp.bfloat16)))
            lterm = jnp.einsum("bhwp,pf->bhwf", c_.astype(jnp.bfloat16),
                               kl.astype(jnp.bfloat16))
            return out + lterm[:, None]

        def run_fused(name, thunk):
            f, n = scan_cv(thunk)
            t = timeit(lambda: f(left, right, lp, rp), args.reps) / n
            emit(results, name, t, k1f_sol, k1f_sol_meas, n)

        attempt("cost_volume_fused_proj",
                lambda: run_fused("cost_volume_fused_proj", fused_build))

    # --- DMA-floor probes (round 5): identical grid + BlockSpec contracts,
    # trivial copy/broadcast bodies. Any kernel honoring the same in/out
    # layouts must pay at least this time — the probes measure the layout
    # contract itself (block DMA through VMEM at these shapes), so
    # kernel_time/floor_time close to 1.0 PROVES the residual vs the
    # streaming-bandwidth roofline is the contract, not the implementation.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from foundationstereo_tpu.ops.cost_volume import group_normalize

    def cv_floor_build(l, r_, lpj, rpj):
        bb, hh, ww, cc = l.shape
        pp = rpj.shape[-1]
        cgg = cc // G
        ln = group_normalize(l, G).reshape(bb * hh, ww, G, cgg).transpose(0, 2, 3, 1)
        rn = group_normalize(r_, G).reshape(bb * hh, ww, G, cgg).transpose(0, 2, 3, 1)
        rpk = rpj.reshape(bb * hh, ww, pp).astype(jnp.float32).transpose(0, 2, 1)

        def kern(ln_ref, rn_ref, rp_ref, gwc_ref, rps_ref):
            src = ln_ref[0, :, 0, :]                     # (G, W)
            gwc_ref[0] = jnp.broadcast_to(src[None], (D, G, ww))
            rps_ref[0] = jnp.broadcast_to(rp_ref[0][None], (D, pp, ww))

        rr = bb * hh
        gwc, rps = pl.pallas_call(
            kern, grid=(rr,),
            in_specs=[
                pl.BlockSpec((1, G, cgg, ww), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, cgg, ww), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pp, ww), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, D, G, ww), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, pp, ww), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((rr, D, G, ww), jnp.float32),
                       jax.ShapeDtypeStruct((rr, D, pp, ww), jnp.float32)),
            interpret=interp,
        )(ln, rn, rpk)
        # Same epilogue as build_cost_volume_pallas (the measured row
        # includes it): transpose + D-broadcast left term + 32-ch concat.
        gwc = gwc.reshape(bb, hh, D, G, ww).transpose(0, 2, 1, 4, 3)
        rps = rps.reshape(bb, hh, D, pp, ww).transpose(0, 2, 1, 4, 3)
        lp_b = jnp.broadcast_to(
            lpj.astype(jnp.float32)[:, None], (bb, D, hh, ww, pp))
        return jnp.concatenate([gwc, lp_b, rps], axis=-1)

    if args.impl in ("pallas", "both"):
        def run_cv_floor():
            f, n = scan_cv(cv_floor_build)
            t = timeit(lambda: f(left, right, lp, rp), args.reps) / n
            emit(results, "cost_volume_dma_floor", t, k1_sol, k1_sol_meas, n)
        attempt("cost_volume_dma_floor", run_cv_floor)

    def lookup_floor_level(vol, disp_rows, radius):
        rr, c_dim, d_dim, ww = vol.shape
        K_ = 2 * radius + 1

        def kern(disp_ref, vol_ref, out_ref):
            take = min(K_, d_dim)
            rows = vol_ref[0, :, :take, :]
            if take < K_:  # pyramid level shorter than the tap count
                rows = jnp.concatenate(
                    [rows, jnp.broadcast_to(rows[:, :1],
                                            (c_dim, K_ - take, ww))], axis=1)
            out_ref[0] = rows.astype(out_ref.dtype)

        dr = disp_rows.reshape(rr, 1, ww)
        return pl.pallas_call(
            kern, grid=(rr,),
            in_specs=[
                pl.BlockSpec((1, 1, ww), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_dim, d_dim, ww), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c_dim, K_, ww), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rr, c_dim, K_, ww), jnp.float32),
            interpret=interp,
        )(dr, vol)

    def lookup_floor(geo_kk, corr_kk, disp_, radius):
        # Mirrors disparity_lookup_pallas_pre's plumbing (same per-level
        # calls, same concat + transpose epilogue) with zero sampling math.
        b_, h_, w_ = disp_.shape
        disp_rows = disp_.reshape(b_ * h_, w_)
        K_ = 2 * radius + 1
        parts = []
        for geo, corr in zip(geo_kk, corr_kk):
            c_dim, d_dim = geo.shape[2], geo.shape[3]
            g_ = lookup_floor_level(
                geo.reshape(b_ * h_, c_dim, d_dim, w_), disp_rows, radius)
            parts.append(g_.reshape(b_ * h_, c_dim * K_, w_))
            c_ = lookup_floor_level(
                corr.reshape(b_ * h_, 1, corr.shape[3], w_), disp_rows, radius)
            parts.append(c_.reshape(b_ * h_, K_, w_))
        feat = jnp.concatenate(parts, axis=1)
        return feat.transpose(0, 2, 1).reshape(b_, h_, w_, -1)

    # --- k2: lookup (one GRU iteration x args.iters scan) ------------------
    # Minimal traffic per iteration: read the pyramids once.
    pyr_bytes = sum(int(np.prod(g.shape)) * 4 for g in gp) + \
        sum(int(np.prod(c.shape)) * 4 for c in cp)
    k2_sol = args.iters * pyr_bytes / (HBM_GBPS * 1e9)
    k2_meas = (args.iters * pyr_bytes / (meas_gbps * 1e9)
               if meas_gbps else None)
    half = lambda x: x / 2 if x is not None else None

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
        emit(results, f"lookup_pallas_x{args.iters}", t, k2_sol, k2_meas, args.iters)
        # bf16 layouts halve the per-iteration pyramid traffic.
        gk16, ck16 = to_kernel_layout(list(gp), list(cp), dtype=jnp.bfloat16)
        gk16, ck16 = tuple(gk16), tuple(ck16)
        t = timeit(lambda: f(disp, gk16, ck16), args.reps)
        emit(results, f"lookup_pallas_bf16_x{args.iters}", t, k2_sol / 2, half(k2_meas), args.iters)
        # Sublane-gather kernel: pre-blend + dynamic_gather per channel.
        # Measured r3: Mosaic rejects it at real D ("Not implemented:
        # Multiple source vregs along gather dimension" — dynamic_gather
        # along sublanes is single-vreg only, D+2r+1=113 needs 15). Kept as
        # an attempt() so the negative result is recorded, not fatal.
        fg = scan_lookup(lambda g, c, d, r: disparity_lookup_pallas_pre(
            g, c, d, r, interpret=interp, gather=True))
        # Bind each kernel name ONCE so the attempt() error row and the
        # emit() success row can never drift apart (ADVICE r3).
        name = f"lookup_pallas_gather_x{args.iters}"
        attempt(name, lambda name=name: emit(
            results, name,
            timeit(lambda: fg(disp, gk, ck), args.reps), k2_sol,
            k2_meas, args.iters))
        name = f"lookup_pallas_gather_bf16_x{args.iters}"
        attempt(name, lambda name=name: emit(
            results, name,
            timeit(lambda: fg(disp, gk16, ck16), args.reps), k2_sol / 2,
            half(k2_meas), args.iters))
        # DMA floor at the same specs (see floor-probe comment above).
        ffl = scan_lookup(lambda g, c, d, r: lookup_floor(g, c, d, r))
        name = f"lookup_dma_floor_x{args.iters}"
        attempt(name, lambda name=name: emit(
            results, name,
            timeit(lambda: ffl(disp, gk, ck), args.reps), k2_sol,
            k2_meas, args.iters))
        # Fused kernel needs bf16 layouts (fp32 overflows VMEM — see kernel doc).
        ff = scan_lookup(lambda g, c, d, r: disparity_lookup_pallas_fused(
            g, c, d, r, interpret=interp))
        name = f"lookup_pallas_fused_bf16_x{args.iters}"
        attempt(name, lambda name=name: emit(
            results, name,
            timeit(lambda: ff(disp, gk16, ck16), args.reps), k2_sol / 2,
            half(k2_meas), args.iters))
    if args.impl in ("xla", "both"):
        f = scan_lookup(disparity_lookup)
        t = timeit(lambda: f(disp, gp, cp), args.reps)
        emit(results, f"lookup_xla_x{args.iters}", t, k2_sol, k2_meas, args.iters)



if __name__ == "__main__":
    main()
