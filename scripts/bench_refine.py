#!/usr/bin/env python
"""TPU timing of the GRU refinement loop at flagship scale.

Times a lax.scan of the FULL refine step (pyramid lookup + selective
multi-GRU update block) for `--iters` iterations, in the same configurations
the model can run:

  gather  — sublane-gather Pallas lookup (pre-blend + dynamic_gather),
            parts layout;
  parts   — Pallas lookup returning kernel-layout parts consumed by the
            motion encoder's einsum contraction (default inference path);
  dense   — Pallas lookup with the concat+transpose epilogue (round-2 path);
  xla     — differentiable XLA tent-contraction lookup (training path).

Also times the update block alone (zero-cost fake lookup features) to split
lookup vs GRU cost. Pyramids are jit arguments (closed-over constants
constant-fold for minutes at compile time — round-2 finding).

Usage: python scripts/bench_refine.py [--iters 32] [--mode parts,dense,gru]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=736)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--max_disp", type=int, default=416)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="parts,dense,gru")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.models.update import BasicSelectiveMultiUpdateBlock
    from foundationstereo_tpu.ops.pallas_kernels import (
        disparity_lookup_pallas_pre,
        to_kernel_layout,
    )
    from foundationstereo_tpu.ops.sampler import disparity_lookup, pool_last_axis

    cfg = ModelConfig(max_disp=args.max_disp, vit_size="vitl",
                      mixed_precision=True)
    H4, W4, D = args.height // 4, args.width // 4, args.max_disp // 4
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"

    def log(msg):
        print(msg, flush=True)

    # Loop invariants at flagship shapes.
    geo = jax.random.normal(key, (1, H4, W4, 28, D), jnp.float32)
    corr = jax.random.normal(key, (1, H4, W4, W4), jnp.float32)
    disp0 = jnp.abs(jax.random.normal(key, (1, H4, W4))) * 20
    gp = tuple(pool_last_axis(geo, cfg.corr_levels - 1))
    cp = tuple(pool_last_axis(corr, cfg.corr_levels - 1))
    gk, ck = to_kernel_layout(list(gp), list(cp), dtype=jnp.bfloat16)
    gk, ck = tuple(gk), tuple(ck)

    hd = cfg.hidden_dims[0]
    net = tuple(jax.random.normal(jax.random.fold_in(key, i),
                                  (1, H4 // s, W4 // s, hd), dt)
                for i, s in enumerate((1, 2, 4)))
    inp = tuple(jax.random.normal(jax.random.fold_in(key, 10 + i),
                                  (1, H4 // s, W4 // s, hd), dt)
                for i, s in enumerate((1, 2, 4)))
    att = tuple(jax.random.uniform(jax.random.fold_in(key, 20 + i),
                                   (1, H4 // s, W4 // s, 1), dt)
                for i, s in enumerate((1, 2, 4)))

    update = BasicSelectiveMultiUpdateBlock(hd, cfg.n_gru_layers, dtype=dt)
    K = 2 * cfg.corr_radius + 1
    f_total = cfg.corr_levels * K * (28 + 1)

    def init_variables(corr_example):
        return jax.jit(lambda k: update.init(
            k, list(net), list(inp), corr_example,
            disp0[..., None].astype(dt), list(att)))(key)

    def make_lookup(mode):
        if mode == "parts":
            return lambda d, g, c: disparity_lookup_pallas_pre(
                list(g), list(c), d, cfg.corr_radius, out_dtype=dt,
                return_parts=True)
        if mode == "gather":  # sublane-gather kernel, parts layout
            return lambda d, g, c: disparity_lookup_pallas_pre(
                list(g), list(c), d, cfg.corr_radius, out_dtype=dt,
                return_parts=True, gather=True)
        if mode == "dense":
            return lambda d, g, c: disparity_lookup_pallas_pre(
                list(g), list(c), d, cfg.corr_radius, out_dtype=dt).astype(dt)
        if mode == "xla":
            return lambda d, g, c: disparity_lookup(
                list(g), list(c), d, cfg.corr_radius).astype(dt)
        if mode == "gru":  # fake zero-cost lookup: update block alone
            return lambda d, g, c: list(g)
        raise ValueError(mode)

    # Pre-made zero "lookup parts" for gru mode (passed as jit args, NOT
    # closed over — constants constant-fold at compile time).
    fake_parts = tuple(
        jnp.zeros((H4, c * K, W4), dt)
        for _ in range(cfg.corr_levels) for c in (28, 1))

    def timed_scan(mode):
        lookup = make_lookup(mode)
        g_in, c_in = (gp, cp) if mode == "xla" else (gk, ck)
        if mode == "gru":
            g_in, c_in = fake_parts, ()
        variables = init_variables(lookup(disp0, g_in, c_in))

        def run(v, d, g, c):
            def step(carry, _):
                nets, d = carry
                feat = lookup(d, g, c)
                nets, mask, delta = update.apply(
                    v, list(nets), list(inp), feat,
                    d[..., None].astype(dt), list(att))
                return (tuple(nets), d + delta[..., 0].astype(jnp.float32)), None
            return jax.lax.scan(step, (net, d), None, length=args.iters)[0][1]

        f = jax.jit(run)
        t0 = time.time()
        out = f(variables, disp0, g_in, c_in)
        s = float(jnp.sum(out))
        log(f"[{mode}] compile+run0 {time.time()-t0:.1f}s (sum={s:.3e})")
        best = None
        for i in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(f(variables, disp0, g_in, c_in)))
            dt_ = time.perf_counter() - t0
            best = dt_ if best is None else min(best, dt_)
            log(f"[{mode}] run{i+1}: {dt_:.3f}s ({dt_/args.iters*1e3:.2f} ms/iter)")
        log(f"[{mode}] best {best:.3f}s = {best/args.iters*1e3:.2f} ms/iter")

    for mode in args.modes.split(","):
        if mode in ("parts", "dense") and not on_tpu:
            log(f"[{mode}] skipped (needs TPU)")
            continue
        timed_scan(mode)


if __name__ == "__main__":
    main()
