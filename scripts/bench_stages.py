#!/usr/bin/env python
"""Stage-by-stage TPU timing of the inference pipeline.

Each stage is its own jitted program, timed with host-readback fences and
printed immediately — if a stage wedges the device, the log shows exactly
which. Data is generated on-device (no large tunnel transfers).

Usage: python scripts/bench_stages.py [--height 736 --width 1280]
       [--max_disp 416] [--vit_size vitl] [--iters 8] [--stages all|A,B,...]
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
    ap.add_argument("--vit_size", default="vitl")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # No persistent compile cache: cached executables wedge this runtime on
    # re-execution (see bench.py note).

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.models.cost_filter import Hourglass
    from foundationstereo_tpu.models.dpt import DepthAnythingFeature
    from foundationstereo_tpu.models.extractor import Feature, feature_dims
    from foundationstereo_tpu.ops.cost_volume import (
        build_concat_volume,
        build_gwc_volume,
    )
    from foundationstereo_tpu.ops.pallas_kernels import (
        build_cost_volume_pallas,
        disparity_lookup_pallas,
    )
    from foundationstereo_tpu.ops.sampler import disparity_lookup, pool_last_axis
    from foundationstereo_tpu.utils.misc import get_resize_keep_aspect_ratio

    cfg = ModelConfig(max_disp=args.max_disp, vit_size=args.vit_size)
    H, W = args.height, args.width
    H4, W4 = H // 4, W // 4
    D = args.max_disp // 4
    C0 = feature_dims(cfg)[0]
    dt = jnp.bfloat16
    on_tpu = jax.default_backend() == "tpu"
    stages = args.stages.split(",") if args.stages != "all" else list("ABCDEF")

    def log(msg):
        print(msg, flush=True)

    def timed(name, build_fn, run_fn):
        t0 = time.time()
        state = build_fn()
        # Fence any device arrays produced by build (init etc.) before the
        # first run dispatch: overlapping executions wedge this runtime.
        for leaf in jax.tree.leaves(state):
            if isinstance(leaf, jax.Array):
                float(jnp.sum(jnp.ravel(leaf)[0]))
                break
        log(f"[{name}] built in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = run_fn(state)
        s = float(jnp.sum(out))
        log(f"[{name}] compile+run0 {time.time()-t0:.1f}s (sum={s:.3e})")
        for i in range(args.reps):
            t0 = time.perf_counter()
            out = run_fn(state)
            float(jnp.sum(out))
            log(f"[{name}] run{i+1}: {time.perf_counter()-t0:.3f}s")

    key = jax.random.PRNGKey(0)

    if "A" in stages:  # frozen ViT + DPT (the FLOPs heavyweight)
        hr, wr = get_resize_keep_aspect_ratio(H, W, 112, 1344, 1344)

        def build():
            m = DepthAnythingFeature(args.vit_size, dtype=dt)
            x = jax.random.normal(key, (2, hr, wr, 3), dt)
            v = jax.jit(m.init)(key, x)
            f = jax.jit(lambda v, x: m.apply(v, x)["out"])
            return (f, v, x)

        timed(f"A vit {hr}x{wr}", build, lambda s: s[0](s[1], s[2]))

    if "B" in stages:  # full unary extractor (EdgeNeXt + fusion + frozen prior)
        def build():
            m = Feature(cfg, dtype=dt)
            x = jax.random.normal(key, (2, H, W, 3), dt)
            v = jax.jit(m.init)(key, x)
            f = jax.jit(lambda v, x: m.apply(v, x)[0][0])
            return (f, v, x)

        timed("B extractor", build, lambda s: s[0](s[1], s[2]))

    if "C" in stages:  # cost volume build
        l = jax.random.normal(key, (1, H4, W4, C0), dt)
        r = jax.random.normal(jax.random.fold_in(key, 1), (1, H4, W4, C0), dt)
        lp, rp = l[..., :12], r[..., :12]
        if on_tpu:
            f = jax.jit(lambda a, b, c, d: build_cost_volume_pallas(a, b, c, d, D, 8))
            timed("C costvol_pallas", lambda: (f,), lambda s: s[0](l, r, lp, rp))
        f2 = jax.jit(lambda a, b, c, d: jnp.concatenate(
            [build_gwc_volume(a, b, D, 8).astype(dt),
             build_concat_volume(c, d, D)], axis=-1))
        timed("C costvol_xla", lambda: (f2,), lambda s: s[0](l, r, lp, rp))

    if "D" in stages:  # hourglass + DT
        def build():
            m = Hourglass(28, args.max_disp, dtype=dt)
            x = jax.random.normal(key, (1, D, H4, W4, 28), dt)
            feats = [jax.random.normal(key, (1, H // s, W // s, ch), dt)
                     for s, ch in zip((4, 8, 16, 32), feature_dims(cfg))]
            v = jax.jit(m.init)(key, x, feats)
            f = jax.jit(lambda v, x: m.apply(v, x, feats))
            return (f, v, x)

        timed("D hourglass", build, lambda s: s[0](s[1], s[2]))

    if "E" in stages:  # lookup loop (pallas and xla)
        from foundationstereo_tpu.ops.pallas_kernels import (
            disparity_lookup_pallas_pre,
            to_kernel_layout,
        )

        geo = jax.random.normal(key, (1, H4, W4, 28, D), jnp.float32)
        corr = jax.random.normal(key, (1, H4, W4, W4), jnp.float32)
        disp0 = jnp.abs(jax.random.normal(key, (1, H4, W4))) * 20
        gp = tuple(pool_last_axis(geo, 3))
        cp = tuple(pool_last_axis(corr, 3))
        gk, ck = to_kernel_layout(list(gp), list(cp))
        gk, ck = tuple(gk), tuple(ck)

        def scan_of(lookup):
            # Pyramids must be jit ARGUMENTS: closed-over pyramids get
            # constant-folded by XLA and the multi-hundred-MB folds take
            # tens of minutes at compile time (round-2 finding).
            def run(d, g, c):
                def step(d, _):
                    feat = lookup(list(g), list(c), d, 4)
                    return d + 1e-4 * feat[..., 0], None
                return jax.lax.scan(step, d, None, length=args.iters)[0]
            return jax.jit(run)

        if on_tpu:
            timed(f"E lookup_pallas x{args.iters}",
                  lambda: (scan_of(disparity_lookup_pallas_pre),),
                  lambda s: s[0](disp0, gk, ck))
        timed(f"E lookup_xla x{args.iters}",
              lambda: (scan_of(disparity_lookup),), lambda s: s[0](disp0, gp, cp))

    if "G" in stages:  # corr_stem + classifier (full-volume narrow convs)
        from foundationstereo_tpu.models.cost_filter import Classifier, CorrStem

        def build():
            ms = CorrStem(28, dtype=dt)
            mc = Classifier(28, dtype=dt)
            x = jax.random.normal(key, (1, D, H4, W4, 32), dt)
            vs = jax.jit(lambda k: ms.init(k, x))(key)
            xf = jax.random.normal(key, (1, D, H4, W4, 28), dt)
            vc = jax.jit(lambda k: mc.init(k, xf))(key)
            f1 = jax.jit(lambda v, x: ms.apply(v, x))
            f2 = jax.jit(lambda v, x: mc.apply(v, x))
            return (f1, vs, x, f2, vc, xf)

        s = build()
        timed("G corr_stem", lambda: (s[0],), lambda _: s[0](s[1], s[2]))
        timed("G classifier", lambda: (s[3],), lambda _: s[3](s[4], s[5]))

    if "F" in stages:  # full model
        from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

        def build():
            m = FoundationStereo(cfg)
            l = jax.random.uniform(key, (1, H, W, 3), jnp.float32, 0, 255)
            r = jax.random.uniform(jax.random.fold_in(key, 1),
                                   (1, H, W, 3), jnp.float32, 0, 255)
            v = jax.jit(lambda k, a, b: m.init(k, a, b, iters=1, test_mode=True))(key, l, r)
            f = jax.jit(lambda v, a, b: m.apply(v, a, b, iters=args.iters,
                                                test_mode=True))
            return (f, v, l, r)

        timed(f"F full x{args.iters}", build, lambda s: s[0](s[1], s[2], s[3]))


if __name__ == "__main__":
    main()
