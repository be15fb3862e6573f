#!/usr/bin/env python
"""Split the frozen-backbone stage time: full ViT (dense vs flash attention),
DPT head, bicubic pre-resize, and a raw-matmul MXU efficiency probe.

Every dispatch fenced by scalar readback (tunnelled-runtime hazard).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=784)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--vit_size", default="vitl")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--parts", default="matmul,vit_flash,vit_dense,dpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.config import VIT_CONFIGS
    from foundationstereo_tpu.models.dinov2 import make_vit
    from foundationstereo_tpu.models.dpt import DPTHead

    key = jax.random.PRNGKey(0)
    H, W = args.height, args.width
    hp, wp = H // 14, W // 14
    cfg = VIT_CONFIGS[args.vit_size]
    C = cfg["embed_dim"]
    parts = args.parts.split(",")
    print(f"devices: {jax.devices()}  tokens={hp * wp}", flush=True)

    def bench(name, fn, *xs, flops=None):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*xs)
        s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        print(f"[{name}] compile+run0 {time.time() - t0:.1f}s (sum={s:.3e})", flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jfn(*xs)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        best = min(times)
        eff = f", {flops / best / 1e12:.1f} TFLOP/s" if flops else ""
        print(f"[{name}] best {best * 1e3:.1f} ms{eff}", flush=True)
        return best

    if "matmul" in parts:
        # MXU probe at ViT-like shapes: (B*N, C) x (C, 4C).
        a = jax.random.normal(key, (2 * hp * wp, C), jnp.bfloat16)
        b = jax.random.normal(key, (C, 4 * C), jnp.bfloat16)

        def mm(a, b):
            x = a
            for _ in range(8):
                x = (x @ b)[:, :C]
            return x

        fl = 8 * 2 * a.shape[0] * C * 4 * C
        bench("matmul x8", mm, a, b, flops=fl)

    x = jax.random.normal(key, (2, H, W, 3), jnp.bfloat16)
    for impl in ("flash", "dense"):
        if f"vit_{impl}" not in parts:
            continue
        vit = make_vit(args.vit_size, dtype=jnp.bfloat16, attention=impl)
        v = None

        def init_once():
            nonlocal v
            if v is None:
                t0 = time.time()
                v = jax.jit(lambda k: vit.init(k, x, cfg["intermediate_layers"]))(key)
                float(jnp.sum(jax.tree.leaves(v["params"])[0]))
                print(f"[vit init] {time.time() - t0:.1f}s", flush=True)
            return v

        vv = init_once()
        # Sum ALL intermediate taps inside the jit: returning only the first
        # tap lets XLA dead-code-eliminate every block after it (vitl: blocks
        # 5-23!). The round-2 "71 ms full ViT-L" number had this bug — it
        # timed 5 of 24 blocks (docs/NOTES_ROUND4.md).
        bench(f"vit_{impl} {cfg['depth']}blk",
              lambda v_, x_: sum(jnp.sum(t) for (t, _c) in
                                 vit.apply(v_, x_, cfg["intermediate_layers"])),
              vv, x)

    if "dpt" in parts:
        head = DPTHead(cfg["dpt_features"], cfg["dpt_out_channels"], dtype=jnp.bfloat16)
        taps = [jax.random.normal(key, (2, hp * wp, C), jnp.bfloat16) for _ in range(4)]
        vh = jax.jit(lambda k: head.init(k, taps, hp, wp))(key)
        float(jnp.sum(jax.tree.leaves(vh["params"])[0]))
        bench("dpt head", lambda v_, t_: head.apply(v_, t_, hp, wp)[0], vh, taps)


if __name__ == "__main__":
    main()
