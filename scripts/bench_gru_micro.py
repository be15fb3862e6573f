#!/usr/bin/env python
"""Micro-bench the refine loop's building blocks against the ViT's measured
matmul rate (~171 TF/s effective on this chip, bench_logs/vit_full_r2.log —
well ABOVE the 94 TF/s "sustained matmul" probe of bench_device.py, so the
round-3 "GRU at ceiling" conclusion needs re-checking per conv shape).

Times (scan-amortized, fenced):
  conv512   — 3x3 512->512 at (1,184,320) bf16 (gru04 conv1 shape)
  conv384   — 3x3 384->384 (gru04 conv0 shape)
  gruchain  — the exact gru04 conv sequence (conv0, conv1, zr, q3, q1)
  dpt       — DPTHead at flagship ViT shape, batch 2
  resize    — the DPT fusion-block resize ladder alone

Usage: python scripts/bench_gru_micro.py [--parts conv512,gruchain,dpt]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="conv512,conv384,gruchain,dpt,resize")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=8,
                    help="ops per program (amortizes the ~22 ms dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    parts = args.parts.split(",")
    H4, W4 = 184, 320
    print(f"devices: {jax.devices()}", flush=True)

    def bench(name, fn, xs, flops=None):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*xs)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        print(f"[{name}] compile+run0 {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jfn(*xs)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        best = min(times)
        per = best / args.chain
        eff = f", {flops / per / 1e12:.1f} TF/s" if flops else ""
        print(f"[{name}] best {best * 1e3:.1f} ms ({per * 1e3:.2f} ms/op{eff})",
              flush=True)
        return per

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if "conv512" in parts:
        x = jax.random.normal(key, (1, H4, W4, 512), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 512, 512), jnp.bfloat16) * 0.02

        def chain(x, k):
            for _ in range(args.chain):
                x = conv(x, k)
            return x

        fl = 2 * H4 * W4 * 512 * 512 * 9
        bench("conv512 3x3", chain, (x, k), flops=fl)

    if "conv384" in parts:
        x = jax.random.normal(key, (1, H4, W4, 384), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 384, 384), jnp.bfloat16) * 0.02

        def chain(x, k):
            for _ in range(args.chain):
                x = conv(x, k)
            return x

        fl = 2 * H4 * W4 * 384 * 384 * 9
        bench("conv384 3x3", chain, (x, k), flops=fl)

    if "gruchain" in parts:
        # gru04's conv sequence with realistic deps: conv0 384->384, conv1
        # (384+128)->512, zr 512->256 (fused), q3 512->128, q1 512->128,
        # sigmoids/tanh/blend — one "iteration" of the dominant level.
        import numpy as np
        rng = np.random.default_rng(0)
        dt = jnp.bfloat16
        xs0 = jnp.asarray(rng.standard_normal((1, H4, W4, 384)), dt)
        h0 = jnp.asarray(rng.standard_normal((1, H4, W4, 128)), dt)
        ks = {
            "k0": (3, 3, 384, 384), "k1": (3, 3, 512, 512),
            "kzr3": (3, 3, 512, 256), "kq3": (3, 3, 512, 128),
            "kzr1": (1, 1, 512, 256), "kq1": (1, 1, 512, 128),
        }
        kv = {n: jnp.asarray(rng.standard_normal(s) * 0.02, dt)
              for n, s in ks.items()}

        def one_iter(h, xs, kv):
            import flax.linen as nn
            x = nn.relu(conv(xs, kv["k0"]))
            hx = jnp.concatenate([x, h], axis=-1)
            hx = nn.relu(conv(hx, kv["k1"]))
            outs = []
            for kzr, kq, p in ((kv["kzr1"], kv["kq1"], 0),
                               (kv["kzr3"], kv["kq3"], 1)):
                zr = jax.lax.conv_general_dilated(
                    hx, kzr, window_strides=(1, 1), padding=[(p, p)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                z, r = nn.sigmoid(zr[..., :128]), nn.sigmoid(zr[..., 128:])
                q = jnp.tanh(jax.lax.conv_general_dilated(
                    jnp.concatenate([r * h, x], axis=-1), kq,
                    window_strides=(1, 1), padding=[(p, p)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
                outs.append((1 - z) * h + z * q)
            return 0.5 * outs[0] + 0.5 * outs[1]

        def chain(h, xs, kv):
            for _ in range(args.chain):
                h = one_iter(h, xs, kv)
            return h

        fl = 2 * H4 * W4 * 9 * (384 * 384 + 512 * 512 + 512 * 256 + 512 * 128) \
            + 2 * H4 * W4 * (512 * 256 + 512 * 128)
        bench("gru04 chain", chain, (h0, xs0, kv), flops=fl)

    if "gruchain_pallas" in parts:
        # Same chain with the 3x3 convs routed through the Pallas kernel.
        from foundationstereo_tpu.models.layers import pallas_conv3x3_scope
        from foundationstereo_tpu.ops.conv3x3 import conv3x3_pallas
        import numpy as np
        import flax.linen as nn
        rng = np.random.default_rng(0)
        dt = jnp.bfloat16
        xs0 = jnp.asarray(rng.standard_normal((1, H4, W4, 384)), dt)
        h0 = jnp.asarray(rng.standard_normal((1, H4, W4, 128)), dt)
        ks = {
            "k0": (3, 3, 384, 384), "k1": (3, 3, 512, 512),
            "kzr3": (3, 3, 512, 256), "kq3": (3, 3, 512, 128),
            "kzr1": (1, 1, 512, 256), "kq1": (1, 1, 512, 128),
        }
        kv = {n: jnp.asarray(rng.standard_normal(s) * 0.02, dt)
              for n, s in ks.items()}

        def pconv(x, k):
            return conv3x3_pallas(x, k)

        def one_iter(h, xs, kv):
            x = nn.relu(pconv(xs, kv["k0"]))
            hx = jnp.concatenate([x, h], axis=-1)
            hx = nn.relu(pconv(hx, kv["k1"]))
            outs = []
            for kzr, kq, p in ((kv["kzr1"], kv["kq1"], 0),
                               (kv["kzr3"], kv["kq3"], 1)):
                if p:
                    zr = pconv(hx, kzr)
                else:
                    zr = jax.lax.conv_general_dilated(
                        hx, kzr, window_strides=(1, 1), padding=[(0, 0)] * 2,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                z, r = nn.sigmoid(zr[..., :128]), nn.sigmoid(zr[..., 128:])
                qin = jnp.concatenate([r * h, x], axis=-1)
                if p:
                    q = jnp.tanh(pconv(qin, kq))
                else:
                    q = jnp.tanh(jax.lax.conv_general_dilated(
                        qin, kq, window_strides=(1, 1), padding=[(0, 0)] * 2,
                        dimension_numbers=("NHWC", "HWIO", "NHWC")))
                outs.append((1 - z) * h + z * q)
            return 0.5 * outs[0] + 0.5 * outs[1]

        def chain(h, xs, kv):
            for _ in range(args.chain):
                h = one_iter(h, xs, kv)
            return h

        fl = 2 * H4 * W4 * 9 * (384 * 384 + 512 * 512 + 512 * 256 + 512 * 128) \
            + 2 * H4 * W4 * (512 * 256 + 512 * 128)
        bench("gru04 chain pallas", chain, (h0, xs0, kv), flops=fl)

    if "pallas_conv" in parts:
        from foundationstereo_tpu.ops.conv3x3 import conv3x3_pallas

        for c in (512, 384, 256, 128):
            x = jax.random.normal(key, (1, H4, W4, c), jnp.bfloat16)
            k = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02

            def chain(x, k):
                for _ in range(args.chain):
                    x = conv3x3_pallas(x, k)
                return x

            fl = 2 * H4 * W4 * c * c * 9
            bench(f"pallas_conv {c}x{c}", chain, (x, k), flops=fl)

    if "dpt" in parts:
        from foundationstereo_tpu.config import VIT_CONFIGS
        from foundationstereo_tpu.models.dpt import DPTHead

        cfg = VIT_CONFIGS["vitl"]
        hp, wp = 56, 96
        head = DPTHead(cfg["dpt_features"], cfg["dpt_out_channels"],
                       out_hw=(184, 320), dtype=jnp.bfloat16)
        taps = [jax.random.normal(key, (2, hp * wp, cfg["embed_dim"]),
                                  jnp.bfloat16) for _ in range(4)]
        v = jax.jit(lambda k, t: head.init(k, t, hp, wp))(key, taps)
        float(jnp.sum(jax.tree.leaves(v["params"])[0]))
        old_chain = args.chain
        args.chain = 1
        bench("dpt head out@1/4", lambda v_, t_: head.apply(v_, t_, hp, wp)[0],
              (v, taps), flops=2 * 2.0e12 / 2)  # ~2 TF batch-2 (conv FLOPs)
        args.chain = old_chain

    if "resize" in parts:
        from foundationstereo_tpu.ops.resize import resize2d

        # The DPT fusion ladder's upsamples at batch 2, 256 ch.
        sizes = [(28, 48), (56, 96), (112, 192), (224, 384)]
        xs = [jax.random.normal(key, (2, h, w, 256), jnp.bfloat16)
              for (h, w) in sizes]

        def ladder(*xs):
            y = []
            for x in xs:
                h, w = x.shape[1] * 2, x.shape[2] * 2
                y.append(resize2d(x, (h, w), "bilinear", align_corners=True))
            return y

        old_chain = args.chain
        args.chain = 1
        bench("resize ladder x4", ladder, xs)
        args.chain = old_chain


if __name__ == "__main__":
    main()
