#!/usr/bin/env python
"""ViT attention microbenchmark: dense vs chunked vs Pallas flash on TPU.

Times one ViT-L attention core (B=2 views, N=5377 tokens incl. cls, 16 heads,
head_dim 64 — the flagship 784x1344 resize) and checks flash/chunked numerics
against the dense softmax. Every dispatch is fenced by a scalar readback
(tunnelled-runtime hazard, docs/NOTES_ROUND1.md).

Usage: python scripts/bench_vit_attention.py [--n 5377] [--heads 16]
       [--impls dense,chunked,flash] [--reps 3] [--layers 24]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5377)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--layers", type=int, default=24,
                    help="attention calls per timed program (amortizes fencing)")
    ap.add_argument("--impls", default="dense,chunked,flash")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationstereo_tpu.models.dinov2 import (
        chunked_attention,
        flash_vit_attention,
    )

    B, N, H, D = args.batch, args.n, args.heads, args.head_dim
    scale = 1.0 / D ** 0.5
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N, H, D), jnp.bfloat16)

    def dense(q, k, v):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", w, v)

    impls = {
        "dense": dense,
        "chunked": lambda q, k, v: chunked_attention(q, k, v, scale).astype(v.dtype),
        "flash": lambda q, k, v: flash_vit_attention(q, k, v, scale).astype(v.dtype),
    }

    print(f"devices: {jax.devices()}", flush=True)
    ref = None
    results = {}
    for name in args.impls.split(","):
        fn = impls[name]

        def many(q, k, v, fn=fn):
            # Chain `layers` attention calls so per-run fencing overhead
            # (tunnel round-trip) is amortized like the real 24-block ViT.
            x = q
            for _ in range(args.layers):
                x = fn(x, k, v).astype(q.dtype)
            return x

        jfn = jax.jit(many)
        try:
            t0 = time.time()
            out = jfn(q, k, v)
            s = float(jnp.sum(out.astype(jnp.float32)))
            print(f"[{name}] compile+run0 {time.time()-t0:.1f}s (sum={s:.4e})", flush=True)
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = jfn(q, k, v)
                float(jnp.sum(out.astype(jnp.float32)))
                times.append(time.perf_counter() - t0)
            best = min(times)
            per_call = best / args.layers * 1e3
            print(f"[{name}] best {best:.3f}s for {args.layers} calls "
                  f"-> {per_call:.2f} ms/attention", flush=True)
            results[name] = per_call

            one = jax.jit(fn)(q, k, v)
            float(jnp.sum(one.astype(jnp.float32)))
            if name == "dense":
                ref = one
            elif ref is not None:
                err = float(jnp.max(jnp.abs(one.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                print(f"[{name}] max |diff| vs dense: {err:.4e}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)

    print({k: round(v, 3) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
