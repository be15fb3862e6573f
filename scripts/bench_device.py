#!/usr/bin/env python
"""Measure THIS chip's achievable ceilings: HBM bandwidth and MXU rate.

The public v5e spec (197 bf16 TFLOP/s, 819 GB/s) is not what the tunnelled
runtime delivers; SoL accounting (BASELINE.md north star) must be read
against measured ceilings. Prints a JSON dict:

  hbm_gbps       — elementwise-add streaming bandwidth (read+read+write),
                   best over sizes, dispatch overhead removed by size pairing
  matmul_tflops  — chained 4096^2 bf16 matmuls inside one lax.scan program
  dispatch_ms    — round-trip of a trivial fenced dispatch (tunnel overhead)

Usage: python scripts/bench_device.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fence(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:1]))


def best_time(f, *args, reps=5):
    f(*args)  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f(*args)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = {}

    # Dispatch overhead: trivial program, fenced.
    @jax.jit
    def tiny(x):
        return x + 1.0

    x0 = jnp.zeros((8, 128), jnp.float32)
    run_tiny = lambda: fence(tiny(x0))  # noqa: E731
    out["dispatch_ms"] = round(best_time(lambda: run_tiny()) * 1e3, 2)

    # HBM bandwidth: z = x + y streams 3 arrays. Two sizes to cancel the
    # fixed dispatch cost: bw = 3*(bytes_big - bytes_small) / (t_big - t_small).
    def stream(n_mb):
        n = n_mb * 1024 * 1024 // 2  # bf16 elements
        x = jnp.ones((n,), jnp.bfloat16)
        y = jnp.ones((n,), jnp.bfloat16)

        @jax.jit
        def add(a, b):
            return a + b

        t = best_time(lambda: fence(add(x, y)))
        return t, 3 * n * 2

    t_small, b_small = stream(128)
    t_big, b_big = stream(1024)
    out["hbm_gbps"] = round((b_big - b_small) / (t_big - t_small) / 1e9, 1)
    out["stream_1gb_ms"] = round(t_big * 1e3, 1)

    # MXU: K chained (4096,4096) bf16 matmuls in ONE program (amortizes the
    # tunnel round-trip across 2*K*4096^3 flops).
    K = 32
    a = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)),
                    jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(c, _):
            c = jnp.dot(c, a, preferred_element_type=jnp.bfloat16)
            return c * (1.0 / 64.0), None
        return jax.lax.scan(body, a, None, length=K)[0]

    t = best_time(lambda: fence(chain(a)), reps=3)
    out["matmul_tflops"] = round(2 * K * 4096**3 / t / 1e12, 1)

    # Small-N matmul rate (the 28-channel cost-filter regime: N pads to the
    # 128-lane MXU tile). M large, K=252, N=28 — mirrors a folded APC conv.
    M = 6_000_000 // 8 * 8
    xs = jnp.asarray(np.random.default_rng(1).standard_normal((M, 252)),
                     jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((252, 28)),
                    jnp.bfloat16)

    @jax.jit
    def narrow(xs, w):
        return jnp.dot(xs, w, preferred_element_type=jnp.bfloat16)

    t = best_time(lambda: fence(narrow(xs, w)), reps=3)
    out["narrow_matmul_tflops"] = round(2 * M * 252 * 28 / t / 1e12, 2)
    out["narrow_matmul_gbps"] = round((M * 252 + M * 28) * 2 / t / 1e9, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
