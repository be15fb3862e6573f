"""Benchmark: stereo pairs/sec/chip at 736x1280 (BASELINE.json north star).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N}

Baseline: the reference reports 0.7 s/pair at 375x1242 on an A100 with 32 GRU
iterations and max_disp=416 ("FoundationStereo: Zero-Shot Stereo Matching.md"
line 293). Scaled to 736x1280 (2.02x the pixels) that is ~0.707 pairs/s —
the vs_baseline denominator.

Extra diagnostics go to stderr; stdout stays a single JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 0.707  # A100, scaled to 736x1280 (see module docstring)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wait_device_alive(max_minutes: int = 25) -> bool:
    """Probe the backend from subprocesses until a trivial op completes.

    The tunnelled TPU runtime can stay wedged for many minutes after an
    interrupted execution; an in-process probe would block forever, so gate
    on short-lived subprocess probes before committing to the real run.
    """
    import subprocess
    import time as _t

    deadline = _t.time() + max_minutes * 60
    attempt = 0
    while _t.time() < deadline:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print('ALIVE', float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))"],
                capture_output=True, text=True, timeout=90)
            if "ALIVE" in r.stdout:
                log(f"device alive (probe {attempt})")
                return True
        except subprocess.TimeoutExpired:
            pass
        log(f"device probe {attempt} failed; retrying")
        _t.sleep(45)
    log("device never became reachable")
    return False


def run_bench(height: int, width: int, vit_size: str, max_disp: int, iters: int,
              warmup: int, reps: int, batch: int = 1) -> float:
    import jax
    import jax.numpy as jnp

    # NOTE: deliberately NO persistent compilation cache here — executables
    # deserialized from the cache wedge this TPU runtime on re-execution
    # (first run succeeds, every later run hangs). Fresh compiles behave.

    from foundationstereo_tpu.config import ModelConfig
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

    cfg = ModelConfig(max_disp=max_disp, vit_size=vit_size, mixed_precision=True)
    model = FoundationStereo(cfg)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (batch, height, width, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (batch, height, width, 3)).astype(np.float32))

    log(f"devices: {jax.devices()}")
    # CRITICAL: every dispatch below is fenced by a scalar readback before
    # the next one. Under remote-tunnelled runtimes block_until_ready returns
    # before execution finishes, and overlapping executions of a large
    # program wedge the device.
    t0 = time.time()
    # Images are jit ARGUMENTS, not closures: closed-over arrays constant-fold
    # into the executable at compile time (ADVICE r3; the r03 official run
    # spent 679 s in this init with the closure form).
    variables = jax.jit(
        lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True)
    )(jax.random.PRNGKey(0), left, right)
    float(jnp.sum(jax.tree.leaves(variables["params"])[0]))
    log(f"init: {time.time() - t0:.1f}s, params="
        f"{sum(np.prod(p.shape) for p in jax.tree.leaves(variables['params'])) / 1e6:.1f}M")

    fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, iters=iters, test_mode=True))

    def run_once():
        out = fwd(variables, left, right)
        return float(jnp.sum(out))

    t0 = time.time()
    run_once()
    log(f"compile+first run: {time.time() - t0:.1f}s")

    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"times: {[f'{t:.3f}' for t in times]} -> best {best:.3f}s"
        f" ({batch} pair(s)/dispatch)")
    return batch / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=736)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--vit_size", default="vitl")
    ap.add_argument("--max_disp", type=int, default=416)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1,
                    help="pairs per dispatch; throughput = batch/latency")
    args = ap.parse_args()

    wait_device_alive()
    attempts = [(args.vit_size, args.max_disp), (args.vit_size, 192), ("vits", 192)]
    value = 0.0
    used = None
    for vit, md in attempts:
        try:
            value = run_bench(args.height, args.width, vit, md, args.iters,
                              args.warmup, args.reps, args.batch)
            used = (vit, md)
            break
        except Exception as e:  # noqa: BLE001 — fall back on OOM
            log(f"bench config (vit={vit}, max_disp={md}) failed: {type(e).__name__}: {e}")
    if used != (args.vit_size, args.max_disp):
        log(f"NOTE: fell back to config {used}")
    print(json.dumps({
        "metric": f"stereo pairs/sec/chip @ {args.height}x{args.width}, "
                  f"vit={used[0] if used else args.vit_size}, "
                  f"max_disp={used[1] if used else args.max_disp}, iters={args.iters}",
        "value": round(value, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / BASELINE_PAIRS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
