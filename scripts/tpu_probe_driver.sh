#!/bin/bash
# Sequential TPU probe driver: runs each probe in its own subprocess with a
# timeout, waits for device recovery between steps, logs everything.
LOG=${1:-/tmp/tpu_probe.log}
cd /root/repo
echo "=== driver start $(date)" >> "$LOG"

alive() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print('ALIVE', float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))" 2>/dev/null | grep -q ALIVE
}

wait_alive() {
  for i in $(seq 1 30); do
    if alive; then echo "alive after $i probes $(date +%T)" >> "$LOG"; return 0; fi
    sleep 60
  done
  echo "never recovered" >> "$LOG"; return 1
}

run_step() {
  local name="$1"; local tmo="$2"; shift 2
  echo "--- step $name ($(date +%T))" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- step $name exit=$rc ($(date +%T))" >> "$LOG"
  if [ $rc -ne 0 ]; then wait_alive; fi
}

wait_alive || exit 1

run_step pallas_tiny_lookup 240 python -c "
import jax, jax.numpy as jnp, time
from foundationstereo_tpu.ops.pallas_kernels import lookup_level_pallas
key = jax.random.PRNGKey(0)
vol = jax.random.normal(key, (8, 64, 8, 32), jnp.float32)
disp = jnp.abs(jax.random.normal(key, (8, 64))) * 10
f = jax.jit(lambda v, d: lookup_level_pallas(v, d, 4, 1.0))
t=time.time(); print('lookup tiny:', float(f(vol,disp).sum()), round(time.time()-t,1), flush=True)
t=time.time(); print('again:', float(f(vol,disp).sum()), round(time.time()-t,2), flush=True)
"

run_step pallas_tiny_cv 240 python -c "
import jax, jax.numpy as jnp, time
from foundationstereo_tpu.ops.pallas_kernels import build_cost_volume_pallas
key = jax.random.PRNGKey(0)
l = jax.random.normal(key, (1, 8, 64, 32), jnp.float32)
r = jax.random.normal(key, (1, 8, 64, 32), jnp.float32)
g = jax.jit(lambda a,b: build_cost_volume_pallas(a, b, a[...,:12], b[...,:12], 16, 4))
t=time.time(); print('cv tiny:', float(g(l,r).sum()), round(time.time()-t,1), flush=True)
t=time.time(); print('again:', float(g(l,r).sum()), round(time.time()-t,2), flush=True)
"

run_step kernels_bench_pallas 420 python scripts/benchmark_kernels.py --reps 2 --impl pallas
run_step kernels_bench_xla 560 python scripts/benchmark_kernels.py --reps 2 --impl xla
run_step stageC 420 python scripts/bench_stages.py --stages C --iters 4
run_step stageE 480 python scripts/bench_stages.py --stages E --iters 4
run_step stageD 480 python scripts/bench_stages.py --stages D
run_step stageA 540 python scripts/bench_stages.py --stages A
run_step stageB 540 python scripts/bench_stages.py --stages B
run_step stageF 560 python scripts/bench_stages.py --stages F --iters 32
run_step fullbench 590 python bench.py --reps 3

echo "=== driver done $(date)" >> "$LOG"
