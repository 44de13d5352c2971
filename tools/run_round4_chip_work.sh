#!/bin/bash
# Round-4 chip-work orchestrator: wait for the TPU tunnel to answer, then
# run the measurement + training sequence.  Ordered so the long poles
# (training bundle) start as early as possible if the tunnel recovers
# late; the trace attribution runs last (informative, not gating).
#   1. bench_primary       — 1024x512 f/s with two_stage prep + unpack_out
#   2. sweep_dcn           — hat=int32 vs hat=batched kernel variants
#   3. run_round4_training — bf16 20k / f32 8k / GAN 3k bundle
#   4. run_round4_quality_eval — held-out tables + NIQE before/after
#   5. profile_inference   — fresh trace attribution table
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p experiments /root/jax_cache

for i in $(seq 1 400); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('TPU OK', float((x@x).sum()))" 2>/dev/null; then
    break
  fi
  echo "[$(date)] TPU unavailable (attempt $i)"
  sleep 40
done

echo "[$(date)] === bench_primary ==="
timeout 2700 python tools/bench_primary.py 2>&1 | tail -4
echo "[$(date)] === sweep_dcn (hat variants) ==="
timeout 3000 python tools/sweep_dcn.py 2>&1 | tail -6
echo "[$(date)] === training bundle ==="
bash tools/run_round4_training.sh
echo "[$(date)] === quality eval ==="
bash tools/run_round4_quality_eval.sh 2>&1 | tail -40
echo "[$(date)] === trace attribution ==="
timeout 2700 python tools/profile_inference.py --iters 3 \
  > /tmp/r4_trace.log 2>&1
tail -60 /tmp/r4_trace.log
echo "[$(date)] chip work complete"
