#!/bin/bash
# Round-4 chip-work orchestrator (deadline-aware): wait for the TPU
# tunnel, then size the training bundle to the time actually left.
#   usage: run_round4_chip_work.sh [DEADLINE_EPOCH]
# With a deadline: NITER = 3 it/s * (time left - GAN - compiles),
# clamped to [2000, 20000]; GAN gets 1500-3000 iters.  Without one, the
# full bundle runs.
set -u
DEADLINE=${1:-0}
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
timeout 2400 python tools/bench_primary.py 2>&1 | tail -4
echo "[$(date)] === sweep_dcn (hat variants) ==="
timeout 2400 python tools/sweep_dcn.py 2>&1 | tail -6

if [ "$DEADLINE" -gt 0 ]; then
  LEFT=$(( DEADLINE - $(date +%s) ))
  # budget: GAN 1500 it @ ~2 it/s + two ~20 min compiles + eval ~20 min
  TRAIN_S=$(( LEFT - 4500 ))
  NITER=$(( TRAIN_S * 3 ))
  [ "$NITER" -gt 20000 ] && NITER=20000
  [ "$NITER" -lt 2000 ] && NITER=2000
  GI=1500
  echo "[$(date)] === trimmed training (left ${LEFT}s -> NITER=$NITER) ==="
  bash tools/run_round4_training_trimmed.sh "$NITER" "$GI"
  GCKPT=$(ls -d experiments/bf16_vs_f32_motion/models/*_G 2>/dev/null | sort -V | tail -1)
  GANCKPT=$(ls -d experiments/gan_motion_3k/models/*_G 2>/dev/null | sort -V | tail -1)
  sed -i "s#experiments/bf16_vs_f32_motion/models/20000_G#$GCKPT#" \
    configs/test/test_synthetic_motion_wi_GT.yml || true
else
  echo "[$(date)] === full training bundle ==="
  bash tools/run_round4_training.sh
fi
echo "[$(date)] === quality eval ==="
bash tools/run_round4_quality_eval.sh 2>&1 | tail -40
echo "[$(date)] === trace attribution ==="
timeout 2400 python tools/profile_inference.py --iters 3 \
  > /tmp/r4_trace.log 2>&1
tail -60 /tmp/r4_trace.log
echo "[$(date)] chip work complete"
