#!/bin/bash
# Round-4 TPU training bundle (VERDICT round-3 items 4, 5, 6):
#   1. bf16 arm, 20k iters (configs/train/bf16_vs_f32_motion.yml as-is)
#      — also the flagship quality model for the held-out table.
#   2. f32 arm, 8k iters (mixed_precision overridden to false) — same
#      seed/data/schedule, so iters 0-8000 compare directly.
#   3. GAN-Split, 3k iters finetuning from the 20k checkpoint
#      (configs/train/gan_motion_3k.yml).
# Each run owns the chip; the trainer checkpoints on SIGTERM, so the
# timeouts are safe.  Loss / val-PSNR curves land in the experiment logs.
# Measured planning rates (round 3): 96^2 batch-8 bf16 = 3.03 it/s;
# frame-kernel train step compiles in ~10-22 min.
set -u
cd /root/repo
mkdir -p experiments /root/jax_cache
# persistent compilation cache: identical train-step graphs (e.g. the
# f32->bf16 arm pair sharing shapes, or a resume) skip the 10-22 min
# Mosaic compile on re-runs when the backend supports serialization
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
echo "[$(date)] bf16 arm (20k) starting"
timeout 12600 python tools/train.py -opt configs/train/bf16_vs_f32_motion.yml \
  --dcn_impl frame > experiments/bf16_arm.log 2>&1
echo "[$(date)] bf16 arm done (rc=$?)"
sed -e 's/mixed_precision: true/mixed_precision: false/' \
    -e 's/^name: bf16_vs_f32_motion/name: f32_vs_bf16_motion/' \
    -e 's/niter: 20000/niter: 8000/' \
    configs/train/bf16_vs_f32_motion.yml > /tmp/f32_arm.yml
echo "[$(date)] f32 arm (8k) starting"
timeout 10800 python tools/train.py -opt /tmp/f32_arm.yml \
  --dcn_impl frame > experiments/f32_arm.log 2>&1
rc=$?
echo "[$(date)] f32 arm done (rc=$rc)"
if ! grep -q "iter:" experiments/f32_arm.log; then
  # the f32 Mosaic frame kernel has never compiled on TPU before this
  # run — if it failed outright, fall back to the XLA block path (slower
  # but the convergence comparison is what matters)
  echo "[$(date)] f32 frame kernel failed; retrying with --dcn_impl block"
  rm -rf experiments/f32_vs_bf16_motion
  timeout 10800 python tools/train.py -opt /tmp/f32_arm.yml \
    --dcn_impl block > experiments/f32_arm.log 2>&1
  echo "[$(date)] f32 block-impl arm done (rc=$?)"
fi
echo "[$(date)] GAN-Split (3k) starting"
timeout 9000 python tools/train.py -opt configs/train/gan_motion_3k.yml \
  --dcn_impl frame > experiments/gan_motion.log 2>&1
echo "[$(date)] GAN done (rc=$?) — bundle complete"
