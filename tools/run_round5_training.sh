#!/bin/bash
# Round-5 flagship training bundle (VERDICT round-4 item 5): the three
# queued flagship-scale runs, highest evidence-value first so a tunnel
# drop still leaves the top items done:
#   1. bf16 arm, 20k iters (configs/train/bf16_vs_f32_motion.yml) —
#      the flagship quality model for the held-out PSNR/SSIM table.
#   2. GAN-Split, 3k iters finetuning the 20k checkpoint
#      (configs/train/gan_motion_3k.yml) — flagship-size (nf=64) GAN
#      evidence with before/after NIQE.
#   3. f32 arm, 8k iters (mixed_precision off, same seed/data/schedule)
#      — the full-size bf16-vs-f32 convergence pair.
# Planning rates (round-4 chip): 96^2 batch-8 bf16 = 4.4 it/s; train
# step AOT-compiles in ~154 s with the persistent cache warm.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p experiments /root/jax_cache

echo "[$(date)] bf16 arm (20k) starting"
timeout 10800 python tools/train.py -opt configs/train/bf16_vs_f32_motion.yml \
  --dcn_impl frame > experiments/bf16_arm.log 2>&1
echo "[$(date)] bf16 arm done (rc=$?)"

GCKPT="experiments/bf16_vs_f32_motion/models/20000_G"
[ -d "$GCKPT" ] || GCKPT=$(ls -d experiments/bf16_vs_f32_motion/models/*_G 2>/dev/null | sort -t/ -k4 -n | tail -1)
if [ -n "${GCKPT:-}" ]; then
  sed -e "s#experiments/bf16_vs_f32_motion/models/20000_G#$GCKPT#" \
      configs/train/gan_motion_3k.yml > /tmp/gan_r5.yml
  echo "[$(date)] GAN (3k) starting from $GCKPT"
  timeout 7200 python tools/train.py -opt /tmp/gan_r5.yml \
    --dcn_impl frame > experiments/gan_motion.log 2>&1
  echo "[$(date)] GAN done (rc=$?)"
else
  echo "[$(date)] no bf16 checkpoint found; skipping GAN"
fi

sed -e 's/mixed_precision: true/mixed_precision: false/' \
    -e 's/^name: bf16_vs_f32_motion/name: f32_vs_bf16_motion/' \
    -e 's/niter: 20000/niter: 8000/' \
    configs/train/bf16_vs_f32_motion.yml > /tmp/f32_arm_r5.yml
echo "[$(date)] f32 arm (8k) starting"
timeout 9000 python tools/train.py -opt /tmp/f32_arm_r5.yml \
  --dcn_impl frame > experiments/f32_arm.log 2>&1
rc=$?
echo "[$(date)] f32 arm done (rc=$rc)"
if ! grep -q "iter:" experiments/f32_arm.log; then
  echo "[$(date)] f32 frame kernel failed; retrying with --dcn_impl block"
  rm -rf experiments/f32_vs_bf16_motion
  timeout 9000 python tools/train.py -opt /tmp/f32_arm_r5.yml \
    --dcn_impl block > experiments/f32_arm.log 2>&1
  echo "[$(date)] f32 block-impl arm done (rc=$?)"
fi
echo "[$(date)] round-5 training bundle complete"
