#!/bin/bash
# Trimmed round-4 bundle for late TPU-tunnel recovery: bf16 quality arm
# (NITER configurable) + GAN finetune, skipping the f32 TPU arm (the CPU
# mechanism pair in PERF_NOTES covers bf16-vs-f32 convergence).
#   usage: run_round4_training_trimmed.sh [NITER] [GAN_ITERS]
set -u
NITER=${1:-12000}
GAN_ITERS=${2:-2000}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p experiments /root/jax_cache
sed -e "s/niter: 20000/niter: $NITER/" \
    -e "s/T_period: \[20000\]/T_period: [$NITER]/" \
    configs/train/bf16_vs_f32_motion.yml > /tmp/bf16_trim.yml
echo "[$(date)] bf16 arm ($NITER) starting"
timeout 10800 python tools/train.py -opt /tmp/bf16_trim.yml \
  --dcn_impl frame > experiments/bf16_arm.log 2>&1
echo "[$(date)] bf16 arm done (rc=$?)"
GCKPT="experiments/bf16_vs_f32_motion/models/${NITER}_G"
[ -d "$GCKPT" ] || GCKPT=$(ls -d experiments/bf16_vs_f32_motion/models/*_G 2>/dev/null | sort -t/ -k4 -n | tail -1)
sed -e "s/niter: 3000/niter: $GAN_ITERS/" \
    -e "s/T_period: \[3000\]/T_period: [$GAN_ITERS]/" \
    -e "s#experiments/bf16_vs_f32_motion/models/20000_G#$GCKPT#" \
    configs/train/gan_motion_3k.yml > /tmp/gan_trim.yml
echo "[$(date)] GAN ($GAN_ITERS) starting from $GCKPT"
timeout 7200 python tools/train.py -opt /tmp/gan_trim.yml \
  --dcn_impl frame > experiments/gan_motion.log 2>&1
echo "[$(date)] GAN done (rc=$?) — trimmed bundle complete"
