#!/bin/bash
# Round-4 TPU training bundle: the bf16-vs-f32 convergence pair
# (VERDICT round-2 item 9 — did not fit round 3's chip budget alongside
# the clamp de-circularization run, which completed: see PERF_NOTES
# round-3).  Each arm owns the chip; same seed/data; loss + val-PSNR
# curves land in the two experiment logs.
# Measured planning rates (round 3): frame-kernel train step compiles in
# ~10-22 min; 96^2 batch-8 bf16 runs 3.03 it/s, 192^2 batch-4 ~1 it/s
# -> 8000 iters/arm ~= 2.4 h + compile.  The trainer checkpoints on
# SIGTERM, so timeout-bounding is safe.
cd /root/repo
mkdir -p experiments
echo "[$(date)] bf16 arm starting"
timeout 10800 python tools/train.py -opt configs/train/bf16_vs_f32_motion.yml \
  --dcn_impl frame > experiments/bf16_arm.log 2>&1
sed -e 's/mixed_precision: true/mixed_precision: false/' \
    -e 's/^name: bf16_vs_f32_motion/name: f32_vs_bf16_motion/' \
    configs/train/bf16_vs_f32_motion.yml > /tmp/f32_arm.yml
echo "[$(date)] f32 arm starting"
timeout 10800 python tools/train.py -opt /tmp/f32_arm.yml \
  --dcn_impl frame > experiments/f32_arm.log 2>&1
echo "[$(date)] pair done — diff the loss columns of the two logs"
