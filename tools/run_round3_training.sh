#!/bin/bash
# Round-3 TPU training bundle (sequential; each job owns the chip):
#  1. clamp de-circularization: flagship on motion-rich clips, ±16 clamp
#  2. bf16 arm of the precision pair      3. f32 arm (same seed/data)
cd /root/repo
mkdir -p experiments
echo "[$(date)] clamp_validation_motion starting"
timeout 14400 python tools/train.py -opt configs/train/clamp_validation_motion.yml \
  --dcn_impl frame --dcn_max_offset 16 > experiments/clamp_motion.log 2>&1
echo "[$(date)] bf16 arm starting"
timeout 7200 python tools/train.py -opt configs/train/bf16_vs_f32_motion.yml \
  --dcn_impl frame > experiments/bf16_arm.log 2>&1
sed -e 's/mixed_precision: true/mixed_precision: false/' \
    -e 's/^name: bf16_vs_f32_motion/name: f32_vs_bf16_motion/' \
    configs/train/bf16_vs_f32_motion.yml > /tmp/f32_arm.yml
echo "[$(date)] f32 arm starting"
timeout 7200 python tools/train.py -opt /tmp/f32_arm.yml \
  --dcn_impl frame > experiments/f32_arm.log 2>&1
echo "[$(date)] all done"
