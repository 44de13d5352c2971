#!/bin/bash
# Round-5 non-flagship arch evidence (VERDICT round-4 items 6 + 7):
# 250-iter chip smoke-trains for every non-flagship arch the reference
# trains (TDAN / TOF / FSTRN / RCAN + full EDVR x4 with TSA), then chip
# inference bench lines for the two other DCN consumers:
#   - TDAN at 1024x512 (4 chained DCNs per neighbor frame)
#   - EDVR with TSA at 1024x512
#   - EDVR x4 (pixel-shuffle) at 448x256 -> 1792x1024
# Runs are ordered smoke-trains first (loss curves are the scarcer
# evidence); each step is independently logged so a tunnel drop leaves
# the completed steps usable.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p experiments /root/jax_cache

for arch in TDAN TOF FSTRN RCAN EDVRx4; do
  echo "[$(date)] smoke-train $arch starting"
  timeout 3600 python tools/train.py --dcn_impl frame \
    -opt configs/train/smoke_${arch}_motion.yml \
    > experiments/smoke_${arch}.log 2>&1
  echo "[$(date)] smoke-train $arch done (rc=$?)"
  grep -E "iter:\s+250|Validation" \
    experiments/smoke_${arch}/train.log 2>/dev/null | tail -3
done

echo "[$(date)] bench: TDAN 1024x512"
timeout 3600 python tools/bench_archs.py --arch tdan --h 512 --w 1024 \
  > experiments/bench_tdan.log 2>&1
echo "[$(date)] rc=$?"; tail -2 experiments/bench_tdan.log

echo "[$(date)] bench: EDVR+TSA 1024x512"
timeout 3600 python tools/bench_archs.py --arch edvr_tsa --h 512 --w 1024 \
  > experiments/bench_edvr_tsa.log 2>&1
echo "[$(date)] rc=$?"; tail -2 experiments/bench_edvr_tsa.log

echo "[$(date)] bench: EDVR x4 448x256 -> 1792x1024"
timeout 3600 python tools/bench_archs.py --arch edvr_x4 --h 256 --w 448 \
  > experiments/bench_edvr_x4.log 2>&1
echo "[$(date)] rc=$?"; tail -2 experiments/bench_edvr_x4.log

echo "[$(date)] arch smokes + benches complete"
