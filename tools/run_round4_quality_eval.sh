#!/bin/bash
# Round-4 quality evidence (VERDICT round-3 items 5 + 6), run AFTER
# tools/run_round4_training.sh:
#   1. held-out PSNR/SSIM table for the 20k pixel model (the reference's
#      core deliverable format, test_RealVSR_wi_GT.py:207-216)
#   2. the same table + saved images for the GAN finetune
#   3. NIQE before/after (model fitted on held-out GT, mirroring the
#      reference's fitniqe-on-RealVSR-GT workflow)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

[ -d datasets/synthetic_motion_test/GT ] || \
  python tools/dump_synthetic_testset.py --out datasets/synthetic_motion_test

echo "[$(date)] fitting NIQE model on held-out GT"
python - <<'EOF'
import numpy as np
from realvsr_tpu.eval.niqe import fit_niqe_model
m = fit_niqe_model("datasets/synthetic_motion_test/GT")
np.savez("experiments/niqe_synth_gt.npz", **m)
print("fit OK:", {k: v.shape for k, v in m.items()})
EOF

echo "[$(date)] quality table: 20k pixel model"
timeout 3600 python tools/test_wi_gt.py \
  -opt configs/test/test_synthetic_motion_wi_GT.yml --dcn_impl frame \
  --save_imgs > experiments/quality_table_pixel.log 2>&1
tail -12 experiments/quality_table_pixel.log

echo "[$(date)] quality table: GAN finetune"
GANCKPT=$(ls -d experiments/gan_motion_3k/models/*_G 2>/dev/null | sort -V | tail -1)
sed -e 's/^name: test_synthetic_motion_quality/name: test_synthetic_motion_gan/' \
    -e "s#experiments/bf16_vs_f32_motion/models/[0-9]*_G#$GANCKPT#" \
    configs/test/test_synthetic_motion_wi_GT.yml > /tmp/test_gan.yml
timeout 3600 python tools/test_wi_gt.py -opt /tmp/test_gan.yml \
  --dcn_impl frame --save_imgs > experiments/quality_table_gan.log 2>&1
tail -12 experiments/quality_table_gan.log

echo "[$(date)] NIQE before/after"
for d in test_synthetic_motion_quality test_synthetic_motion_gan; do
  echo "--- $d"
  python tools/evaluate_no_reference.py --results results/$d \
    --metrics niqe --niqe-model experiments/niqe_synth_gt.npz \
    2>&1 | tail -8
done
echo "[$(date)] quality eval complete"
