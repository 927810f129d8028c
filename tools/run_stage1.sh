#!/bin/bash
# Round-2 stage-1 training: the "best 256-squared encoder" run feeding
# tools/run_stage2_and_rd.sh.  Synthetic data at truncation 0.7 (natural-er
# statistics, easier to invert) with W+-space supervision (the true latents
# of synthetic samples are known) and cosine lr decay.  One TPU job at a
# time; launch detached:
#   setsid nohup tools/run_stage1.sh > runs/r2stage1_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train \
  --output runs/r2stage1 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 120 --train-samples 1024 \
  --truncation-psi 0.7 --w-weight 0.1 --lr-decay --bf16 --save-every 50 \
  --seed 42
echo "stage1 done"
