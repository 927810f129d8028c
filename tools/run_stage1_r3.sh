#!/bin/bash
# Round-3 stage-1 quality run: spatially-aware projector heads (pool grids
# 1/2/4, widened head MLPs) + 4x data at mixed truncation — the two levers
# the round-2 plateau analysis identified (VERDICT item 1).  Same optimizer
# budget as round 2 (16384 steps) over 4x the data.
#   setsid nohup tools/run_stage1_r3.sh > runs/r3stage1_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train \
  --output runs/r3stage1 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 32 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
  --val-samples 64 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 8 --seed 42
echo "r3 stage1 done"
