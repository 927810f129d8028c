#!/bin/bash
# Round-3 flagship 1024² training (VERDICT item 4): a short full-resolution
# run proving the deployment config TRAINS (not just compiles/benches).
# Reference capability: /root/reference/stylegan3_hvae_full.py:1032
# (max_resolution default 1024), hvae_training.py:45-274 (full-res training).
# One TPU job at a time; launch detached:
#   setsid nohup tools/run_stage1024_r3.sh > runs/r3stage1024_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train \
  --output runs/r3stage1024 --resolution 1024 --generator-resolution 1024 \
  --max-resolution 1024 --batch-size 2 --epochs 6 --train-samples 256 \
  --truncation-psi 0.7 --w-weight 0.1 --lr-decay --bf16 --remat \
  --val-samples 8 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 3 --seed 42

python tools/rd_table.py \
  --stage1 runs/r3stage1024/hvae_encoder_final.ic2t \
  --res 1024 --truncation 0.7 --n-eval 4 --n-calib 0 \
  --out RD_1024.md
echo "r3 1024 stage1 + RD done"
