#!/bin/bash
# Round-3 chain: stage-2 Gumbel training warm-started from the round-3
# stage-1 encoder (spatial heads adopted automatically from the checkpoint
# meta) -> held-out rate-distortion table with the per-layer allocation
# sweep.  w-weight 0.1 (1.0 drowned the pixel losses in rounds 1-2).
# One TPU job at a time; launch detached:
#   setsid nohup tools/run_stage2_r3.sh > runs/r3stage2_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train-gumbel \
  --output runs/r3stage2 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 48 --train-samples 1024 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
  --lr-decay --save-every 16 --seed 42 \
  --resume runs/r3stage1/hvae_encoder_final.ic2t

python tools/rd_table.py \
  --stage1 runs/r3stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r3stage2/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 16 --n-calib 48 --alloc-sweep \
  --out RD_TABLE.md
echo "r3 stage2 + RD done"
