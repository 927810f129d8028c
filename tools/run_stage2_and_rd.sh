#!/bin/bash
# Chain: stage-2 Gumbel training (warm-started from the round-2 stage-1
# encoder) -> rate-distortion table on held-out samples.  One TPU job at a
# time; launch detached:  setsid nohup tools/run_stage2_and_rd.sh > runs/r2stage2_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train-gumbel \
  --output runs/r2stage2 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 80 --train-samples 512 \
  --truncation-psi 0.7 --w-weight 0.1 --n-embeddings 256 --bf16 --lr-decay \
  --save-every 40 --seed 42 \
  --resume runs/r2stage1/hvae_encoder_final.ic2t

python tools/rd_table.py \
  --stage1 runs/r2stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r2stage2/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 16 --n-calib 48 \
  --out RD_TABLE.md
echo "stage2 + RD done"
