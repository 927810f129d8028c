#!/bin/bash
# Round-3 ablation (VERDICT item 1): heads vs data.
# Same recipe as tools/run_stage1_r3.sh (4096 mixed-psi synthetic samples,
# w-weight 0.1, cosine decay, bf16) but with the round-2 globally-pooled
# projector heads (--pool-grids 1, M1 semantics:
# /root/reference/stylegan3_hvae_full.py:194-247) and 16 epochs.
# Compare held-out PSNR against the main run's epoch_16 checkpoint:
#   data-only gain   = ablation@16  - round-2 plateau (24.56 dB)
#   heads gain       = r3stage1@16  - ablation@16
# One TPU job at a time; launch detached:
#   setsid nohup tools/run_ablation_heads.sh > runs/r3ablation_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train \
  --output runs/r3ablation --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 16 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
  --val-samples 64 --pool-grids 1 --hidden-dims 512,512,1024 \
  --save-every 8 --seed 42

python tools/rd_table.py \
  --stage1 runs/r3ablation/hvae_encoder_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 16 --n-calib 0 \
  --out runs/r3ablation/RD_ABLATION.md
echo "r3 heads ablation done"
