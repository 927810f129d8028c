#!/bin/bash
# Round-3 master chip chain (replaces run_r3_queue.sh's remaining items after
# the fir-variants microbench ran separately).  ONE TPU job at a time; this
# chains everything left so the chip never idles:
#   1. Stage-2 Gumbel training warm-started from the round-3 stage-1 encoder
#      (w-weight 0.1 — VERDICT item 2)
#   2. Full refined RD table: stage-1 + stage-2 rows, refine-100 rows,
#      per-layer allocation sweep -> RD_TABLE.md (VERDICT items 2 + 5)
#   3. Flagship 1024^2 training + RD (VERDICT item 4)
#   4. Heads-vs-data ablation (VERDICT item 1's attribution)
# Launch detached:
#   setsid nohup tools/run_r3_chain.sh > runs/r3chain_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

echo "== [1/4] stage-2 =="
python -m image_compression_2_tpu.cli train-gumbel \
  --output runs/r3stage2 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 48 --train-samples 1024 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
  --lr-decay --save-every 16 --seed 42 \
  --resume runs/r3stage1/hvae_encoder_final.ic2t

echo "== [2/4] refined RD table =="
python tools/rd_table.py \
  --stage1 runs/r3stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r3stage2/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 16 --n-calib 48 \
  --refine 100 --alloc-sweep \
  --out RD_TABLE.md

echo "== [3/4] flagship 1024 =="
python -m image_compression_2_tpu.cli train \
  --output runs/r3stage1024 --resolution 1024 --generator-resolution 1024 \
  --max-resolution 1024 --batch-size 2 --epochs 6 --train-samples 256 \
  --truncation-psi 0.7 --w-weight 0.1 --lr-decay --bf16 --remat \
  --val-samples 8 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 3 --seed 42
python tools/rd_table.py \
  --stage1 runs/r3stage1024/hvae_encoder_final.ic2t \
  --res 1024 --truncation 0.7 --n-eval 4 --n-calib 0 --refine 100 \
  --out RD_1024.md

echo "== [4/4] heads ablation =="
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

echo "r3 chain done"
