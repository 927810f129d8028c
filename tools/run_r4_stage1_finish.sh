#!/bin/bash
# Round-4 phase A: finish the round-3 stage-1 (epochs 25-32) from the newest
# checkpoint.  The VM restarted at end of round 3 with the chain at epoch 26
# (last save: epoch_24.ic2t).  Commits artifacts on completion.
#   setsid nohup tools/run_r4_stage1_finish.sh > runs/r4stage1_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

python -m image_compression_2_tpu.cli train \
  --output runs/r3stage1 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 32 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
  --val-samples 64 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 4 --seed 42 \
  --resume runs/r3stage1/checkpoints/epoch_24.ic2t

test -f runs/r3stage1/hvae_encoder_final.ic2t
git add -f runs/r3stage1/metrics.jsonl runs/r3stage1/loss_curves.svg runs/r3stage1/samples 2>/dev/null || true
git commit -m "Stage-1 (spatial heads, 4096 mixed-psi) trained to epoch 32" --quiet || true
echo "r4 stage-1 finish done"
