#!/bin/bash
# Round-4 stage-2 retrain: the first round-4 stage-2 (runs/r3stage2) trained
# on 1024 samples for 48 epochs and OVERFIT (train rec 0.010, but held-out
# gumbel-256 25.31 dB vs the stage-1 encoder's 26.75 dB on the same 256-level
# grid).  This run matches stage-1's data budget (4096 mixed-psi samples),
# halves the epochs, and monitors a val split; then re-evaluates the
# gumbel-vs-uniform comparison on 128 held-out samples.
# Waits for tools/run_r4_post.sh to exit first (ONE TPU job at a time).
#   setsid nohup tools/run_r4_stage2b.sh > runs/r4stage2b_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

while pgrep -x -f "/bin/bash tools/run_r4_post.sh" > /dev/null; do
  sleep 60
done
echo "== r4 post queue exited at $(date -u) — starting stage-2 retrain =="

python -m image_compression_2_tpu.cli train-gumbel \
  --output runs/r4stage2b --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 24 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
  --lr-decay --save-every 4 --val-samples 64 --seed 42 \
  --resume runs/r3stage1/hvae_encoder_final.ic2t \
  || { echo "WARNING: stage-2 retrain failed" >&2; exit 1; }
git add -f runs/r4stage2b/metrics.jsonl runs/r4stage2b/loss_curves.svg 2>/dev/null || true
git commit -qm "Stage-2 retrain at the full 4096-sample budget (anti-overfit)" || true

python tools/rd_table.py \
  --stage1 runs/r3stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r4stage2b/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 128 --n-calib 48 --chunk 16 \
  --out RD_STAGE2B.md \
  || echo "WARNING: stage2b RD failed" >&2
git add -f RD_STAGE2B.md RD_STAGE2B.json 2>/dev/null || true
git commit -qm "Gumbel-vs-uniform RD at 128 held-out samples (stage-2 retrained on the full data budget)" || true
echo "r4 stage2b done at $(date -u)"
