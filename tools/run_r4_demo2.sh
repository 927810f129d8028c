#!/bin/bash
# Round-4 demo redo: the 22:05 fine-tune crashed on the optimizer-state
# restore mismatch (fixed in 7019d21); with the resume fix landed, redo
# the real-photo fine-tune + compare/eval.  Deadline-clamped; commits its
# own artifacts so the chip is idle before the driver bench.
set -u
cd "$(dirname "$0")/.."
HARD_END=${HARD_END:-1787092920}   # 22:42 UTC
left() { echo $(( HARD_END - $(date +%s) )); }

T=$(( $(left) - 420 )); [ "$T" -gt 600 ] && T=600
if [ "$T" -ge 180 ]; then
  timeout "$T" python -m image_compression_2_tpu.cli train \
    --output runs/real_demo/train --resolution 256 \
    --generator-resolution 256 --max-resolution 256 --batch-size 8 \
    --epochs 12 --dataset runs/real_demo/data \
    --val-dataset runs/real_demo/data_val --w-weight 0 --lr 3e-5 \
    --bf16 --save-every 2 --seed 42 \
    --resume runs/r4stage1/hvae_encoder_final.ic2t || true
fi
CKPT=runs/real_demo/train/hvae_encoder_final.ic2t
if [ ! -e "$CKPT" ] && [ -e runs/real_demo/train/hvae_encoder_best.ic2t ]; then
  cp runs/real_demo/train/hvae_encoder_best.ic2t "$CKPT"
fi
[ -e "$CKPT" ] || exit 0
timeout $(( $(left) - 200 )) python -m image_compression_2_tpu.cli compare \
  --checkpoint "$CKPT" --image runs/real_demo/grace_256.png \
  --output runs/real_demo/compare_ft --resolution 256 \
  2>&1 | tee runs/real_demo/compare_ft.txt
timeout $(( $(left) - 60 )) python -m image_compression_2_tpu.cli eval \
  --checkpoint "$CKPT" --image runs/real_demo/grace_256.png \
  --output runs/real_demo/eval_ft --resolution 256 \
  2>&1 | tee runs/real_demo/eval_ft.txt
git add -f runs/real_demo/compare_ft.txt runs/real_demo/eval_ft.txt \
  runs/real_demo/compare_ft runs/real_demo/eval_ft \
  runs/real_demo/train/metrics.jsonl 2>/dev/null
git commit -q -m "Real-photo demo redo with the fine-tune actually running (resume fix)" || true
echo "demo2 done at $(date -u) (left $(left)s)"
