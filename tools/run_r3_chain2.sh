#!/bin/bash
# Round-3 recovery chain.  A host restart wiped runs/r3stage1/*.ic2t after the
# first chain's stage-2 had warm-started from it, and the old silent-skip
# resume bug (fixed in train/trainer.py) let the next stage-2 train from
# scratch with the default architecture (preserved as runs/r3stage2_defaultarch
# for the warm-vs-scratch comparison).  This chain redoes the full lineage and
# `git commit`s each phase's small artifacts immediately so another restart
# cannot orphan them.  ONE TPU job at a time — launch detached:
#   setsid nohup tools/run_r3_chain2.sh > runs/r3chain2_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

commit_artifacts() {  # commit_artifacts <message> <path>...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null || true
  git commit -m "$msg" --quiet || true
}

echo "== [1/3] stage-1 (spatial heads, 4096 mixed-psi samples) =="
python -m image_compression_2_tpu.cli train \
  --output runs/r3stage1 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 32 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
  --val-samples 64 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 8 --seed 42
test -f runs/r3stage1/hvae_encoder_final.ic2t
commit_artifacts "Rerun round-3 stage-1 after host restart wiped the checkpoint" \
  runs/r3stage1/metrics.jsonl runs/r3stage1/loss_curves.svg runs/r3stage1/samples

echo "== [2/3] stage-2 (gumbel, warm start, w-weight 0.1) =="
python -m image_compression_2_tpu.cli train-gumbel \
  --output runs/r3stage2 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 48 --train-samples 1024 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
  --lr-decay --save-every 16 --seed 42 \
  --resume runs/r3stage1/hvae_encoder_final.ic2t
test -f runs/r3stage2/gumbel_hvae_final.ic2t
commit_artifacts "Stage-2 gumbel run warm-started from the round-3 stage-1 encoder" \
  runs/r3stage2/metrics.jsonl runs/r3stage2/loss_curves.svg runs/r3stage2/samples

echo "== [3/3] refined RD table =="
python tools/rd_table.py \
  --stage1 runs/r3stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r3stage2/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 16 --n-calib 48 \
  --refine 100 --alloc-sweep \
  --out RD_TABLE.md
commit_artifacts "Regenerate the held-out RD table from the round-3 lineage" \
  RD_TABLE.md RD_TABLE.json

echo "r3 chain2a done — run perf window, then tools/run_r3_chain2b.sh"
