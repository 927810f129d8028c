#!/bin/bash
# Round-3 chain, part B (after run_r3_chain2.sh + the perf window):
# flagship 1024 training + RD, then the heads-vs-data ablation.
#   setsid nohup tools/run_r3_chain2b.sh > runs/r3chain2b_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

commit_artifacts() {  # commit_artifacts <message> <path>...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null || true
  git commit -m "$msg" --quiet || true
}

echo "== [1/2] flagship 1024 =="
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
commit_artifacts "Flagship 1024 training run + RD table (trained, not just compiled)" \
  RD_1024.md RD_1024.json runs/r3stage1024/metrics.jsonl \
  runs/r3stage1024/loss_curves.svg runs/r3stage1024/samples

echo "== [2/2] heads-vs-data ablation (global heads, same 4x data) =="
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
commit_artifacts "Heads-vs-data ablation run artifacts" \
  runs/r3ablation/RD_ABLATION.md runs/r3ablation/metrics.jsonl

echo "r3 chain2b done"
