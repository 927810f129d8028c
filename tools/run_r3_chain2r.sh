#!/bin/bash
# Round-3 recovery chain, take 3: the 22:36 chain's stage-1 wedged at epoch 11
# when the axon relay dropped and re-established the connection mid-dispatch
# (the client blocked forever on a response that was lost — zero CPU, conn
# threads newer than the process).  A fresh client probe confirmed the TPU
# itself was healthy, so this chain resumes stage-1 from the epoch_8
# checkpoint (optimizer state included) and then runs the same stage-2 + RD
# lineage as tools/run_r3_chain2.sh, committing artifacts per phase.
#   setsid nohup tools/run_r3_chain2r.sh > runs/r3chain2r_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

commit_artifacts() {  # commit_artifacts <message> <path>...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null || true
  git commit -m "$msg" --quiet || true
}

echo "== [1/3] stage-1 RESUME from epoch_8 (spatial heads, 4096 mixed-psi) =="
python -m image_compression_2_tpu.cli train \
  --output runs/r3stage1 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 32 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
  --val-samples 64 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 8 --seed 42 \
  --resume runs/r3stage1/checkpoints/epoch_8.ic2t
test -f runs/r3stage1/hvae_encoder_final.ic2t
commit_artifacts "Round-3 stage-1 complete (resumed after a relay-drop wedge at epoch 11)" \
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
  --refine 100 --alloc-sweep --uniform-cabac \
  --out RD_TABLE.md
commit_artifacts "Regenerate the held-out RD table from the round-3 lineage" \
  RD_TABLE.md RD_TABLE.json

echo "r3 chain2a done — perf window + chain2b follow (run_r3_auto.sh)"
