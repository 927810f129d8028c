#!/bin/bash
# Round-4 recovery chain. The sandbox restart (11:08) wiped every trained
# checkpoint (only git-committed artifacts survived), so the remaining
# r4_main phases 2-5 lost their stage-1 dependency.  This chain rebuilds the
# lineage and finishes the round-4 queue in judge priority:
#   0. stage-1 retrain (exact r3 recipe/seed -> reproduces the 26.75 dB line)
#   1. stage-2 retrain at the full 4096-sample budget (VERDICT #4)
#   2. big RD table: n-eval 128, 95% CIs, refine + uniform-cabac (VERDICT #1)
#   3. real-photo demo: folder fine-tune + compare/eval (VERDICT #7)
#   4. flagship 1024 bench (VERDICT #5 second half)
#   5. fwd+bwd flrelu policy sweep at both training configs + final bench
# Wedge handling: every training attempt runs under `timeout`; on expiry we
# resume from the newest epoch checkpoint (relay wedges hang, they don't
# crash).  Each phase commits its artifacts; a failure never blocks later
# phases.
#   setsid nohup tools/run_r4_recovery.sh > runs/r4recovery_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

# Hard deadline for STARTING a new phase (unix ts): leave the chip free for
# the driver's end-of-round bench.  Phases already running are bounded by
# their own `timeout`s.
DEADLINE=${DEADLINE:-1787091000}
past_deadline() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "== deadline passed — skipping remaining phases ($1) ==" >&2
    return 0
  fi
  return 1
}

commit_artifacts() {  # commit_artifacts <message> <path>...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null || true
  git commit -m "$msg" --quiet || true
}

newest_ckpt() {  # newest_ckpt <dir>  (prefers *_final.ic2t)
  ls -t "$1"/*_final.ic2t 2>/dev/null | head -1 && return
  ls -t "$1"/checkpoints/epoch_*.ic2t 2>/dev/null | head -1
}

train_with_resume() {  # train_with_resume <timeout_s> <attempts> <init_resume|-> <outdir> <subcmd> <args...>
  local tmo="$1" tries="$2" resume="$3" out="$4" sub="$5"; shift 5
  [ "$resume" = "-" ] && resume=""
  for i in $(seq 1 "$tries"); do
    local left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 600 ] && { echo "deadline reached mid-training for $out" >&2; return 1; }
    [ "$left" -lt "$tmo" ] && tmo="$left"
    echo "== train attempt $i/$tries -> $out (resume='${resume}', tmo=${tmo}s) at $(date -u) =="
    if [ -n "$resume" ]; then
      timeout "$tmo" python -m image_compression_2_tpu.cli "$sub" "$@" --resume "$resume" && return 0
    else
      timeout "$tmo" python -m image_compression_2_tpu.cli "$sub" "$@" && return 0
    fi
    local newer
    newer=$(ls -t "$out"/checkpoints/epoch_*.ic2t 2>/dev/null | head -1 || true)
    if [ -n "$newer" ]; then resume="$newer"
    else echo "no checkpoint to resume from in $out — keeping resume='${resume}'" >&2; fi
  done
  return 1
}

echo "== [0/5] stage-1 retrain (recovery of the wiped r3 lineage) =="
train_with_resume 12600 3 - runs/r4stage1 train \
  --output runs/r4stage1 --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 32 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
  --val-samples 64 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
  --save-every 4 --seed 42 \
  || echo "WARNING: stage-1 retrain incomplete" >&2
commit_artifacts "Stage-1 retrain after the sandbox restart wiped all checkpoints" \
  runs/r4stage1/metrics.jsonl runs/r4stage1/loss_curves.svg

STAGE1=$(newest_ckpt runs/r4stage1)
if [ -z "$STAGE1" ]; then
  echo "FATAL: no stage-1 checkpoint at all — downstream phases will fail" >&2
fi
echo "stage-1 checkpoint: $STAGE1"

echo "== [1/5] stage-2 retrain at the full data budget =="
past_deadline "stage-2" && exit 0
train_with_resume 9000 2 "$STAGE1" runs/r4stage2b train-gumbel \
  --output runs/r4stage2b --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 16 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
  --lr-decay --save-every 4 --val-samples 64 --seed 42 \
  || echo "WARNING: stage-2 retrain incomplete" >&2
commit_artifacts "Stage-2 retrain at the full 4096-sample budget (anti-overfit)" \
  runs/r4stage2b/metrics.jsonl runs/r4stage2b/loss_curves.svg

STAGE2=$(newest_ckpt runs/r4stage2b)
echo "stage-2 checkpoint: ${STAGE2:-<none>}"

echo "== [2/5] big RD table (n-eval 128, 95% CIs, retrained gumbel) =="
past_deadline "big RD table" && exit 0
timeout 10800 python tools/rd_table.py \
  --stage1 "$STAGE1" ${STAGE2:+--stage2 "$STAGE2"} \
  --res 256 --truncation 0.7 --n-eval 128 --n-calib 48 --chunk 16 \
  --refine 100 --uniform-cabac \
  --out RD_TABLE.md \
  && commit_artifacts "RD table at 128 held-out samples with 95% CIs (retrained stage-2)" \
       RD_TABLE.md RD_TABLE.json \
  || echo "WARNING: big RD table failed" >&2

echo "== [3/5] real-photo demo =="
past_deadline "real demo" && exit 0
timeout 5400 bash -c '
python tools/make_real_folder.py --out runs/real_demo \
  && python -m image_compression_2_tpu.cli train \
       --output runs/real_demo/train --resolution 256 \
       --generator-resolution 256 --max-resolution 256 --batch-size 8 \
       --epochs 40 --dataset runs/real_demo/data \
       --val-dataset runs/real_demo/data_val --w-weight 0 --lr 3e-5 \
       --bf16 --save-every 8 --seed 42 \
       --resume '"$STAGE1"' \
  && python -m image_compression_2_tpu.cli compare \
       --checkpoint runs/real_demo/train/hvae_encoder_final.ic2t \
       --image runs/real_demo/grace_256.png \
       --output runs/real_demo/compare --resolution 256 \
       2>&1 | tee runs/real_demo/compare.txt \
  && python -m image_compression_2_tpu.cli eval \
       --checkpoint runs/real_demo/train/hvae_encoder_final.ic2t \
       --image runs/real_demo/grace_256.png \
       --output runs/real_demo/eval --resolution 256 \
       2>&1 | tee runs/real_demo/eval.txt \
' || echo "WARNING: real demo failed" >&2
commit_artifacts "Real-photo end-to-end demo: folder fine-tune + compare/eval on a real portrait" \
  runs/real_demo/compare.txt runs/real_demo/eval.txt runs/real_demo/grace_256.png \
  runs/real_demo/train/metrics.jsonl runs/real_demo/train/loss_curves.svg \
  runs/real_demo/compare runs/real_demo/eval

echo "== [4/5] flagship 1024 bench =="
past_deadline "1024 bench" && exit 0
timeout 1800 python bench.py --res 1024 --batch 2 2>&1 | tee runs/r4_bench1024.txt \
  || echo "WARNING: 1024 bench failed" >&2
commit_artifacts "Flagship 1024 bench number (round 4)" runs/r4_bench1024.txt

echo "== [5/5] fwd+bwd policy sweep at the flagship config + final bench =="
# 256:8 grad winners were already measured and committed (winners_grad);
# only the 1024:2 lane is missing.
past_deadline "grad policy sweep" && exit 0
timeout 4500 python tools/bench_flrelu_layers.py --grad --emit-policy \
  --modes matmul,sandwich,blocked,mmfuse2,conv \
  --policy-configs 1024:2 \
  2>&1 | tee runs/r4_gradpolicy_sweep.txt \
  || echo "WARNING: grad policy sweep failed" >&2
timeout 1800 python bench.py | tee runs/r4_bench_final.txt || true
commit_artifacts "Measure the fwd+bwd flrelu winner table at the flagship training config (1024:2)" \
  image_compression_2_tpu/ops/flrelu_policy.json \
  runs/r4_gradpolicy_sweep.txt runs/r4_bench_final.txt

echo "r4 recovery chain done at $(date -u)"
