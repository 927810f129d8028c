#!/bin/bash
# Round-4 FINAL supervisor — takes over from run_r4_recovery.sh.
#
# Why: the recovery chain only guarded phase *starts* against the deadline;
# a phase that started at 21:55 with a 3h `timeout` would still be running
# when the driver's end-of-round bench needs the chip.  This version CLAMPS
# every phase's timeout to the time actually left, and adapts the RD table's
# --n-eval to its real window (rd_table.py now flushes row-by-row, so even a
# timeout kill keeps everything finished so far).
#
# The in-flight stage-1 python from the old chain is left untouched; pass its
# wrapper pid as S1PID and this script waits for it, then finishes stage-1 if
# needed and runs, in judge priority:
#   1. stage-2 retrain at the full 4096-sample budget (VERDICT #4)
#   2. RD table, n-eval adapted to the remaining window (VERDICT #1)
#   3. flagship 1024 bench (VERDICT #5 second half)
#   4. real-photo demo (VERDICT #7)
#   5. final bench (+ 1024:2 grad policy sweep only if a big window remains)
#
# Usage:
#   S1PID=<pid> setsid nohup tools/run_r4_final.sh > runs/r4final_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

# 22:40 UTC — the round ends ~23:01 (driver start 1787050905 + 12h); the
# driver's bench.py must find the chip idle.
HARD_END=${HARD_END:-1787092800}
S1PID=${S1PID:-}

left() { echo $(( HARD_END - $(date +%s) )); }

commit_artifacts() {  # commit_artifacts <message> <path>...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null || true
  git commit -m "$msg" --quiet || true
}

newest_ckpt() {  # newest_ckpt <dir>  (prefers *_final.ic2t)
  local f
  f=$(ls -t "$1"/*_final.ic2t 2>/dev/null | head -1)
  [ -n "$f" ] && { echo "$f"; return; }
  ls -t "$1"/checkpoints/epoch_*.ic2t 2>/dev/null | head -1
}

train_clamped() {  # train_clamped <reserve_s> <attempts> <init_resume|-> <outdir> <subcmd> <args...>
  local reserve="$1" tries="$2" resume="$3" out="$4" sub="$5"; shift 5
  [ "$resume" = "-" ] && resume=""
  for i in $(seq 1 "$tries"); do
    local tmo=$(( $(left) - reserve ))
    if [ "$tmo" -lt 600 ]; then
      echo "== no usable window left for $out (tmo=${tmo}s) ==" >&2
      return 1
    fi
    echo "== train attempt $i/$tries -> $out (resume='${resume}', tmo=${tmo}s) at $(date -u) =="
    if [ -n "$resume" ]; then
      timeout "$tmo" python -m image_compression_2_tpu.cli "$sub" "$@" --resume "$resume" && return 0
    else
      timeout "$tmo" python -m image_compression_2_tpu.cli "$sub" "$@" && return 0
    fi
    local newer
    newer=$(ls -t "$out"/checkpoints/epoch_*.ic2t 2>/dev/null | head -1)
    [ -n "$newer" ] && resume="$newer"
  done
  return 1
}

echo "== [0] waiting for the in-flight stage-1 (pid ${S1PID:-<none>}) at $(date -u) =="
if [ -n "$S1PID" ]; then
  while kill -0 "$S1PID" 2>/dev/null; do sleep 60; done
fi
echo "== stage-1 process gone at $(date -u) =="

if [ ! -e runs/r4stage1/hvae_encoder_final.ic2t ]; then
  resume=$(ls -t runs/r4stage1/checkpoints/epoch_*.ic2t 2>/dev/null | head -1)
  [ -z "$resume" ] && resume="-"
  # reserve: stage-2 minimum (~45 min) + RD minimum (~45 min) + bench slot
  train_clamped 6600 3 "$resume" runs/r4stage1 train \
    --output runs/r4stage1 --resolution 256 --generator-resolution 256 \
    --max-resolution 256 --batch-size 8 --epochs 32 --train-samples 4096 \
    --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --lr-decay --bf16 \
    --val-samples 64 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
    --save-every 4 --seed 42 \
    || echo "WARNING: stage-1 retrain incomplete" >&2
fi
commit_artifacts "Stage-1 retrain landed (recovery of the wiped r4 lineage)" \
  runs/r4stage1/metrics.jsonl runs/r4stage1/loss_curves.svg

STAGE1=$(newest_ckpt runs/r4stage1)
if [ -z "$STAGE1" ]; then
  echo "FATAL: no stage-1 checkpoint at all — downstream phases will fail" >&2
fi
echo "stage-1 checkpoint: $STAGE1 (left: $(left)s)"

echo "== [1] stage-2 retrain at the full data budget =="
# reserve ~80 min so the RD table always gets a real window
train_clamped 4800 2 "$STAGE1" runs/r4stage2b train-gumbel \
  --output runs/r4stage2b --resolution 256 --generator-resolution 256 \
  --max-resolution 256 --batch-size 8 --epochs 16 --train-samples 4096 \
  --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
  --lr-decay --save-every 4 --val-samples 64 --seed 42 \
  || echo "WARNING: stage-2 retrain incomplete" >&2
commit_artifacts "Stage-2 retrain at the full 4096-sample budget (anti-overfit)" \
  runs/r4stage2b/metrics.jsonl runs/r4stage2b/loss_curves.svg

STAGE2=$(newest_ckpt runs/r4stage2b)
echo "stage-2 checkpoint: ${STAGE2:-<none>} (left: $(left)s)"

echo "== [2] RD table (n-eval adapted to the window; 95% CIs) =="
L=$(left)
if   [ "$L" -ge 6600 ]; then NEVAL=128
elif [ "$L" -ge 4200 ]; then NEVAL=104
elif [ "$L" -ge 2400 ]; then NEVAL=64
else                         NEVAL=32
fi
RDTMO=$(( L - 1200 ))  # keep a slot for the 1024 bench
if [ "$RDTMO" -ge 900 ]; then
  timeout "$RDTMO" python tools/rd_table.py \
    --stage1 "$STAGE1" ${STAGE2:+--stage2 "$STAGE2"} \
    --res 256 --truncation 0.7 --n-eval "$NEVAL" --n-calib 48 --chunk 16 \
    --refine 100 --uniform-cabac \
    --out RD_TABLE.md \
    || echo "WARNING: RD table exited non-zero (partial rows are flushed)" >&2
  commit_artifacts "RD table at $NEVAL held-out samples with 95% CIs (retrained lineage)" \
    RD_TABLE.md RD_TABLE.json
else
  echo "== skipping RD table (window ${RDTMO}s) ==" >&2
fi

echo "== [3] flagship 1024 bench (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 1500 ]; then
  timeout $(( L - 600 )) python bench.py --res 1024 --batch 2 2>&1 | tee runs/r4_bench1024.txt \
    || echo "WARNING: 1024 bench failed" >&2
  commit_artifacts "Flagship 1024 bench number (round 4)" runs/r4_bench1024.txt
fi

echo "== [4] real-photo demo (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 3000 ]; then
  timeout $(( L - 900 )) bash -c '
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
fi

echo "== [5] final bench (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 5400 ]; then
  timeout 4200 python tools/bench_flrelu_layers.py --grad --emit-policy \
    --modes matmul,sandwich,blocked,mmfuse2,conv \
    --policy-configs 1024:2 \
    2>&1 | tee runs/r4_gradpolicy_sweep.txt \
    || echo "WARNING: grad policy sweep failed" >&2
  commit_artifacts "Measure the fwd+bwd flrelu winner table at the flagship training config (1024:2)" \
    image_compression_2_tpu/ops/flrelu_policy.json \
    runs/r4_gradpolicy_sweep.txt
fi
L=$(left)
if [ "$L" -ge 900 ]; then
  timeout $(( L - 120 )) python bench.py | tee runs/r4_bench_final.txt || true
  commit_artifacts "Final round-4 bench" runs/r4_bench_final.txt
fi

echo "r4 final chain done at $(date -u) (left: $(left)s)"
