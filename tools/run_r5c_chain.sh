#!/bin/bash
# Round-5 supervisor, take 3.  The 06:39 sandbox restart killed the r5b
# chain mid-stage-1 (again) and wiped every checkpoint; the driver's round
# clock restarted with it (PROGRESS.jsonl wall_s≈151 at 06:41), so the
# round now ends ~18:39 UTC.  Stage-1 was relaunched from scratch at 09:13
# (8192 samples x 14 epochs — the VERDICT #4 scale recipe).  This chain
# waits for it, then runs the chip phases in judge priority, every timeout
# clamped to the time left, committing per phase:
#   1. forward flrelu policy sweep incl. hfuse + layerfuse sweep + bench
#   2. real-photo demo: fine-tune + compare --refine-steps + eval (VERDICT #2)
#   3. stage-2 retrain warm-started from the new stage-1
#   4. RD table @256 with affine refined+CABAC / per-layer+cabac rows
#   5. grad sweep / 1024 bench when slack remains + final 256 bench
#
# Usage:
#   S1PID=<pid> setsid nohup tools/run_r5c_chain.sh > runs/r5chain_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

# ~17:58 UTC Aug 19 — driver round-5 wall-clock start (1787121530) + 12 h
# = 18:38, minus a 40-min buffer for the driver's own bench.
HARD_END=${HARD_END:-1787162300}
S1PID=${S1PID:-}

left() { echo $(( HARD_END - $(date +%s) )); }

commit_one() {  # commit_one <message> <path>...   (paths added individually)
  local msg="$1"; shift
  for p in "$@"; do git add -f "$p" 2>/dev/null || true; done
  git commit -m "$msg" --quiet || true
}

newest_ckpt() {  # newest_ckpt <dir> <stem>  (final > best > epoch_*)
  local f
  f=$(ls -t "$1"/${2}_final.ic2t 2>/dev/null | head -1)
  [ -n "$f" ] && { echo "$f"; return; }
  f=$(ls -t "$1"/${2}_best.ic2t 2>/dev/null | head -1)
  [ -n "$f" ] && { echo "$f"; return; }
  ls -t "$1"/checkpoints/epoch_*.ic2t 2>/dev/null | head -1
}

echo "== [0] waiting for stage-1 (pid ${S1PID:-<none>}) at $(date -u) =="
if [ -n "$S1PID" ]; then
  while kill -0 "$S1PID" 2>/dev/null; do sleep 60; done
fi
echo "== stage-1 gone at $(date -u) (left: $(left)s) =="
# timeout-killed run: promote the incrementally-saved best so downstream
# phases get the best-validation state (what the trainer itself would ship)
if [ ! -e runs/r5stage1/hvae_encoder_final.ic2t ] \
   && [ -e runs/r5stage1/hvae_encoder_best.ic2t ]; then
  cp runs/r5stage1/hvae_encoder_best.ic2t runs/r5stage1/hvae_encoder_final.ic2t
  echo "promoted best -> final (stage-1 was window-killed)"
fi
commit_one "Stage-1 scale run artifacts (round 5 take 3: 8192 samples, second restart wiped the 02:40 run)" \
  runs/r5stage1/metrics.jsonl runs/r5stage1/loss_curves.svg runs/r5stage1_log.txt
STAGE1=$(newest_ckpt runs/r5stage1 hvae_encoder)
if [ -z "$STAGE1" ]; then
  echo "FATAL: no stage-1 checkpoint — downstream phases will mostly fail" >&2
fi
echo "stage-1 checkpoint: $STAGE1"

echo "== [1] forward policy sweep w/ hfuse + layerfuse (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 16200 ]; then CFGS="256:8,1024:2"
else CFGS="256:8"; fi
if [ "$L" -ge 5400 ]; then
  timeout 2700 python tools/bench_flrelu_layers.py --emit-policy \
    --policy-configs "$CFGS" 2>&1 | tee runs/r5_policy_fwd.txt \
    || echo "WARNING: policy sweep failed" >&2
  commit_one "Forward flrelu policy sweep incl. hfuse ($CFGS)" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5_policy_fwd.txt
  # whole-layer fusion sweep (conv+flrelu in one pallas_call): fills the
  # policy's `layers` table that SynthesisLayer consults on the forward path
  timeout 2100 python tools/bench_layerfuse.py --emit-policy \
    --policy-configs "$CFGS" 2>&1 | tee runs/r5_policy_layerfuse.txt \
    || echo "WARNING: layerfuse sweep failed" >&2
  commit_one "Whole-layer fusion policy sweep ($CFGS)" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5_policy_layerfuse.txt
  timeout 1200 python bench.py 2>&1 | tee runs/r5_bench_after_policy.txt || true
  commit_one "Bench after round-5 policy sweeps (flrelu modes + layer fusion)" \
    runs/r5_bench_after_policy.txt
fi

echo "== [1.5] refine-lr probe (left: $(left)s) =="
# Tiny-config CPU A/B showed constant 0.05 beating the 0.02 default by ~2 dB
# at 100 steps; settle it on the real model so every refined row downstream
# (demo + RD table) rides the winner.
REFLR=0.02
L=$(left)
if [ -n "$STAGE1" ] && [ "$L" -ge 3600 ]; then
  timeout 1500 python tools/probe_refine_lr.py --stage1 "$STAGE1" \
    2>&1 | tee runs/r5_refine_lr.txt \
    || echo "WARNING: refine-lr probe failed (keeping 0.02)" >&2
  best=$(sed -n 's/^BEST_LR \([0-9.]*\)$/\1/p' runs/r5_refine_lr.txt | tail -1)
  [ -n "$best" ] && REFLR="$best"
  echo "refine lr for demo + RD: $REFLR"
  commit_one "Refine-lr probe on the real 256 model (winner: $REFLR)" \
    runs/r5_refine_lr.txt
fi

echo "== [2] real-photo demo: fine-tune + refined compare (left: $(left)s) =="
L=$(left)
if [ -n "$STAGE1" ] && [ "$L" -ge 3600 ]; then
  timeout 1200 python -m image_compression_2_tpu.cli train \
    --output runs/real_demo/train_r5 --resolution 256 \
    --generator-resolution 256 --max-resolution 256 --batch-size 8 \
    --epochs 12 --dataset runs/real_demo/data \
    --val-dataset runs/real_demo/data_val --w-weight 0 --lr 3e-5 \
    --bf16 --save-every 2 --seed 42 \
    --resume "$STAGE1" 2>&1 | tail -5 || true
  DEMO_CKPT=$(newest_ckpt runs/real_demo/train_r5 hvae_encoder)
  [ -z "$DEMO_CKPT" ] && DEMO_CKPT="$STAGE1"
  timeout 2400 python -m image_compression_2_tpu.cli compare \
    --checkpoint "$DEMO_CKPT" \
    --image runs/real_demo/grace_256.png \
    --output runs/real_demo/compare_r5 --resolution 256 \
    --refine-steps 100 --refine-lr "$REFLR" \
    2>&1 | tee runs/real_demo/compare_r5.txt \
    || echo "WARNING: real demo compare failed" >&2
  timeout 900 python -m image_compression_2_tpu.cli eval \
    --checkpoint "$DEMO_CKPT" \
    --image runs/real_demo/grace_256.png \
    --output runs/real_demo/eval_r5 --resolution 256 \
    2>&1 | tee runs/real_demo/eval_r5.txt || true
  commit_one "Real-photo demo rerun WITH encode-time refinement (round-5 fine-tune, cli compare --refine-steps 100)" \
    runs/real_demo/compare_r5.txt runs/real_demo/compare_r5 \
    runs/real_demo/eval_r5.txt runs/real_demo/eval_r5 \
    runs/real_demo/train_r5/metrics.jsonl
fi

echo "== [3] stage-2 retrain from the new stage-1 (left: $(left)s) =="
L=$(left)
S2TMO=$(( L - 9600 ))   # reserve: RD ~2.2h + final bench + slack
if [ -n "$STAGE1" ] && [ "$S2TMO" -ge 1500 ]; then
  [ "$S2TMO" -gt 5400 ] && S2TMO=5400
  timeout "$S2TMO" python -m image_compression_2_tpu.cli train-gumbel \
    --output runs/r5stage2 --resolution 256 --generator-resolution 256 \
    --max-resolution 256 --batch-size 8 --epochs 10 --train-samples 4096 \
    --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
    --lr-decay --save-every 2 --val-samples 64 --seed 42 \
    --resume "$STAGE1" 2>&1 | tail -5 \
    || echo "WARNING: stage-2 incomplete (window $S2TMO s)" >&2
  if [ ! -e runs/r5stage2/gumbel_hvae_final.ic2t ] \
     && [ -e runs/r5stage2/gumbel_hvae_best.ic2t ]; then
    cp runs/r5stage2/gumbel_hvae_best.ic2t runs/r5stage2/gumbel_hvae_final.ic2t
    echo "promoted stage-2 best -> final"
  fi
  commit_one "Stage-2 retrain warm-started from the round-5 stage-1" \
    runs/r5stage2/metrics.jsonl runs/r5stage2/loss_curves.svg
fi
STAGE2=$(newest_ckpt runs/r5stage2 gumbel_hvae)
echo "stage-2 checkpoint: ${STAGE2:-<none>} (left: $(left)s)"

echo "== [4] RD table @256 (left: $(left)s) =="
L=$(left)
if   [ "$L" -ge 12600 ]; then NEVAL=64
elif [ "$L" -ge 9600 ];  then NEVAL=48
else                          NEVAL=32
fi
RDTMO=$(( L - 1800 ))   # keep the final-bench slot
[ "$RDTMO" -gt 8400 ] && RDTMO=8400
if [ -n "$STAGE1" ] && [ "$RDTMO" -ge 1200 ]; then
  timeout "$RDTMO" python tools/rd_table.py \
    --stage1 "$STAGE1" ${STAGE2:+--stage2 "$STAGE2"} \
    --res 256 --truncation 0.7 --n-eval "$NEVAL" --n-calib 48 --chunk 16 \
    --refine 100 --refine-lr "$REFLR" --uniform-cabac \
    --out RD_TABLE.md 2>&1 | tee runs/r5_rd_log.txt \
    || echo "WARNING: RD table exited non-zero (rows are flushed)" >&2
  commit_one "RD table at $NEVAL held-out samples (round-5 lineage: affine refined+CABAC, auto priors, per-layer+cabac)" \
    RD_TABLE.md RD_TABLE.json runs/r5_rd_log.txt
fi

echo "== [5] slack phases + final bench (left: $(left)s) =="
# 1024 flagship lane first when real slack remains: retrain (the restart
# wiped the trained checkpoint) + a small RD_1024 with coded/refined rows.
L=$(left)
if [ "$L" -ge 8100 ]; then
  timeout 2100 python -m image_compression_2_tpu.cli train \
    --output runs/r5stage1024 --resolution 1024 --generator-resolution 1024 \
    --max-resolution 1024 --batch-size 2 --epochs 6 --train-samples 256 \
    --truncation-psi 0.7 --w-weight 0.1 --lr-decay --bf16 --remat \
    --val-samples 8 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
    --save-every 2 --seed 42 2>&1 | tail -5 \
    || echo "WARNING: 1024 stage-1 incomplete" >&2
  if [ ! -e runs/r5stage1024/hvae_encoder_final.ic2t ] \
     && [ -e runs/r5stage1024/hvae_encoder_best.ic2t ]; then
    cp runs/r5stage1024/hvae_encoder_best.ic2t \
       runs/r5stage1024/hvae_encoder_final.ic2t
  fi
  commit_one "1024 flagship stage-1 retrain (round-5: restart wiped the trained checkpoint)" \
    runs/r5stage1024/metrics.jsonl runs/r5stage1024/loss_curves.svg
  S1024=$(newest_ckpt runs/r5stage1024 hvae_encoder)
  L=$(left)
  if [ -n "$S1024" ] && [ "$L" -ge 4800 ]; then
    if [ "$L" -ge 6600 ]; then NE1024=12; else NE1024=8; fi
    T1024=$(( L - 2400 ))
    [ "$T1024" -gt 4200 ] && T1024=4200
    timeout "$T1024" python tools/rd_table.py \
      --stage1 "$S1024" --res 1024 --truncation 0.7 \
      --n-eval "$NE1024" --n-calib 16 --chunk 4 \
      --refine 100 --refine-lr "$REFLR" --uniform-cabac \
      --out RD_1024.md 2>&1 | tee runs/r5_rd1024_log.txt \
      || echo "WARNING: RD_1024 exited non-zero (rows are flushed)" >&2
    commit_one "RD_1024 at $NE1024 held-out samples with coded+refined rows" \
      RD_1024.md RD_1024.json runs/r5_rd1024_log.txt
  fi
fi
L=$(left)
if [ "$L" -ge 5100 ]; then
  timeout 2400 python tools/bench_flrelu_layers.py --grad \
    --emit-policy --policy-configs 256:8 \
    2>&1 | tee runs/r5_policy_grad.txt \
    || echo "WARNING: grad sweep failed" >&2
  commit_one "fwd+bwd flrelu policy at 256:8 incl. hfuse" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5_policy_grad.txt
fi
L=$(left)
if [ "$L" -ge 3000 ]; then
  timeout 1500 python bench.py --res 1024 --batch 2 2>&1 \
    | tee runs/r5_bench_1024.txt || true
  commit_one "Flagship 1024 bench (round-5 policy)" runs/r5_bench_1024.txt
fi
L=$(left)
if [ "$L" -ge 600 ]; then
  timeout $(( L - 180 )) python bench.py 2>&1 | tee runs/r5_bench_final.txt || true
  commit_one "Final round-5 bench" runs/r5_bench_final.txt
fi

echo "r5c chain done at $(date -u) (left: $(left)s)"
