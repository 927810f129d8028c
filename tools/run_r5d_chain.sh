#!/bin/bash
# Round-5 supervisor, take 4 — rebalanced replacement for run_r5c_chain.sh.
# Take 3's phase-3 reserve (9600 s) was bigger than the slack that will
# exist when the demo phase ends, so stage-2 — and with it every gumbel row
# of the regenerated RD table — would have been silently skipped.  This
# version funds stage-2 by (a) sweeping 256:8 only (the 1024 lane keeps its
# committed round-4 policy + bench numbers), and (b) trimming stage-2 to
# 2048 samples x 8 epochs (~50 min measured extrapolation from the round-4
# 4096-sample epoch time of ~600 s).
#
# Phases (judge priority, every timeout clamped to time left, commit each):
#   1. forward flrelu policy sweep @256:8 incl. hfuse + layerfuse sweep + bench
#   1.5 refine-lr probe on the real model
#   2. real-photo demo: fine-tune + compare --refine-steps + eval (VERDICT #2)
#   3. stage-2 retrain (2048x8) warm-started from the new stage-1
#   4. RD table @256 with affine refined+CABAC / per-layer+cabac + gumbel rows
#   5. slack: grad sweep / 1024 lane when time remains + final 256 bench
#
# Usage:
#   S1PID=<pid> setsid nohup tools/run_r5d_chain.sh > runs/r5chain2_log.txt 2>&1 &
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

echo "== [1] forward policy sweep w/ hfuse + layerfuse @256:8 (left: $(left)s) =="
CFGS="256:8"
if [ "$(left)" -ge 4500 ]; then
  timeout 2400 python tools/bench_flrelu_layers.py --emit-policy \
    --policy-configs "$CFGS" 2>&1 | tee runs/r5_policy_fwd.txt \
    || echo "WARNING: policy sweep failed" >&2
  commit_one "Forward flrelu policy sweep incl. hfuse ($CFGS)" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5_policy_fwd.txt
fi
if [ "$(left)" -ge 3600 ]; then
  # whole-layer fusion sweep (conv+flrelu in one pallas_call): fills the
  # policy's `layers` table that SynthesisLayer consults on the forward path
  timeout 1800 python tools/bench_layerfuse.py --emit-policy \
    --policy-configs "$CFGS" 2>&1 | tee runs/r5_policy_layerfuse.txt \
    || echo "WARNING: layerfuse sweep failed" >&2
  commit_one "Whole-layer fusion policy sweep ($CFGS)" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5_policy_layerfuse.txt
fi
if [ "$(left)" -ge 2400 ]; then
  timeout 1200 python bench.py 2>&1 | tee runs/r5_bench_after_policy.txt || true
  commit_one "Bench after round-5 policy sweeps (flrelu modes + layer fusion)" \
    runs/r5_bench_after_policy.txt
fi

echo "== [1.5] refine-lr probe (left: $(left)s) =="
# Tiny-config CPU A/B showed constant 0.05 beating the 0.02 default by ~2 dB
# at 100 steps; settle it on the real model so every refined row downstream
# (demo + RD table) rides the winner.
REFLR=0.02
if [ -n "$STAGE1" ] && [ "$(left)" -ge 3000 ]; then
  timeout 1200 python tools/probe_refine_lr.py --stage1 "$STAGE1" \
    2>&1 | tee runs/r5_refine_lr.txt \
    || echo "WARNING: refine-lr probe failed (keeping 0.02)" >&2
  best=$(sed -n 's/^BEST_LR \([0-9.]*\)$/\1/p' runs/r5_refine_lr.txt | tail -1)
  [ -n "$best" ] && REFLR="$best"
  echo "refine lr for demo + RD: $REFLR"
  commit_one "Refine-lr probe on the real 256 model (winner: $REFLR)" \
    runs/r5_refine_lr.txt
fi

echo "== [2] real-photo demo: fine-tune + refined compare (left: $(left)s) =="
if [ -n "$STAGE1" ] && [ "$(left)" -ge 3600 ]; then
  timeout 1200 python -m image_compression_2_tpu.cli train \
    --output runs/real_demo/train_r5 --resolution 256 \
    --generator-resolution 256 --max-resolution 256 --batch-size 8 \
    --epochs 12 --dataset runs/real_demo/data \
    --val-dataset runs/real_demo/data_val --w-weight 0 --lr 3e-5 \
    --bf16 --save-every 2 --seed 42 \
    --resume "$STAGE1" 2>&1 | tail -5 || true
  DEMO_CKPT=$(newest_ckpt runs/real_demo/train_r5 hvae_encoder)
  [ -z "$DEMO_CKPT" ] && DEMO_CKPT="$STAGE1"
  timeout 2100 python -m image_compression_2_tpu.cli compare \
    --checkpoint "$DEMO_CKPT" \
    --image runs/real_demo/grace_256.png \
    --output runs/real_demo/compare_r5 --resolution 256 \
    --refine-steps 100 --refine-lr "$REFLR" \
    2>&1 | tee runs/real_demo/compare_r5.txt \
    || echo "WARNING: real demo compare failed" >&2
  timeout 600 python -m image_compression_2_tpu.cli eval \
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
# reserve: RD-table minimum (4200) + final bench (1200) + slack (600)
S2TMO=$(( $(left) - 6000 ))
if [ -n "$STAGE1" ] && [ "$S2TMO" -ge 1500 ]; then
  [ "$S2TMO" -gt 3600 ] && S2TMO=3600
  timeout "$S2TMO" python -m image_compression_2_tpu.cli train-gumbel \
    --output runs/r5stage2 --resolution 256 --generator-resolution 256 \
    --max-resolution 256 --batch-size 8 --epochs 8 --train-samples 2048 \
    --truncation-psi 0.5,0.7,1.0 --w-weight 0.1 --n-embeddings 256 --bf16 \
    --lr-decay --save-every 2 --val-samples 64 --seed 42 \
    --resume "$STAGE1" 2>&1 | tail -5 \
    || echo "WARNING: stage-2 incomplete (window $S2TMO s)" >&2
  if [ ! -e runs/r5stage2/gumbel_hvae_final.ic2t ] \
     && [ -e runs/r5stage2/gumbel_hvae_best.ic2t ]; then
    cp runs/r5stage2/gumbel_hvae_best.ic2t runs/r5stage2/gumbel_hvae_final.ic2t
    echo "promoted stage-2 best -> final"
  fi
  commit_one "Stage-2 retrain warm-started from the round-5 stage-1 (2048x8 window)" \
    runs/r5stage2/metrics.jsonl runs/r5stage2/loss_curves.svg
fi
STAGE2=$(newest_ckpt runs/r5stage2 gumbel_hvae)
echo "stage-2 checkpoint: ${STAGE2:-<none>} (left: $(left)s)"

echo "== [4] RD table @256 (left: $(left)s) =="
L=$(left)
if   [ "$L" -ge 12000 ]; then NEVAL=48
elif [ "$L" -ge 7200 ];  then NEVAL=32
else                          NEVAL=24
fi
RDTMO=$(( L - 1800 ))   # keep the final-bench slot
[ "$RDTMO" -gt 7200 ] && RDTMO=7200
if [ -n "$STAGE1" ] && [ "$RDTMO" -ge 1200 ]; then
  timeout "$RDTMO" python tools/rd_table.py \
    --stage1 "$STAGE1" ${STAGE2:+--stage2 "$STAGE2"} \
    --res 256 --truncation 0.7 --n-eval "$NEVAL" --n-calib 48 --chunk 16 \
    --refine 100 --refine-lr "$REFLR" --uniform-cabac \
    --out RD_TABLE.md 2>&1 | tee runs/r5_rd_log.txt \
    || echo "WARNING: RD table exited non-zero (rows are flushed)" >&2
  commit_one "RD table at $NEVAL held-out samples (round-5 lineage: affine refined+CABAC, auto priors, per-layer+cabac, gumbel rows)" \
    RD_TABLE.md RD_TABLE.json runs/r5_rd_log.txt
fi

echo "== [5] slack: 1024 flagship lane (left: $(left)s) =="
# VERDICT #5 wants RD_1024 uniform rows with CIs <= +-1 dB (>=32 samples).
# The restart wiped the trained 1024 checkpoint, so: retrain (~2100 s), then
# an UNREFINED coded table at 32 samples (cheap: no refinement backwards),
# then opportunistically a small refined companion table.
if [ "$(left)" -ge 5400 ]; then
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
  if [ -n "$S1024" ] && [ "$(left)" -ge 3300 ]; then
    timeout 1800 python tools/rd_table.py \
      --stage1 "$S1024" --res 1024 --truncation 0.7 \
      --n-eval 32 --n-calib 16 --chunk 4 --uniform-cabac \
      --out RD_1024.md 2>&1 | tee runs/r5_rd1024_log.txt \
      || echo "WARNING: RD_1024 exited non-zero (rows are flushed)" >&2
    commit_one "RD_1024: 32 held-out samples, uniform + CABAC rows (unrefined lanes, tight CIs)" \
      RD_1024.md RD_1024.json runs/r5_rd1024_log.txt
  fi
  L=$(left)
  if [ -n "$S1024" ] && [ "$L" -ge 3000 ]; then
    T1024=$(( L - 1500 ))
    [ "$T1024" -gt 3600 ] && T1024=3600
    timeout "$T1024" python tools/rd_table.py \
      --stage1 "$S1024" --res 1024 --truncation 0.7 \
      --n-eval 8 --n-calib 16 --chunk 4 --uniform-cabac \
      --refine 100 --refine-lr "$REFLR" \
      --out RD_1024_refined.md 2>&1 | tee runs/r5_rd1024r_log.txt \
      || echo "WARNING: refined RD_1024 exited non-zero" >&2
    commit_one "RD_1024 refined companion table (8 samples, refine+CABAC lanes)" \
      RD_1024_refined.md RD_1024_refined.json runs/r5_rd1024r_log.txt
  fi
fi
if [ "$(left)" -ge 5100 ]; then
  timeout 2400 python tools/bench_flrelu_layers.py --grad \
    --emit-policy --policy-configs 256:8 \
    2>&1 | tee runs/r5_policy_grad.txt \
    || echo "WARNING: grad sweep failed" >&2
  commit_one "fwd+bwd flrelu policy at 256:8 incl. hfuse" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5_policy_grad.txt
fi
L=$(left)
if [ "$L" -ge 600 ]; then
  timeout $(( L - 180 )) python bench.py 2>&1 | tee runs/r5_bench_final.txt || true
  commit_one "Final round-5 bench" runs/r5_bench_final.txt
fi

echo "r5d chain done at $(date -u) (left: $(left)s)"
