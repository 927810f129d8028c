#!/bin/bash
# Round-5 continuation supervisor, take 2 — after the first 1024 retrain
# OOMed (RESOURCE_EXHAUSTED surfaced at the epoch-1 metrics fetch; epoch 0
# trained fine and the identical recipe trained in round 4, so first retry
# the proven config, then fall back to batch 1).
#
# Phases (every timeout clamped to time left, commit each):
#   0. wait for the in-flight 256:8 hfuse policy sweep, commit it
#   1. bench; A/B-revert the policy if the re-swept winners regress it
#   2. 1024 flagship retrain (batch-2 retry -> batch-1 fallback)
#   3. RD_1024: 32-sample unrefined + 8-sample refined companion
#   4. real-photo demo rerun (fixed-step coded+refined row)
#   5. 4-bit lattice-QA coded row probe (--apply into RD_TABLE)
#   6. 1024:2 policy sweep + flagship bench guard
#   7. final double bench @256
# Usage: SWEEPPID=<pid> setsid nohup tools/run_r5g_chain.sh > runs/r5gchain_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

HARD_END=${HARD_END:-1787206500}
SWEEPPID=${SWEEPPID:-}
REFLR=0.02
left() { echo $(( HARD_END - $(date +%s) )); }

commit_one() {
  local msg="$1"; shift
  for p in "$@"; do git add -f "$p" 2>/dev/null || true; done
  git commit -m "$msg" --quiet || true
}

newest_ckpt() {
  local f
  f=$(ls -t "$1"/${2}_final.ic2t 2>/dev/null | head -1)
  [ -n "$f" ] && { echo "$f"; return; }
  f=$(ls -t "$1"/${2}_best.ic2t 2>/dev/null | head -1)
  [ -n "$f" ] && { echo "$f"; return; }
  ls -t "$1"/checkpoints/epoch_*.ic2t 2>/dev/null | head -1
}

echo "== [0] waiting for the 256:8 sweep (pid ${SWEEPPID:-<none>}) at $(date -u) =="
if [ -n "$SWEEPPID" ]; then
  while kill -0 "$SWEEPPID" 2>/dev/null; do sleep 30; done
fi
commit_one "Forward flrelu policy re-sweep @256:8: hfuse now lowers at the big layers (legal 128/256 lane tiles + padded channels)" \
  image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_policy_hfuse.txt

echo "== [1] bench + A/B guard (left: $(left)s) =="
if [ "$(left)" -ge 2400 ]; then
  timeout 1000 python bench.py 2>&1 | tee runs/r5f_bench_hfuse.txt || true
  VAL=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' runs/r5f_bench_hfuse.txt | tail -1)
  echo "bench with re-swept policy: ${VAL:-fail}"
  commit_one "Bench after the hfuse policy re-sweep (${VAL:-fail} img/s)" runs/r5f_bench_hfuse.txt
  WORSE=$(python -c "print(1 if not '${VAL:-}' or float('${VAL:-0}') < 70.5 else 0)")
  if [ "$WORSE" = "1" ] && [ -e /tmp/policy_before_hfuse.json ] \
     && [ "$(left)" -ge 2000 ]; then
    cp /tmp/policy_before_hfuse.json image_compression_2_tpu/ops/flrelu_policy.json
    timeout 1000 python bench.py 2>&1 | tee runs/r5f_bench_revert.txt || true
    VALB=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' runs/r5f_bench_revert.txt | tail -1)
    KEEPB=$(python -c "print(1 if '${VALB:-}' and float('${VALB:-0}') > float('${VAL:-0}') else 0)")
    if [ "$KEEPB" = "1" ]; then
      commit_one "Revert to the pre-sweep policy: re-swept winners regressed the bench ($VAL vs $VALB img/s)" \
        image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_bench_revert.txt
    else
      git checkout -- image_compression_2_tpu/ops/flrelu_policy.json
      commit_one "Policy A/B after hfuse re-sweep: new winners kept ($VAL vs ${VALB:-fail})" \
        runs/r5f_bench_revert.txt
    fi
  fi
fi

echo "== [2] 1024 flagship retrain, take 2 (left: $(left)s) =="
train1024() {  # train1024 <batch> <epochs> <outdir>
  timeout "$4" python -m image_compression_2_tpu.cli train \
    --output "$3" --resolution 1024 --generator-resolution 1024 \
    --max-resolution 1024 --batch-size "$1" --epochs "$2" --train-samples 256 \
    --truncation-psi 0.7 --w-weight 0.1 --lr-decay --bf16 --remat \
    --val-samples 8 --pool-grids 1,2,4 --hidden-dims 512,512,1024 \
    --save-every 2 --seed 42 2>&1 | tail -5
}
trained_epochs() { wc -l < "$1/metrics.jsonl" 2>/dev/null || echo 0; }
if [ "$(left)" -ge 12000 ]; then
  rm -rf runs/r5stage1024b
  T2=$(( $(left) - 9000 )); [ "$T2" -gt 4500 ] && T2=4500
  train1024 2 6 runs/r5stage1024b "$T2" \
    || echo "WARNING: batch-2 retry incomplete" >&2
  if [ "$(trained_epochs runs/r5stage1024b)" -lt 4 ] && [ "$(left)" -ge 8400 ]; then
    echo "batch-2 retry got <4 epochs — falling back to batch 1"
    rm -rf runs/r5stage1024b
    T1=$(( $(left) - 6000 )); [ "$T1" -gt 6600 ] && T1=6600
    train1024 1 6 runs/r5stage1024b "$T1" \
      || echo "WARNING: batch-1 fallback incomplete" >&2
  fi
  if [ ! -e runs/r5stage1024b/hvae_encoder_final.ic2t ] \
     && [ -e runs/r5stage1024b/hvae_encoder_best.ic2t ]; then
    cp runs/r5stage1024b/hvae_encoder_best.ic2t \
       runs/r5stage1024b/hvae_encoder_final.ic2t
  fi
  commit_one "1024 flagship stage-1 retrain take 2 ($(trained_epochs runs/r5stage1024b) epochs in metrics)" \
    runs/r5stage1024b/metrics.jsonl runs/r5stage1024b/loss_curves.svg \
    runs/r5stage1024b/hvae_encoder_best.ic2t
fi
S1024=$(newest_ckpt runs/r5stage1024b hvae_encoder)
# an untrained (baseline-only) checkpoint would make the tables meaningless
# (no earlier 1024 checkpoint survived the restarts — skip the tables then)
if [ "$(trained_epochs runs/r5stage1024b)" -lt 2 ]; then
  echo "WARNING: 1024 retrain has <2 trained epochs; skipping the RD_1024 tables"
  S1024=""
fi
echo "1024 checkpoint: ${S1024:-<none>}"

echo "== [3] RD_1024 tables (left: $(left)s) =="
if [ -n "$S1024" ] && [ "$(left)" -ge 7800 ]; then
  timeout 2700 python tools/rd_table.py \
    --stage1 "$S1024" --res 1024 --truncation 0.7 \
    --n-eval 32 --n-calib 16 --chunk 4 --uniform-cabac \
    --out RD_1024.md 2>&1 | tee runs/r5f_rd1024_log.txt \
    || echo "WARNING: RD_1024 exited non-zero (rows are flushed)" >&2
  commit_one "RD_1024: 32 held-out samples, uniform + CABAC rows" \
    RD_1024.md RD_1024.json runs/r5f_rd1024_log.txt
fi
L=$(left)
if [ -n "$S1024" ] && [ "$L" -ge 6600 ]; then
  T1024=$(( L - 4800 )); [ "$T1024" -gt 4200 ] && T1024=4200
  timeout "$T1024" python tools/rd_table.py \
    --stage1 "$S1024" --res 1024 --truncation 0.7 \
    --n-eval 8 --n-calib 16 --chunk 4 --uniform-cabac \
    --refine 100 --refine-lr "$REFLR" \
    --out RD_1024_refined.md 2>&1 | tee runs/r5f_rd1024r_log.txt \
    || echo "WARNING: refined RD_1024 exited non-zero" >&2
  commit_one "RD_1024 refined companion (8 samples, fixed-step refined+CABAC lanes)" \
    RD_1024_refined.md RD_1024_refined.json runs/r5f_rd1024r_log.txt
fi

echo "== [4] real-photo demo rerun (left: $(left)s) =="
DEMO_CKPT=$(newest_ckpt runs/real_demo/train_r5 hvae_encoder)
if [ -n "$DEMO_CKPT" ] && [ -e runs/real_demo/grace_256.png ] \
   && [ "$(left)" -ge 4500 ]; then
  timeout 1500 python -m image_compression_2_tpu.cli compare \
    --checkpoint "$DEMO_CKPT" \
    --image runs/real_demo/grace_256.png \
    --output runs/real_demo/compare_r5f --resolution 256 \
    --refine-steps 600 --refine-lr "$REFLR" \
    2>&1 | tee runs/real_demo/compare_r5f.txt \
    || echo "WARNING: fixed-step demo compare failed" >&2
  commit_one "Real-photo demo rerun: the cabac+refine row now rides the fixed-step grid with free-only inversion" \
    runs/real_demo/compare_r5f.txt runs/real_demo/compare_r5f
fi

echo "== [5] 4-bit lattice-QA coded row (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 3900 ]; then
  TMO=$(( L - 2400 )); [ "$TMO" -gt 6000 ] && TMO=6000
  timeout "$TMO" python tools/probe_qa4bit.py --apply \
    2>&1 | tee runs/r5f_qa4bit.txt \
    || echo "WARNING: qa4bit probe failed" >&2
  commit_one "4-bit lattice-QA coded row: quantization-aware refinement on the snapped fixed-step grid" \
    RD_TABLE.md RD_TABLE.json runs/r5f_qa4bit.txt
fi

echo "== [6] 1024:2 policy sweep + flagship bench (left: $(left)s) =="
if [ "$(left)" -ge 3600 ]; then
  cp image_compression_2_tpu/ops/flrelu_policy.json /tmp/policy_before_1024.json
  timeout 2400 python tools/bench_flrelu_layers.py --emit-policy \
    --policy-configs 1024:2 2>&1 | tee runs/r5f_policy_1024.txt \
    || echo "WARNING: 1024 policy sweep failed" >&2
  commit_one "Forward flrelu policy sweep @1024:2 with the fixed hfuse lane" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_policy_1024.txt
fi
if [ "$(left)" -ge 1800 ]; then
  timeout 1200 python bench.py --res 1024 --batch 2 \
    2>&1 | tee runs/r5f_bench_1024.txt || true
  V1=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' runs/r5f_bench_1024.txt | tail -1)
  echo "1024 bench: ${V1:-fail} (round-4: 7.94)"
  WORSE1=$(python -c "print(1 if not '${V1:-}' or float('${V1:-0}') < 7.94 else 0)")
  if [ "$WORSE1" = "1" ] && [ -e /tmp/policy_before_1024.json ]; then
    cp /tmp/policy_before_1024.json image_compression_2_tpu/ops/flrelu_policy.json
    commit_one "Revert the 1024 sweep winners: flagship bench regressed (${V1:-fail} vs 7.94 img/s)" \
      image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_bench_1024.txt
  else
    commit_one "1024 flagship bench after the policy sweep (${V1:-fail} img/s)" \
      runs/r5f_bench_1024.txt
  fi
fi

echo "== [7] final double bench @256 (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 900 ]; then
  timeout $(( L > 1380 ? 1200 : L - 180 )) python bench.py \
    2>&1 | tee runs/r5f_bench_final.txt || true
  commit_one "Round-5 continuation final bench" runs/r5f_bench_final.txt
fi
L=$(left)
if [ "$L" -ge 900 ]; then
  timeout $(( L > 1380 ? 1200 : L - 180 )) python bench.py \
    2>&1 | tee runs/r5f_bench_final2.txt || true
  commit_one "Round-5 continuation final bench, second sample" runs/r5f_bench_final2.txt
fi
echo "r5g chain done at $(date -u) (left: $(left)s)"
