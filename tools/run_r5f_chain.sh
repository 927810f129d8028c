#!/bin/bash
# Round-5 continuation supervisor (take 6) — after the fixed-step refined
# grid landed (quant/uniform.py fixed_step_levels + codec/uniform_cabac.py).
#
# Phases (judge priority, every timeout clamped to time left, commit each):
#   1. RD table regen @256, 32 samples — the refined+CABAC headline rows now
#      ride the fixed-step grid (target: within 0.5 dB of the float refined
#      row at <= 1.0 bpp, closing round-5's 3.9 dB residual)
#   2. 1024 flagship retrain (lost to the 06:39 restart) + RD_1024 with
#      32 held-out samples (+ refined companion)       (r4 VERDICT #5)
#   3. bench regression guard
#
# Usage:  setsid nohup tools/run_r5f_chain.sh > runs/r5fchain_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

# driver round start ~18:55 UTC Aug 19 + 12 h = 06:55 Aug 20, minus a 40-min
# buffer for the driver's own bench.
HARD_END=${HARD_END:-1787206500}
REFLR=0.02

left() { echo $(( HARD_END - $(date +%s) )); }

commit_one() {  # commit_one <message> <path>...
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

STAGE1=$(newest_ckpt runs/r5stage1 hvae_encoder)
STAGE2=$(newest_ckpt runs/r5stage2 gumbel_hvae)
echo "stage-1: ${STAGE1:-<none>}   stage-2: ${STAGE2:-<none>}"

echo "== [1] RD table @256, 32 samples, fixed-step refined grid (left: $(left)s) =="
# reserve: 1024 lane ~ 6000+1800+3600 + bench 1200 + 600 slack
RDTMO=$(( $(left) - 13200 ))
[ "$RDTMO" -gt 7200 ] && RDTMO=7200
if [ -n "$STAGE1" ] && [ "$RDTMO" -ge 1800 ]; then
  timeout "$RDTMO" python tools/rd_table.py \
    --stage1 "$STAGE1" ${STAGE2:+--stage2 "$STAGE2"} \
    --res 256 --truncation 0.7 --n-eval 32 --n-calib 48 --chunk 16 \
    --refine 100 --refine-lr "$REFLR" --uniform-cabac \
    --out RD_TABLE.md 2>&1 | tee runs/r5f_rd_log.txt \
    || echo "WARNING: RD table exited non-zero (rows are flushed)" >&2
  commit_one "RD table regen: refined+CABAC rows on the fixed-step grid (32 held-out samples)" \
    RD_TABLE.md RD_TABLE.json runs/r5f_rd_log.txt
fi

echo "== [2] 1024 flagship retrain + RD_1024 (left: $(left)s) =="
if [ "$(left)" -ge 9000 ]; then
  T1TMO=$(( $(left) - 6600 ))
  [ "$T1TMO" -gt 7200 ] && T1TMO=7200
  timeout "$T1TMO" python -m image_compression_2_tpu.cli train \
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
  commit_one "1024 flagship stage-1 retrain (round-5 continuation: the 06:39 restart wiped the first run)" \
    runs/r5stage1024/metrics.jsonl runs/r5stage1024/loss_curves.svg \
    runs/r5stage1024/hvae_encoder_best.ic2t
fi
S1024=$(newest_ckpt runs/r5stage1024 hvae_encoder)
if [ -n "$S1024" ] && [ "$(left)" -ge 4800 ]; then
  timeout 2400 python tools/rd_table.py \
    --stage1 "$S1024" --res 1024 --truncation 0.7 \
    --n-eval 32 --n-calib 16 --chunk 4 --uniform-cabac \
    --out RD_1024.md 2>&1 | tee runs/r5f_rd1024_log.txt \
    || echo "WARNING: RD_1024 exited non-zero (rows are flushed)" >&2
  commit_one "RD_1024: 32 held-out samples, uniform + CABAC rows (CIs <= +-1 dB target)" \
    RD_1024.md RD_1024.json runs/r5f_rd1024_log.txt
fi
L=$(left)
if [ -n "$S1024" ] && [ "$L" -ge 3600 ]; then
  T1024=$(( L - 1800 ))
  [ "$T1024" -gt 4500 ] && T1024=4500
  timeout "$T1024" python tools/rd_table.py \
    --stage1 "$S1024" --res 1024 --truncation 0.7 \
    --n-eval 8 --n-calib 16 --chunk 4 --uniform-cabac \
    --refine 100 --refine-lr "$REFLR" \
    --out RD_1024_refined.md 2>&1 | tee runs/r5f_rd1024r_log.txt \
    || echo "WARNING: refined RD_1024 exited non-zero" >&2
  commit_one "RD_1024 refined companion (8 samples, fixed-step refined+CABAC lanes)" \
    RD_1024_refined.md RD_1024_refined.json runs/r5f_rd1024r_log.txt
fi

echo "== [2.5] real-photo demo: coded+refined row on the fixed-step grid (left: $(left)s) =="
DEMO_CKPT=$(newest_ckpt runs/real_demo/train_r5 hvae_encoder)
[ -z "$DEMO_CKPT" ] && DEMO_CKPT="$STAGE1"
if [ -n "$DEMO_CKPT" ] && [ -e runs/real_demo/grace_256.png ] \
   && [ "$(left)" -ge 3000 ]; then
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

echo "== [3] bench, twice (variance estimate; left: $(left)s) =="
# The policy winner tables are byte-identical to round-4 close, so the
# round-5 bench drift (68.8-71.2 vs the driver's 72.74) is relay/day
# variance, not a config regression.  Measure twice for a spread estimate.
L=$(left)
if [ "$L" -ge 900 ]; then
  timeout $(( L > 1380 ? 1200 : L - 180 )) python bench.py \
    2>&1 | tee runs/r5f_bench_final.txt || true
  commit_one "Round-5 continuation bench" runs/r5f_bench_final.txt
fi
L=$(left)
if [ "$L" -ge 900 ]; then
  timeout $(( L > 1380 ? 1200 : L - 180 )) python bench.py \
    2>&1 | tee runs/r5f_bench_final2.txt || true
  commit_one "Round-5 continuation bench, second sample" runs/r5f_bench_final2.txt
fi

echo "r5f chain done at $(date -u) (left: $(left)s)"
