#!/bin/bash
# Round-4 post-chain queue: waits for the round-3 auto chain (chain2a ->
# perf window -> chain2b) to fully exit, then lands the round-4 closure
# artifacts on the freed chip:
#   1. The BIG held-out RD table (n-eval 128 + 95% CIs) from the finished
#      round-3/4 lineage, incl. refine / alloc-sweep / uniform-cabac rows.
#   2. The real-photo end-to-end demo: folder fine-tune on real 256² crops
#      (grace_hopper/china/flower), then cli compare + eval on the portrait.
#   3. Flagship 1024 bench number.
# Each phase commits its artifacts and failures don't block later phases.
#   setsid nohup tools/run_r4_post.sh > runs/r4post_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

commit_artifacts() {  # commit_artifacts <message> <path>...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null || true
  git commit -m "$msg" --quiet || true
}

while pgrep -x -f "/bin/bash tools/run_r3_auto.sh" > /dev/null; do
  sleep 60
done
echo "== r3 auto chain exited at $(date -u) — starting round-4 post queue =="

echo "== [1/3] big RD table (n-eval 128, CIs) =="
python tools/rd_table.py \
  --stage1 runs/r3stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r3stage2/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 128 --n-calib 48 --chunk 16 \
  --refine 100 --alloc-sweep --uniform-cabac \
  --out RD_TABLE.md \
  && commit_artifacts "RD table at 128 held-out samples with 95% CIs (round-4 lineage)" \
       RD_TABLE.md RD_TABLE.json \
  || echo "WARNING: big RD table failed" >&2

echo "== [2/3] real-photo demo =="
python tools/make_real_folder.py --out runs/real_demo \
  && python -m image_compression_2_tpu.cli train \
       --output runs/real_demo/train --resolution 256 \
       --generator-resolution 256 --max-resolution 256 --batch-size 8 \
       --epochs 40 --dataset runs/real_demo/data \
       --val-dataset runs/real_demo/data_val --w-weight 0 --lr 3e-5 \
       --bf16 --save-every 4 --seed 42 \
       --resume runs/r3stage1/hvae_encoder_final.ic2t \
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
  || echo "WARNING: real demo failed" >&2
commit_artifacts "Real-photo end-to-end demo: folder fine-tune + compare/eval on a real portrait" \
  runs/real_demo/compare.txt runs/real_demo/eval.txt runs/real_demo/grace_256.png \
  runs/real_demo/train/metrics.jsonl runs/real_demo/train/loss_curves.svg \
  runs/real_demo/compare runs/real_demo/eval

echo "== [3/3] flagship 1024 bench =="
python bench.py --res 1024 --batch 2 2>&1 | tee runs/r4_bench1024.txt \
  || echo "WARNING: 1024 bench failed" >&2
commit_artifacts "Flagship 1024 bench number (round 4)" runs/r4_bench1024.txt

echo "r4 post queue done at $(date -u)"
