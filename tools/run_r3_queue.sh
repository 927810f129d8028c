#!/bin/bash
# Round-3 chip queue, launched after the stage-2 chain (run_stage2_r3.sh)
# exits.  ONE TPU job at a time; this chains the three next jobs so the chip
# never idles:
#   1. FIR-variant microbench (perf attribution for the matmul flrelu)
#   2. Full refined RD table: stage-1 + stage-2, refine-100 rows, alloc sweep
#      (VERDICT items 2 + 5 artifacts)
#   3. Heads-vs-data ablation (VERDICT item 1's "Done" criterion)
# Launch detached:
#   setsid nohup tools/run_r3_queue.sh > runs/r3queue_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

echo "== [1/3] fir variants =="
python tools/bench_fir_variants.py --res 256 --batch 8 \
  2>&1 | tee runs/r3_fir_variants_256.txt
python tools/bench_fir_variants.py --res 1024 --batch 2 \
  2>&1 | tee runs/r3_fir_variants_1024.txt

echo "== [2/3] refined RD table =="
python tools/rd_table.py \
  --stage1 runs/r3stage1/hvae_encoder_final.ic2t \
  --stage2 runs/r3stage2/gumbel_hvae_final.ic2t \
  --res 256 --truncation 0.7 --n-eval 16 --n-calib 48 \
  --refine 100 --alloc-sweep \
  --out RD_TABLE.md

echo "== [3/3] heads ablation =="
tools/run_ablation_heads.sh

echo "r3 queue done"
