#!/bin/bash
# Round-3 perf window — run AFTER tools/run_r3_chain2.sh finishes and BEFORE
# tools/run_r3_chain2b.sh (ONE TPU job at a time):
#   1. Per-layer flrelu sweep incl. the new sandwich + mmfuse2 modes; emits
#      ops/flrelu_policy.json so mode='auto' picks measured winners.
#   2. Headline bench with the new policy.
#   3. MFU decomposition at the measured throughput.
#   setsid nohup tools/run_r3_perf.sh > runs/r3perf_log.txt 2>&1 &
set -e
cd "$(dirname "$0")/.."

echo "== [1/3] flrelu policy sweep (matmul/sandwich/mmfuse2/conv) =="
python tools/bench_flrelu_layers.py --emit-policy \
  2>&1 | tee runs/r3_policy3_log.txt

echo "== [1b/3] fwd+bwd timing (training path; BWD_FUSED decision data) =="
python tools/bench_flrelu_layers.py --grad --modes matmul,sandwich,mmfuse2,mmfuse3 \
  --res 256 --batch 8 2>&1 | tee runs/r3_grad_timing.txt || true

echo "== [2/3] headline bench =="
python bench.py | tee runs/r3_bench_after_policy.txt

echo "== [3/3] MFU =="
IMGS=$(python - <<'EOF'
import json
line = [l for l in open('runs/r3_bench_after_policy.txt') if '"metric"' in l][-1]
print(json.loads(line)["value"])
EOF
)
python tools/mfu.py --res 256 --imgs-per-sec "$IMGS" \
  2>&1 | tee runs/r3_mfu.txt

git add -f image_compression_2_tpu/ops/flrelu_policy.json \
  runs/r3_policy3_log.txt runs/r3_bench_after_policy.txt runs/r3_mfu.txt \
  2>/dev/null || true
git commit -qm "Re-measure flrelu policy with sandwich+mmfuse2 candidates; refresh bench/MFU" || true

# (the former step 4 — RD regeneration with --uniform-cabac — moved into
# tools/run_r3_chain2r.sh's own rd_table step)
echo "r3 perf window done — launch tools/run_r3_chain2b.sh next"
