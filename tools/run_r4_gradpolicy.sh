#!/bin/bash
# Round-4 follow-up chip window — run AFTER tools/run_r4_main.sh exits
# (ONE TPU job at a time).  Measures the fwd+bwd winner table at both
# deployment training configs so flrelu_policy's winners_grad is measured,
# not inferred, at 256²b8 AND 1024²b2; then re-times the headline bench with
# the final policy.
#   setsid nohup tools/run_r4_gradpolicy.sh > runs/r4gradpolicy_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

while pgrep -x -f "/bin/bash tools/run_r4_main.sh" > /dev/null; do
  sleep 60
done
echo "== r4 main queue exited at $(date -u) — grad-policy window =="

echo "== [1/2] fwd+bwd policy sweep (winners_grad lane) =="
python tools/bench_flrelu_layers.py --grad --emit-policy \
  --modes matmul,sandwich,blocked,mmfuse2,mmfuse3,conv \
  --policy-configs 256:8,1024:2 \
  2>&1 | tee runs/r4_gradpolicy_sweep.txt

echo "== [2/2] headline bench (policy unchanged on the fwd side; sanity) =="
python bench.py | tee runs/r4_bench_final.txt

git add -f image_compression_2_tpu/ops/flrelu_policy.json \
  runs/r4_gradpolicy_sweep.txt runs/r4_bench_final.txt 2>/dev/null || true
git commit -qm "Measure the fwd+bwd flrelu winner table at both training configs (256:8, 1024:2)" || true
echo "r4 grad-policy window done at $(date -u)"
