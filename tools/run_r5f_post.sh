#!/bin/bash
# Post-chain follow-on: when run_r5f_chain.sh exits, the chip is free —
#   1. flrelu policy sweep @256:8: the hfuse lane now LOWERS at the big
#      layers (round-5 sweep had it Mosaic-failing there; the Ct=64 block
#      was lane-illegal) — re-measure winners with legal 128/256 tiles
#   2. bench; A/B-revert the policy file if the new winners regress it
#   3. 4-bit lattice-QA coded row probe (tools/probe_qa4bit.py --apply)
# Usage: CHAINPID=<real chain pid> setsid nohup tools/run_r5f_post.sh > runs/r5fpost_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

HARD_END=${HARD_END:-1787206500}
CHAINPID=${CHAINPID:-}
left() { echo $(( HARD_END - $(date +%s) )); }

commit_one() {
  local msg="$1"; shift
  for p in "$@"; do git add -f "$p" 2>/dev/null || true; done
  git commit -m "$msg" --quiet || true
}

echo "== waiting for chain pid ${CHAINPID:-<none>} at $(date -u) =="
if [ -n "$CHAINPID" ]; then
  while kill -0 "$CHAINPID" 2>/dev/null; do sleep 60; done
fi
echo "== chain done at $(date -u) (left: $(left)s) =="

echo "== [1] flrelu policy sweep @256:8 with the fixed hfuse lane (left: $(left)s) =="
if [ "$(left)" -ge 9000 ]; then
  cp image_compression_2_tpu/ops/flrelu_policy.json /tmp/policy_before_hfuse.json
  timeout 3600 python tools/bench_flrelu_layers.py --emit-policy \
    --policy-configs 256:8 2>&1 | tee runs/r5f_policy_hfuse.txt \
    || echo "WARNING: hfuse policy sweep failed" >&2
  commit_one "Forward flrelu policy re-sweep @256:8: hfuse now lowers at the big layers (legal 128/256 lane tiles + padded channels)" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_policy_hfuse.txt

  echo "== [2] bench + A/B guard (left: $(left)s) =="
  timeout 1000 python bench.py 2>&1 | tee runs/r5f_bench_hfuse.txt || true
  VAL=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' runs/r5f_bench_hfuse.txt | tail -1)
  echo "bench with re-swept policy: ${VAL:-fail}"
  commit_one "Bench after the hfuse policy re-sweep" runs/r5f_bench_hfuse.txt
  BASE=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' runs/r5f_bench_final.txt 2>/dev/null | tail -1)
  WORSE=$(python -c "print(1 if not '${VAL:-}' or ('${BASE:-}' and float('${VAL:-0}') < float('${BASE:-0}') - 0.7) else 0)")
  if [ "$WORSE" = "1" ] && [ "$(left)" -ge 2000 ]; then
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

echo "== [3] 4-bit lattice-QA coded row (left: $(left)s) =="
L=$(left)
if [ "$L" -ge 5400 ]; then
  TMO=$(( L - 3600 )); [ "$TMO" -gt 6000 ] && TMO=6000
  timeout "$TMO" python tools/probe_qa4bit.py --apply \
    2>&1 | tee runs/r5f_qa4bit.txt \
    || echo "WARNING: qa4bit probe failed" >&2
  commit_one "4-bit lattice-QA coded row: quantization-aware refinement on the snapped fixed-step grid" \
    RD_TABLE.md RD_TABLE.json runs/r5f_qa4bit.txt
fi

echo "== [4] flrelu policy sweep @1024:2 (hfuse never measured there; left: $(left)s) =="
if [ "$(left)" -ge 3300 ]; then
  cp image_compression_2_tpu/ops/flrelu_policy.json /tmp/policy_before_1024.json
  timeout 2700 python tools/bench_flrelu_layers.py --emit-policy \
    --policy-configs 1024:2 2>&1 | tee runs/r5f_policy_1024.txt \
    || echo "WARNING: 1024 policy sweep failed" >&2
  commit_one "Forward flrelu policy sweep @1024:2 with the fixed hfuse lane" \
    image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_policy_1024.txt
fi
if [ "$(left)" -ge 1500 ]; then
  timeout 1200 python bench.py --res 1024 --batch 2 \
    2>&1 | tee runs/r5f_bench_1024.txt || true
  V1=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' runs/r5f_bench_1024.txt | tail -1)
  echo "1024 bench: ${V1:-fail} (round-4: 7.94)"
  WORSE1=$(python -c "print(1 if not '${V1:-}' or float('${V1:-0}') < 7.94 else 0)")
  if [ "$WORSE1" = "1" ] && [ -e /tmp/policy_before_1024.json ]; then
    cp /tmp/policy_before_1024.json image_compression_2_tpu/ops/flrelu_policy.json
    echo "1024 sweep regressed the flagship bench — reverted the policy file"
    commit_one "Revert the 1024 sweep winners: flagship bench regressed (${V1:-fail} vs 7.94 img/s)" \
      image_compression_2_tpu/ops/flrelu_policy.json runs/r5f_bench_1024.txt
  else
    commit_one "1024 flagship bench after the policy sweep (${V1:-fail} img/s)" \
      runs/r5f_bench_1024.txt
  fi
fi
echo "r5f post done at $(date -u) (left: $(left)s)"
