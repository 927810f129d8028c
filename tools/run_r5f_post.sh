#!/bin/bash
# Post-chain follow-on: when run_r5f_chain.sh's process exits, probe the
# 4-bit lattice-QA coded row (tools/probe_qa4bit.py) on the freed chip and
# fold the winner into RD_TABLE.md/json.
# Usage: CHAINPID=$(cat /tmp/r5fchain.pid) setsid nohup tools/run_r5f_post.sh > runs/r5fpost_log.txt 2>&1 &
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

L=$(left)
if [ "$L" -ge 2400 ]; then
  TMO=$(( L - 900 )); [ "$TMO" -gt 6000 ] && TMO=6000
  timeout "$TMO" python tools/probe_qa4bit.py --apply \
    2>&1 | tee runs/r5f_qa4bit.txt \
    || echo "WARNING: qa4bit probe failed" >&2
  commit_one "4-bit lattice-QA coded row: quantization-aware refinement on the snapped fixed-step grid" \
    RD_TABLE.md RD_TABLE.json runs/r5f_qa4bit.txt
fi
echo "r5f post done at $(date -u) (left: $(left)s)"
