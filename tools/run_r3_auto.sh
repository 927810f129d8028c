#!/bin/bash
# Round-3 auto-orchestrator: waits for the in-flight run_r3_chain2.sh to
# finish (ONE TPU job at a time), then runs the perf window and chain part B
# back-to-back so no chip time is wasted between phases.
#
# The perf window (flrelu policy sweep + bench + MFU) and chain2b (1024
# flagship + ablation, both trained from scratch) do NOT depend on chain2a's
# later steps succeeding, so a late chain2a failure only logs a warning —
# the chip keeps working either way.
#   setsid nohup tools/run_r3_auto.sh > runs/r3auto_log.txt 2>&1 &
set -u
cd "$(dirname "$0")/.."

CHAIN_LOG=runs/r3chain2r_log.txt

# Wait for the chain2a process tree to exit (match the exact script path,
# never pattern-kill; we only *read* the pid).
while pgrep -x -f "/bin/bash tools/run_r3_chain2r.sh" > /dev/null; do
  sleep 60
done

if ! grep -q "r3 chain2a done" "$CHAIN_LOG"; then
  echo "WARNING: chain2a did NOT reach its done marker — continuing anyway" >&2
  tail -20 "$CHAIN_LOG" >&2
fi

echo "== chain2a exited at $(date -u) — starting perf window =="
bash tools/run_r3_perf.sh > runs/r3perf_log.txt 2>&1 \
  || echo "WARNING: perf window exited nonzero (see runs/r3perf_log.txt)" >&2
echo "== perf window done at $(date -u) — starting chain2b =="
bash tools/run_r3_chain2b.sh > runs/r3chain2b_log.txt 2>&1 \
  || echo "WARNING: chain2b exited nonzero (see runs/r3chain2b_log.txt)" >&2
echo "== r3 auto chain fully done at $(date -u) =="
