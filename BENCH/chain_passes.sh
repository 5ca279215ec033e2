#!/bin/bash
# Chain scaling-only bench passes back-to-back, committing the quiet-state
# after each, until the histories converge on both levels or $1 passes run.
# Usage: BENCH/chain_passes.sh <first-pass-no> <last-pass-no>
set -u
cd "$(dirname "$0")/.."
for i in $(seq -w "$1" "$2"); do
  log="BENCH/attempts/r5_pass$i.log"
  [ -e "$log" ] && continue
  SPARK_GRAFT_TRIALS=4 SPARK_GRAFT_BENCH_BUDGET=430 \
    sbt -batch "runMain graft.Bench" > "$log" 2>&1
  # the JSON result line precedes sbt's "[success]" trailer — scan the log
  ev=$(grep -ao '"scalingEvidence":"[^"]*"' "$log" | tail -1)
  git add BENCH/quiet_state.json BENCH/query_state.json BENCH/BASELINE.md "$log" BENCH/attempts 2>/dev/null
  git commit -q -m "Bench pass $i: ${ev:-no-result}

No-Verification-Needed: bench artifacts only" || true
  if echo "$ev" | grep -q converged-quiet; then
    echo "CONVERGED at pass $i" >> BENCH/attempts/chain_status.txt
    break
  fi
done
echo "chain done $(date -Is)" >> BENCH/attempts/chain_status.txt
