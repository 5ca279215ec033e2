#!/bin/bash
# Round-6 convergence chain: FULL bench passes (queries + scaling) so both
# the per-query quiet minima and the scaling histories accumulate under the
# round-6 build fingerprint. Commits the state after each pass.
# Usage: BENCH/chain_r06.sh <first-pass-no> <last-pass-no>
set -u
cd "$(dirname "$0")/.."
for i in $(seq -w "$1" "$2"); do
  log="BENCH/attempts/r6_pass$i.log"
  [ -e "$log" ] && continue
  sbt -batch "runMain graft.Bench" > "$log" 2>&1
  ev=$(grep -ao '"scalingEvidence":"[^"]*"' "$log" | tail -1)
  tot=$(grep -ao '"metric":"total","value":[0-9.]*' "$log" | tail -1 | grep -o '[0-9.]*$')
  git add BENCH/quiet_state.json BENCH/query_state.json BENCH/BASELINE.md "$log" BENCH/attempts 2>/dev/null
  git commit -q -m "Bench pass $i: ${ev:-no-result}, query total ${tot:-?}

No-Verification-Needed: bench artifacts only" || true
  if echo "$ev" | grep -q converged-quiet; then
    echo "r06 scaling CONVERGED at pass $i" >> BENCH/attempts/chain_status.txt
  fi
done
echo "r06 chain done $(date -Is)" >> BENCH/attempts/chain_status.txt
