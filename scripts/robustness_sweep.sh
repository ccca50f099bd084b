#!/usr/bin/env bash
# Distribution-robustness sweep (local only, NOT part of the library).
#
# Generates seeded ALTERNATE corpora (graft.tools.GenCorpus: skewed
# cardinalities, empty groups, null fields, duplicate keys, tie-heavy
# boundaries, same-microsecond bursts, empty tables) and runs the full
# driver-style Verify -> DuckDB selfcheck against each — every oracle
# query must hash-match on every corpus, not just the fixture one.
#
# Usage: scripts/robustness_sweep.sh [workdir]   (default /tmp/altdata)
set -euo pipefail
cd "$(dirname "$0")/.."
W="${1:-/tmp/altdata}"

declare -a NAMES=(skew skew2 edge edge_noevents dupheavy)
declare -a SPECS=("20260814 skew" "777 skew" "123 edge" "99 edge,events+lineitem" "555 dupheavy")

fail=0
for i in "${!NAMES[@]}"; do
  n="${NAMES[$i]}"; spec="${SPECS[$i]}"
  echo "=== corpus $n ($spec) ==="
  sbt -batch "runMain graft.tools.GenCorpus $W/$n $spec" >/dev/null 2>&1
  sbt -batch "runMain graft.Verify $W/$n $W/verify_$n" 2>&1 | grep '\[verify\]' || true
  if python3 scripts/selfcheck.py "$W/$n" "$W/verify_$n" | tail -1; then :; else fail=1; fi
done
echo "=== fixture sf0.01 ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $W/verify_fixture" 2>&1 | grep '\[verify\]' || true
if python3 scripts/selfcheck.py /root/testdata/sf0.01 "$W/verify_fixture" | tail -1; then :; else fail=1; fi
exit $fail
