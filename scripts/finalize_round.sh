#!/usr/bin/env bash
# End-of-round artifact hygiene (local only, NOT part of the library).
#
# The committed bench_out.json is the NEXT round's `prev` gate record, so
# the round must end with (a) a clean-box bench record produced at the
# canonical config, (b) every lane artifact committed, (c) `git status`
# clean — otherwise the driver's end-of-round bench overwrite leaves the
# gate's baseline ambiguous (r13 verdict finding #6 / ask #9).
#
# Usage: scripts/finalize_round.sh [round-tag]
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:-rN}"

export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_PASSES=5
sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1

# each artifact staged on its own, gated on existence — one missing file
# must not abort staging the rest (git add with N pathspecs stages
# NOTHING when any pathspec misses, and the old `2>/dev/null || true`
# swallowed exactly that failure, silently skipping the gate-baseline
# commit this script exists to make — ADVICE r14)
for f in bench_out.json bench_maint.json bench_recall.json \
    bench_skew.json bench_streaming.json; do
  if [ -f "$f" ]; then git add -- "$f"; fi
done
if ! git diff --cached --quiet; then
  git commit -m "$TAG: clean-box bench + lane artifacts (gate baseline)"
fi
git status --short
echo "[finalize] done — status above must be empty"
