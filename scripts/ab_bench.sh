#!/bin/bash
# Same-box A/B bench arbiter wrapper (see graft.tools.AbBench).
#
#   scripts/ab_bench.sh <prevGitRef> [sfDir] [pairs] [queryCsv|all]
#
# Builds the PREVIOUS round's classes from <prevGitRef> in a throwaway
# worktree, builds the current tree, then hands both classpaths to
# AbBench, which alternates single-pass child JVMs and prints the
# per-query paired ratios + the geomean headline. ab_bench.json lands
# in the repo root (commit it with the round's records).
set -euo pipefail
cd "$(dirname "$0")/.."

PREV_REF="${1:?usage: ab_bench.sh <prevGitRef> [sfDir] [pairs] [csv|all]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
PAIRS="${3:-5}"
CSV="${4:-all}"

WT="/tmp/graft_ab_prev_$(git rev-parse --short "$PREV_REF")"
if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$PREV_REF"
fi
echo "[ab_bench] building current tree..."
sbt -batch compile >/dev/null
echo "[ab_bench] building prev tree ($PREV_REF)..."
(cd "$WT" && sbt -batch compile >/dev/null)

NOW_CP="target/scala-2.13/classes"
PREV_CP="$WT/target/scala-2.13/classes"

exec java \
  $(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
      java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
      printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done) \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$NOW_CP:/opt/spark/jars/*" \
  graft.tools.AbBench "$PREV_CP" "$NOW_CP" "$SF_DIR" "$PAIRS" "$CSV"
