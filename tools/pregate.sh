#!/bin/bash
# Mechanical pre-snapshot gate: refuses to let a red artifact ship.
#
# Runs, in order, and FAILS FAST on any red:
#   1. sbt -batch compile             (build green)
#   2. sbt -batch test                (full ScalaTest suite green)
#   3. graft.Verify @ sf0.01          (correctness dump for all queries)
#   4. tools/check.py                 (DuckDB oracle: 0 fail required)
#
# Usage: tools/pregate.sh [sfdir]     (default /root/testdata/sf0.01)
# Exit 0 = safe to snapshot/commit. Non-zero = DO NOT SHIP.
set -euo pipefail
DIR="$(cd "$(dirname "$0")/.." && pwd)"
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/pregate.XXXXXX)"
cd "$DIR"

echo "== pregate 1/4: sbt compile =="
sbt -batch compile 2>&1 | tail -2 | grep -q "\[success\]" \
  || { echo "PREGATE RED: compile failed"; exit 1; }

echo "== pregate 2/4: sbt test =="
TEST_OUT="$(sbt -batch test 2>&1 | tail -30 || true)"
echo "$TEST_OUT" | grep -E "Tests: succeeded|All tests passed" || true
echo "$TEST_OUT" | grep -q "All tests passed" \
  || { echo "PREGATE RED: sbt test not green"; exit 1; }

echo "== pregate 3/4: graft.Verify @ $SF =="
tools/run.sh graft.Verify "$SF" "$OUT/verify" 2> "$OUT/verify.err" >/dev/null
if grep -q "\[verify\]" "$OUT/verify.err"; then
  echo "PREGATE RED: Verify logged per-query failures:"
  grep "\[verify\]" "$OUT/verify.err"
  exit 1
fi

echo "== pregate 4/4: DuckDB oracle =="
CHECK="$(python3 tools/check.py "$SF" "$OUT/verify" 2>&1 || true)"
echo "$CHECK" | tail -1
echo "$CHECK" | tail -1 | grep -qE ", 0 fail, 0 err," \
  || { echo "PREGATE RED: oracle mismatches/errs above"; exit 1; }

echo "PREGATE GREEN: safe to snapshot."
