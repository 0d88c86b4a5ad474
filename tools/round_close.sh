#!/usr/bin/env bash
# Round-close guard (VERDICT r4 item #1): refuse to cut a snapshot with a red
# suite or stale goldens. Run before the final commit of every round:
#   bash tools/round_close.sh
#
# Checks, in order:
#   1. `sbt test` is green (the full ScalaTest suite, including GoldenSpec —
#      which is exactly the net that catches a changed query whose sf0.001
#      golden was not regenerated).
#   2. Working tree has no uncommitted src/ or golden changes (so what was
#      tested is what ships).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== round_close: sbt test =="
if ! sbt -batch test > /tmp/round_close_test.log 2>&1; then
  tail -40 /tmp/round_close_test.log
  echo "ROUND CLOSE BLOCKED: sbt test is RED. Fix (did you re-run GoldenGen" \
       "after changing a query?) before committing the snapshot." >&2
  exit 1
fi
# informational only — a format change in sbt's summary must not abort a
# green close under set -e/pipefail
grep -E "Tests: succeeded|All tests passed" /tmp/round_close_test.log | tail -2 || true

echo "== round_close: clean tree for src/ and goldens =="
if ! git diff --quiet -- src/ || ! git diff --cached --quiet -- src/; then
  git status --short -- src/
  echo "ROUND CLOSE BLOCKED: uncommitted src/ or golden changes." >&2
  exit 1
fi
echo "round_close: OK — safe to snapshot."
