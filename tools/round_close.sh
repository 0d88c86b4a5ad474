#!/usr/bin/env bash
# Round-close guard (VERDICT r4 item #1): refuse to cut a snapshot with a red
# suite or stale goldens. Run before the final commit of every round:
#   bash tools/round_close.sh
#
# Checks, in order:
#   1. `sbt test` is green (the full ScalaTest suite, including GoldenSpec —
#      which is exactly the net that catches a changed query whose sf0.001
#      golden was not regenerated).
#   2. Oracle texts pass the DuckDB type lint (no HUGEINT output columns —
#      the R9 engine-widened class that the driver's rendering hash rejects
#      but numeric comparison is blind to; shipped as h8's red in round 5).
#   3. Working tree has no uncommitted src/ or golden changes (so what was
#      tested is what ships).
#   4. If a fresh bench_detail.json exists, snapshot it as
#      BENCH_DETAIL_r<N>.json so per-query regression attribution survives
#      the round (r4's detail was overwritten, blinding the r5 audit).
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

echo "== round_close: oracle type lint (R9 HUGEINT class) =="
sbt -batch "runMain graft.OracleDump /tmp/round_close_oracle.json" > /tmp/round_close_dump.log 2>&1 \
  || { tail -20 /tmp/round_close_dump.log; echo "ROUND CLOSE BLOCKED: OracleDump failed." >&2; exit 1; }
if ! python3 tools/oracle_typelint.py "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}" /tmp/round_close_oracle.json; then
  echo "ROUND CLOSE BLOCKED: an oracle text has a HUGEINT output column —" \
       "wrap it in CAST(... AS BIGINT) (SURVEY rule R9)." >&2
  exit 1
fi

echo "== round_close: clean tree for src/ and goldens =="
if ! git diff --quiet -- src/ || ! git diff --cached --quiet -- src/; then
  git status --short -- src/
  echo "ROUND CLOSE BLOCKED: uncommitted src/ or golden changes." >&2
  exit 1
fi
# Next round number = highest existing CORRECTNESS_r<N> + 1 (the round
# being closed is the one the driver will stamp next). `|| true` keeps the
# no-artifacts case (fresh clone) from aborting under set -e — ls exits 2
# and pipefail would otherwise kill the assignment before ${last:-0} runs.
last=$(ls CORRECTNESS_r*.json 2>/dev/null | sed -E 's/.*_r0*([0-9]+)\.json/\1/' | sort -n | tail -1 || true)
n=$(( ${last:-0} + 1 ))

echo "== round_close: sf1 scale gate =="
# VERDICT r6 task 8: run the full declared-query surface + DuckDB compare
# at sf1 every round close, so a scale regression surfaces the round it
# happens instead of in an ad-hoc SCALE.md run. Skippable only explicitly
# (SPARK_GRAFT_SKIP_SF1=1) — e.g. on a machine without the fixture space.
SF1_DIR="${SPARK_GRAFT_SF1_DIR:-/tmp/graft_sf1}"
if [ "${SPARK_GRAFT_SKIP_SF1:-0}" = "1" ]; then
  echo "round_close: sf1 gate SKIPPED by SPARK_GRAFT_SKIP_SF1=1"
else
  if [ ! -d "$SF1_DIR" ]; then
    echo "round_close: generating sf1 fixture at $SF1_DIR (10x key-shifted sf0.1)"
    python3 tools/gen_sf1.py "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" "$SF1_DIR" 10
  fi
  sbt -batch "runMain graft.Verify $SF1_DIR /tmp/round_close_sf1" \
      > /tmp/round_close_sf1.log 2>&1 \
    || { tail -20 /tmp/round_close_sf1.log
         echo "ROUND CLOSE BLOCKED: Verify failed at sf1." >&2; exit 1; }
  if python3 tools/compare.py "$SF1_DIR" /tmp/round_close_sf1 \
      > /tmp/round_close_sf1_cmp.log 2>&1; then
    sf1_line=$(tail -1 /tmp/round_close_sf1_cmp.log)
  else
    grep -v PASS /tmp/round_close_sf1_cmp.log | tail -20
    echo "ROUND CLOSE BLOCKED: sf1 DuckDB compare has failures." >&2
    exit 1
  fi
  echo "round_close: sf1 gate $sf1_line"
  # rN-stamped line in SCALE.md (idempotent: one line per round)
  if ! grep -q "^- r$n sf1 gate:" docs/SCALE.md; then
    echo "- r$n sf1 gate: $sf1_line ($(date -u +%Y-%m-%d), round_close)" >> docs/SCALE.md
    echo "round_close: appended r$n sf1 line to docs/SCALE.md — commit it with the round"
  fi
fi

echo "== round_close: sf10 (100x) scale gate =="
# VERDICT r18 task 5: the full-surface 100x hash gate ran by hand in r18
# (chunked Verify + batched compare); tools/sf10_gate.sh scripts that
# recipe so the 100x promise is a per-round invariant. Skippable only
# explicitly (it is the longest close step — ~1h of chunked JVMs).
if [ "${SPARK_GRAFT_SKIP_SF10:-0}" = "1" ]; then
  echo "round_close: sf10 gate SKIPPED by SPARK_GRAFT_SKIP_SF10=1"
else
  if ! bash tools/sf10_gate.sh "$n" > /tmp/round_close_sf10.log 2>&1; then
    tail -30 /tmp/round_close_sf10.log
    echo "ROUND CLOSE BLOCKED: sf10 gate failed (full log: /tmp/round_close_sf10.log)." >&2
    exit 1
  fi
  tail -3 /tmp/round_close_sf10.log
fi

echo "== round_close: fresh full bench + per-query detail snapshot =="
# r10 (VERDICT r9 task 3): the close does NOT trust whatever
# bench_detail.json sits in cwd — r9 closed with a 45.35 s stdout total
# but a 59.24 s detail from an earlier run, losing per-query attribution
# for the graded number. Run the full battery NOW, on the tree being
# closed, snapshot ITS detail, and assert the stdout total matches the
# detail total (same results array, so any disagreement means a torn
# file or a concurrent writer).
# ONE shared run id stamps headline + detail + baseline (VERDICT r15
# missing #1: the r15 headline and detail artifacts of record came from
# sessions 84 minutes apart and disagreed by 14% host drift, so every
# per-query delta needed prose adjudication; with one id per close, any
# artifact carrying a different id is self-evidently a different run)
run_id="close-r${n}-$(date -u +%Y%m%dT%H%M%SZ)"
if [ "${SPARK_GRAFT_SKIP_BENCH:-0}" = "1" ]; then
  echo "round_close: bench SKIPPED by SPARK_GRAFT_SKIP_BENCH=1"
else
  # MEDIAN-OF-K battery (VERDICT r18 task 1): the committed close detail
  # used to be single-shot, and r16, r17, AND r18 each burned adjudication
  # prose proving phantom >1.5x regressions were session noise (r18: 147.2
  # vs 187.4 s on one tree, all cold-page-cache). graft.Bench's REPEAT
  # protocol (BENCH_MEDIA_r17, generalized) records per-query medians with
  # [min,max] spreads in the detail file, so the committed artifact of
  # record carries its own noise bars. Override with
  # SPARK_GRAFT_CLOSE_REPEAT=1 to reproduce a driver-style single shot.
  bench_line=$(SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
      SPARK_GRAFT_REPEAT="${SPARK_GRAFT_CLOSE_REPEAT:-3}" \
      sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1 || true)
  if [ -z "$bench_line" ]; then
    echo "ROUND CLOSE BLOCKED: graft.Bench produced no metric line." >&2
    exit 1
  fi
  echo "round_close: bench stdout: $bench_line"
fi
if [ -f bench_detail.json ]; then
  snap=$(printf 'BENCH_DETAIL_r%02d.json' "$n")
  # freshness: only stamp a detail file newer than the last commit —
  # snapshotting a stale one would attribute a previous round's timings
  # to this round's code (the exact misattribution this step prevents)
  if [ -n "$(git log -1 --format=%ct 2>/dev/null)" ] \
     && [ "$(stat -c %Y bench_detail.json)" -lt "$(git log -1 --format=%ct)" ]; then
    echo "round_close: bench_detail.json predates the last commit — re-run graft.Bench before snapshotting (skipped $snap)"
  else
    # VERDICT r10 missing-item 3: the committed snapshot must say WHICH
    # run it describes — the r10 snapshot (77.81 s) was not the detail of
    # the driver's post-close 86.19 s run, and nothing in the file said
    # so. Embed a source_run stamp (wall-clock of the close run + its
    # stdout total) so any later artifact with a different total is
    # self-evidently a DIFFERENT run (host drift, driver re-run), not a
    # misattributed one. The totals-agreement gate rides the same step.
    python3 - bench_detail.json "$snap" "${bench_line:-}" "$run_id" "$n" <<'PYEOF'
import datetime, json, os, sys
detail_f, snap_f, line_s, run_id, rnd = (sys.argv[1], sys.argv[2],
                                         sys.argv[3], sys.argv[4],
                                         int(sys.argv[5]))
snap = json.load(open(detail_f))
mtime = os.stat(detail_f).st_mtime
snap["source_run"] = {
    "id": run_id,
    "measured_utc": datetime.datetime.fromtimestamp(
        mtime, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    "total_sec": round(snap["value"], 3),
    "producer": "round_close.sh full-battery run on the tree being closed",
}
if line_s:
    line = json.loads(line_s)
    if abs(snap["value"] - line["value"]) > 0.011:
        sys.exit(f"ROUND CLOSE BLOCKED: {detail_f} total {snap['value']:.3f}s "
                 f"disagrees with the bench stdout total {line['value']:.3f}s — "
                 "the snapshot is not the detail of the recorded run")
    print(f"round_close: detail/stdout totals agree ({line['value']:.2f}s, "
          f"{len(snap['queries'])} queries)")
    # the close's own HEADLINE of record, from the SAME run as the
    # detail by construction (VERDICT r15 missing #1). If the driver
    # later writes its own BENCH_r<N>.json, its missing/different
    # source_run.id makes the session difference self-evident.
    line["source_run"] = snap["source_run"]
    head_f = f"BENCH_r{rnd:02d}_close.json"
    json.dump(line, open(head_f, "w"), indent=1)
    print(f"round_close: wrote {head_f} (headline, same run id as the "
          "detail snapshot — git add it with the round commit)")
json.dump(snap, open(snap_f, "w"), indent=1)
print(f"round_close: snapshotted {detail_f} -> {snap_f} with source_run "
      f"stamp {snap['source_run']['id']} / "
      f"{snap['source_run']['total_sec']}s (git add it with the round commit)")
PYEOF
    # VERDICT r7 task 1: same-session stock baseline. The r7 audit showed
    # the host drifts +-30% BETWEEN rounds, so ratios against BASELINE.md's
    # fixed numbers conflate drift with regression; re-measure the stock
    # 15-shape battery NOW, in the same session state as the detail file
    # just snapshotted, and emit BASELINE_r<N>.json with same-run ratios.
    # Fail-soft: a baseline measurement hiccup must not block a green close.
    if python3 tools/baseline_close.py "$n" bench_detail.json "$run_id"; then
      echo "round_close: wrote $(printf 'BASELINE_r%02d.json' "$n") (git add it with the round commit)"
    else
      echo "round_close: WARNING baseline_close failed — round closes without a same-session baseline (ratios vs BASELINE.md only)"
    fi
    # VERDICT r6 task 6: per-query attribution against the previous
    # round's snapshot — top deltas printed every close, fail-SOFT
    # (warn, don't block) on >1.5x single-query regressions, since noise
    # on sub-100ms queries would otherwise block green closes.
    # sort -V so r100 doesn't sort before r99 once the %02d padding runs out
    prev=$(ls BENCH_DETAIL_r*.json 2>/dev/null | grep -v "$snap" | sort -V | tail -1 || true)
    if [ -n "$prev" ]; then
      python3 - "$prev" "$snap" <<'PYEOF'
import json, sys
prev_f, cur_f = sys.argv[1], sys.argv[2]
qp = json.load(open(prev_f))["queries"]
qc = json.load(open(cur_f))["queries"]
common = sorted(set(qp) & set(qc), key=lambda k: qc[k] - qp[k], reverse=True)
print(f"round_close: bench delta vs {prev_f} "
      f"(total {sum(qp.values()):.2f}s -> {sum(qc.values()):.2f}s, "
      f"{len(qc)} queries)")
print("  top-5 per-query deltas:")
for k in common[:5]:
    print(f"    {k:30s} {qp[k]:7.3f}s -> {qc[k]:7.3f}s ({qc[k]-qp[k]:+.3f}s)")
bad = [k for k in common if qp[k] > 0.2 and qc[k] > 1.5 * qp[k]]
if bad:
    print("  WARNING: >1.5x single-query regressions (investigate before "
          "closing):")
    for k in bad:
        print(f"    {k:30s} {qp[k]:7.3f}s -> {qc[k]:7.3f}s "
              f"({qc[k]/qp[k]:.2f}x)")
new = sorted(set(qc) - set(qp))
if new:
    print(f"  new queries this round: {', '.join(new)}")
PYEOF
    else
      echo "round_close: no previous BENCH_DETAIL snapshot — delta table skipped"
    fi
  fi
else
  echo "round_close: no bench_detail.json in cwd — run graft.Bench first if you want the r$n detail snapshot"
fi

echo "round_close: OK — safe to snapshot."
