#!/usr/bin/env bash
# sf10 (100x) FULL-SURFACE hash gate (VERDICT r18 task 5) — the chunked
# recipe from docs/SCALE.md, scripted so the 100x promise is a per-round
# invariant instead of a heroic one-off:
#
#   bash tools/sf10_gate.sh [<round>]
#
# Protocol (why it looks like this — both halves were learned the hard way
# in r18):
#   - Verify runs in CHUNKS of ~20 queries per fresh JVM with a 40g heap:
#     one long 195-query app OOMs at the default 8g and then exhausts /tmp
#     with accumulated shuffle files (ContextCleaner only fires on GC).
#     Scratch dirs created by our own chunks are swept between chunks;
#     dirs that predate the script (a concurrently-running session) are
#     left alone.
#   - The DuckDB compare side is ALSO batched: one long process
#     accumulates memory and starts failing tiny allocations after ~135
#     oracles (r18: 11 phantom 'failures' all passed in a fresh process).
#
# Env knobs:
#   SPARK_GRAFT_SF10_DIR    fixture dir (default /tmp/graft_sf10;
#                           generated at 100x from sf0.1 if incomplete)
#   SPARK_GRAFT_SF10_OUT    verify output dir (default /tmp/graft_sf10_out)
#   SPARK_GRAFT_SF10_CHUNK  queries per Verify JVM (default 20)
#   SPARK_GRAFT_SF10_MEM    driver -Xmx per chunk (default 40g)
#
# Emits SF10_GATE_r<N>.json (pass/fail + failures) and appends an
# rN-stamped line to docs/SCALE.md. Exit 1 on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."

SF10_DIR="${SPARK_GRAFT_SF10_DIR:-/tmp/graft_sf10}"
OUT="${SPARK_GRAFT_SF10_OUT:-/tmp/graft_sf10_out}"
CHUNK="${SPARK_GRAFT_SF10_CHUNK:-20}"
MEM="${SPARK_GRAFT_SF10_MEM:-40g}"

if [ $# -ge 1 ]; then
  n="$1"
else
  last=$(ls CORRECTNESS_r*.json 2>/dev/null | sed -E 's/.*_r0*([0-9]+)\.json/\1/' | sort -n | tail -1 || true)
  n=$(( ${last:-0} + 1 ))
fi

# SPARK_GRAFT_SF10_SKIP_VERIFY=1 resumes from the compare phase against an
# existing $OUT produced by THIS tree earlier in the session (e.g. after an
# oracle-side-only failure) — the Verify chunks are ~50 min of JVMs.
SKIP_VERIFY="${SPARK_GRAFT_SF10_SKIP_VERIFY:-0}"

echo "== sf10_gate (r$n): fixture =="
complete=1
for t in region nation customer supplier part orders lineitem events documents embeddings; do
  [ -f "$SF10_DIR/$t.parquet" ] || complete=0
done
if [ "$complete" != "1" ]; then
  echo "sf10_gate: generating 100x fixture at $SF10_DIR (~2.3 GB, key-shifted sf0.1)"
  python3 tools/gen_sf1.py /root/testdata/sf0.1 "$SF10_DIR" 100
fi

echo "== sf10_gate: oracle dump (query list of record) =="
sbt -batch "runMain graft.OracleDump /tmp/sf10_oracle_full.json" \
  > /tmp/sf10_gate_dump.log 2>&1 \
  || { tail -20 /tmp/sf10_gate_dump.log; echo "sf10_gate BLOCKED: OracleDump failed." >&2; exit 1; }

# gate-private scratch (ADVICE r19): each chunk JVM gets its own
# spark.local.dir under this root and ONLY that subtree is swept after the
# chunk — the old global /tmp/blockmgr-*//tmp/spark-* diff-sweep could
# delete the live shuffle dirs of any OTHER Spark/sbt process that started
# during the ~1h gate.
GATE_SCRATCH="$(mktemp -d /tmp/sf10_gate_scratch.XXXXXX)"
trap 'rm -rf "$GATE_SCRATCH"' EXIT

mkdir -p "$OUT"
mapfile -t chunks < <(python3 - "$CHUNK" <<'PYEOF'
import json, sys
keys = sorted(json.load(open("/tmp/sf10_oracle_full.json")))
k = int(sys.argv[1])
for i in range(0, len(keys), k):
    print(",".join(keys[i:i+k]))
PYEOF
)
if [ "$SKIP_VERIFY" = "1" ]; then
  echo "== sf10_gate: Verify chunks SKIPPED (resume-from-compare against existing $OUT) =="
  chunks=()
fi
echo "== sf10_gate: ${#chunks[@]} Verify chunks of <=$CHUNK queries, -Xmx$MEM each =="
ci=0
for chunk in "${chunks[@]}"; do
  ci=$((ci+1))
  echo "sf10_gate: chunk $ci/${#chunks[@]}: ${chunk%%,*}.."
  mkdir -p "$GATE_SCRATCH/chunk$ci"
  if ! SPARK_DRIVER_MEM="$MEM" SPARK_GRAFT_ONLY="$chunk" \
      SPARK_GRAFT_LOCAL_DIR="$GATE_SCRATCH/chunk$ci" \
      sbt -batch "runMain graft.Verify $SF10_DIR $OUT" \
      > "/tmp/sf10_gate_chunk$ci.log" 2>&1; then
    tail -20 "/tmp/sf10_gate_chunk$ci.log"
    echo "sf10_gate BLOCKED: Verify chunk $ci failed." >&2
    exit 1
  fi
  grep "\[verify\]" "/tmp/sf10_gate_chunk$ci.log" || true
  # sweep ONLY this chunk's own scratch (spark.local.dir above): accumulated
  # shuffle files exhaust /tmp otherwise (ContextCleaner only fires on GC).
  rm -rf "$GATE_SCRATCH/chunk$ci"
done

echo "== sf10_gate: batched DuckDB compare =="
python3 - "$SF10_DIR" "$OUT" "$n" <<'PYEOF'
import datetime, json, subprocess, sys
sfdir, outdir, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
oracle = json.load(open("/tmp/sf10_oracle_full.json"))
keys = sorted(oracle)
# r19 measured: 40/batch → 3 in-batch OOM 'failures', 25/batch → 18 (the
# heavy j-series oracles cluster alphabetically); every one passed solo.
# Small batches cost a little view-setup overhead and save the retries.
BATCH = 12
npass, failures, batches, retried = 0, [], 0, []

# the DuckDB memory-accumulation class (and its kernel-OOM-kill / crashed-
# subprocess cousin, which yields queries with NO verdict at all): the ONLY
# failure class the solo-retry self-heal may absorb (ADVICE r19). Genuine
# row/column/type mismatches are real on first sight — a retry that
# "passes" on one of those would be oracle nondeterminism, which must
# surface, not be swallowed.
MEMCLASS = ("Out of Memory", "bad allocation", "bad_alloc",
            "no verdict from compare process")

def run_batch(names):
    """One fresh compare.py process over `names`; returns (passed, fails).

    A batch subprocess that dies without emitting a verdict for some of its
    queries (hard crash, kernel OOM-kill, compare.py's 'FAIL: zero queries
    compared' exit) gets those queries reported as synthetic memory-class
    FAIL lines instead of silently dropping them (ADVICE r19, medium)."""
    sub = {k: oracle[k] for k in names}
    with open(f"{outdir}/oracle_sql.json", "w") as f:
        json.dump(sub, f)
    r = subprocess.run([sys.executable, "tools/compare.py", sfdir, outdir],
                       capture_output=True, text=True)
    passed, fails = [], []
    for line in r.stdout.splitlines():
        if line.startswith("PASS "):
            passed.append(line.split()[1].rstrip(":"))
        elif line.startswith("FAIL ") and not line.startswith("FAIL: zero"):
            fails.append(line)
    verdicted = set(passed) | {f.split()[1].rstrip(":") for f in fails}
    fails.extend(f"FAIL {n}: no verdict from compare process "
                 f"(rc={r.returncode})" for n in names if n not in verdicted)
    return passed, fails

for i in range(0, len(keys), BATCH):
    batches += 1
    # fresh process per batch: DuckDB memory accumulation over a long
    # compare produced phantom allocation failures in r18
    passed, fails = run_batch(keys[i:i+BATCH])
    npass += len(passed)
    # a memory-class FAIL inside a batch can still be the accumulation
    # class (r19: 18 in-batch 'Out of Memory (bad allocation)' oracle
    # errors all passed solo) — retry those ALONE in a fresh process.
    # Any OTHER failure class is real immediately (ADVICE r19, low).
    for line in fails:
        name = line.split()[1].rstrip(":")
        if not any(m in line for m in MEMCLASS):
            failures.append(line)
            print(line)
            continue
        batches += 1
        p2, fails2 = run_batch([name])
        retried.append({"query": name, "in_batch": line,
                        "solo": "pass" if (p2 and not fails2) else "fail"})
        if p2 and not fails2:
            npass += 1
            print(f"RETRY-PASS {name} (in-batch failure was DuckDB "
                  "memory accumulation, passed solo)")
        else:
            failures.extend(fails2 if fails2 else [line])
            print((fails2 if fails2 else [line])[0])

# full-coverage assertion (ADVICE r19, medium): every query must have
# exactly one final verdict — a crashed batch must not exit the gate green
# with partial coverage.
if npass + len(failures) != len(keys):
    failures.append(f"FAIL <gate>: coverage hole — {npass} pass + "
                    f"{len(failures)} fail != {len(keys)} queries")
    print(failures[-1])
# restore the full oracle map so the outdir stays a complete artifact
with open(f"{outdir}/oracle_sql.json", "w") as f:
    json.dump(oracle, f)
result = {
    "round": rnd,
    "measured_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "sf_dir": sfdir, "scale": "100x (sf10, key-shifted sf0.1)",
    "n_queries": len(keys), "n_pass": npass, "n_fail": len(failures),
    "compare_batches": batches,
    "memclass_retries": retried,
    "failures": failures,
}
path = f"SF10_GATE_r{rnd:02d}.json"
with open(path, "w") as f:
    json.dump(result, f, indent=1)
line = f"{npass}/{len(keys)} pass at sf10"
print(f"sf10_gate: {line} -> wrote {path}")
if not failures:
    marker = f"- r{rnd} sf10 gate:"
    scale = open("docs/SCALE.md").read()
    if marker not in scale:
        with open("docs/SCALE.md", "a") as f:
            f.write(f"{marker} {line} ({result['measured_utc'][:10]}, "
                    f"tools/sf10_gate.sh, {batches} compare batches)\n")
        print("sf10_gate: appended the rN line to docs/SCALE.md — commit it "
              "with the round")
sys.exit(1 if failures or npass == 0 else 0)
PYEOF
echo "sf10_gate: OK"
