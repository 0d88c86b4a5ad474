#!/usr/bin/env python3
"""Lint every oracle SQL text for the R9 engine-widened-integer class.

Usage: python3 tools/oracle_typelint.py <sfDir> <oracle_sql.json>

DuckDB widens sum(INTEGER/BIGINT) to HUGEINT — a type Spark cannot emit, so
the driver's string-rendering hash diverges even when values are numerically
equal (this shipped as the h8_fn_map red in round 5; the same class caused 15
reds in round 1). This lint DESCRIBEs each oracle text over the real tables
and fails on any HUGEINT/UHUGEINT output column: those must carry a final
CAST(... AS BIGINT).

DECIMAL is deliberately NOT flagged here: some oracles (d2_agg_avg) output
DECIMAL on both engines by design. The both-sides render-class comparison
lives in tools/compare.py, which has the Spark output to compare against.
"""
import sys, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED = {"HUGEINT", "UHUGEINT"}


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        hits = [(c, t) for c, t, *_ in desc if t.upper() in BANNED]
        if hits:
            print(f"FAIL {name}: engine-widened output columns {hits} — "
                  f"add CAST(... AS BIGINT) (SURVEY rule R9)")
            bad += 1
    print(f"== typelint: {len(oracle)} oracle texts, {bad} with banned types ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
