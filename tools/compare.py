#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <outDir>/oracle_sql.json, runs each SQL in DuckDB over views named
after the parquet tables in <sfDir>, reads the Spark result parquet from
<outDir>/<name>/, sorts columns by name on both sides, and compares
row-by-row with exact value equality (Decimal vs float compared
numerically; floats must be bit-identical per SURVEY §2.1 R2/R7).

Additionally compares the DECLARED column types of both sides by render
class (int / decimal / float / ...): the driver's gate hashes string
renderings, so DuckDB HUGEINT (sum over BIGINT widens) vs Spark BIGINT
fails there even when every value is numerically equal — the R9 class that
numeric-equality comparison is blind to (h8_fn_map, round 5).
"""
import sys, json, glob, math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("v", str(v))
    if isinstance(v, Decimal):
        return ("num", v.normalize())
    if isinstance(v, int):
        return ("num", Decimal(v).normalize())
    if isinstance(v, float):
        return ("f", v)
    return ("v", str(v))


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in rows]


def render_class(t):
    """Map a DuckDB type name to the string-rendering class the driver's
    hash is sensitive to. HUGEINT gets its own class: Spark cannot emit an
    int128, so its presence in an oracle result is always a declared-type
    divergence (SURVEY rule R9)."""
    t = t.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    return t.split("(")[0]


def type_mismatches(con, oracle_sql, spark_files):
    """Return [(col, duck_type, spark_type)] for declared-type render-class
    divergence between the oracle query and the Spark output parquet."""
    dtypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle_sql}").fetchall()}
    stypes = {r[0]: r[1]
              for r in con.execute(
                  f"DESCRIBE SELECT * FROM read_parquet({spark_files!r})").fetchall()}
    bad = []
    for c in sorted(set(dtypes) & set(stypes)):
        if render_class(dtypes[c]) != render_class(stypes[c]):
            bad.append((c, dtypes[c], stypes[c]))
    return bad


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # --partial: tolerate a Verify dump restricted with SPARK_GRAFT_ONLY —
    # queries with no result dir are skipped, not failed. Never used by
    # the round-close gate (which requires the full dump).
    partial = "--partial" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        # resolve the spark output FIRST: a --partial run must not execute
        # the whole ~140-query DuckDB battery (or fail on a query outside
        # the restricted set) just to discover there is nothing to compare
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            if partial:
                continue
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            duck = con.execute(oracle[name])
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [c[0] for c in sq.description]
        srows = sq.fetchall()
        dc, dr = normalize(dcols, drows)
        sc, sr = normalize(scols, srows)
        if dc != sc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            nfail += 1
            continue
        if len(dr) != len(sr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            nfail += 1
            continue
        bad = next((i for i, (a, b) in enumerate(zip(sr, dr)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: row {bad} spark={sr[bad]} duck={dr[bad]}")
            nfail += 1
            continue
        tmis = type_mismatches(con, oracle[name], files)
        if tmis:
            print(f"FAIL {name}: declared-type render-class mismatch "
                  f"(col, duck, spark): {tmis} — values equal but the "
                  f"driver's rendering hash will diverge (R9)")
            nfail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    # a run that compared NOTHING must not read as green — e.g. a typo'd
    # SPARK_GRAFT_ONLY produced an empty dump and --partial skipped it all
    if npass == 0 and nfail == 0:
        print("FAIL: zero queries compared (empty or fully-skipped dump)")
        sys.exit(1)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
