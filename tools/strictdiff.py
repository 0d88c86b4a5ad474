#!/usr/bin/env python3
"""Strict representational diff between Spark verify output and DuckDB oracle.

Unlike compare.py (which normalizes Decimals numerically), this mimics the
strictest plausible driver hash: per-cell (python type name, str(value),
and for floats the exact bit pattern). Prints the first differing cell per
query plus the duckdb-reported column types on both sides.

Usage: python3 tools/strictdiff.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, struct
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if isinstance(v, float):
        return (type(v).__name__, str(v), struct.pack('<d', v).hex())
    return (type(v).__name__, str(v))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    nmatch = ndiff = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            duck = con.execute(oracle[name])
            dtypes = [(c[0], str(c[1])) for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"DIFF {name}: oracle error {e}")
            ndiff += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"DIFF {name}: no spark output")
            ndiff += 1
            continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        stypes = [(c[0], str(c[1])) for c in sq.description]
        srows = sq.fetchall()
        # sort columns by name both sides
        dord = sorted(range(len(dtypes)), key=lambda i: dtypes[i][0])
        sord = sorted(range(len(stypes)), key=lambda i: stypes[i][0])
        dt = [dtypes[i] for i in dord]
        st = [stypes[i] for i in sord]
        if [c for c, _ in dt] != [c for c, _ in st]:
            print(f"DIFF {name}: cols spark={st} duck={dt}")
            ndiff += 1
            continue
        msg = None
        if dt != st:
            msg = f"coltypes spark={st} duck={dt}"
        if len(drows) != len(srows):
            print(f"DIFF {name}: rows spark={len(srows)} duck={len(drows)}")
            ndiff += 1
            continue
        for ri, (sr, dr) in enumerate(zip(srows, drows)):
            for ci in range(len(dord)):
                sv = cell(sr[sord[ci]])
                dv = cell(dr[dord[ci]])
                if sv != dv:
                    extra = f" [{msg}]" if msg else ""
                    print(f"DIFF {name}: row {ri} col {dt[ci][0]} spark={sv} duck={dv}{extra}")
                    ndiff += 1
                    msg = None
                    break
            else:
                continue
            break
        else:
            if msg:
                print(f"TYPEONLY {name}: {msg}")
                ndiff += 1
            else:
                nmatch += 1
    print(f"== {nmatch} strict-match, {ndiff} diff ==")


if __name__ == "__main__":
    main()
