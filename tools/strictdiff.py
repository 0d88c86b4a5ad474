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


def selftest_decimal():
    """ADVICE r2: the R9 rule (exact decimal sums final-cast to DOUBLE hash
    identically on both engines) is guaranteed only while the unscaled sum
    fits in 2^53; above that, JVM BigDecimal.doubleValue and DuckDB's
    decimal->double cast are each correctly rounded from the DECIMAL value,
    so they still agree — but double-rounding through intermediate
    representations could in principle diverge. This probes a ladder of
    magnitudes around and beyond 2^53 and compares bit patterns of
    python float(Decimal) (same correctly-rounded semantics as
    BigDecimal.doubleValue) vs DuckDB CAST(DECIMAL AS DOUBLE).

    Empirically (2026-08-12, duckdb 1.x): every probe with unscaled sum
    <= 2^53 agrees bit-for-bit; scale-2 probes ABOVE 2^53 diverge in the
    last ulp (DuckDB double-rounds through unscaled/10^scale). So the
    bound documented at graft/ops/package.scala `dsum` is real and tight.
    Exit 0 while all below-bound probes agree (above-bound divergence is
    reported informationally); exit 1 if the safe zone ever diverges.
    """
    from decimal import Decimal
    con = duckdb.connect()
    bad_safe = above = 0
    probes = []
    for exp in (12, 14, 15, 16, 17, 18, 20, 25, 30, 35):
        for off in (-3, -1, 0, 1, 7, 33, 101):
            probes.append(10 ** exp + off)
    probes += [2 ** 53 - 1, 2 ** 53, 2 ** 53 + 1, 2 ** 53 + 3, 2 ** 60 + 1]
    for unscaled in probes:
        for scale in (0, 2):
            d = Decimal(unscaled).scaleb(-scale)
            py = float(d)
            (db,) = con.execute(
                f"SELECT CAST(CAST('{d}' AS DECIMAL(38,{scale})) AS DOUBLE)").fetchone()
            if struct.pack('<d', py) != struct.pack('<d', db):
                if unscaled <= 2 ** 53:
                    print(f"DECIMAL-DIVERGE-IN-SAFE-ZONE unscaled={unscaled} "
                          f"scale={scale} py={py!r} duck={db!r}")
                    bad_safe += 1
                else:
                    above += 1
    print(f"== decimal selftest: {len(probes) * 2} probes, "
          f"{bad_safe} divergent below 2^53 (must be 0), "
          f"{above} divergent above (expected, documented bound) ==")
    sys.exit(1 if bad_safe else 0)


def main():
    if sys.argv[1:2] == ["--selftest-decimal"]:
        selftest_decimal()
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
