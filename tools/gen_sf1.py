#!/usr/bin/env python3
"""Generate a larger scale-factor fixture as key-shifted copies of sf0.1.

Usage: python3 tools/gen_sf1.py [srcDir] [dstDir] [copies]
       (defaults: /root/testdata/sf0.1  /tmp/graft_sf1  10)

Rationale (VERDICT r4 item #4 / r3 item #3): no driver fixture exists above
sf0.1, so the correctness gate has never run at sf1. The DuckDB compare is
self-consistent — both engines read the SAME parquet — so any deterministic
fixture with the driver schemas gates correctness at 10×. Key-shifted copies
preserve the driver's distributions and referential integrity exactly:

  - region/nation are fixed-size dims → copied verbatim (nationkeys unshifted,
    so every copy's customers/suppliers still join to them).
  - Every scaling table gets `copies` copies with its keys (and foreign keys
    into other scaling tables) shifted by copy * 10^7 — far above any sf0.1
    key (max 149,999) and still inside the 12-char zero-pad of the cells
    rowkey layout (FIXTURES §F3).
  - Copy 0 is byte-identical to sf0.1, so frozen query constants (a6's T0,
    vec_id < 10 probes, b-series rowkey literals) keep selecting real rows.
  - documents text gets a per-copy suffix token (and n_chars recomputed —
    n_chars == length(text) in the source, measured) and embeddings get a
    per-copy first-coordinate nudge, so the dedup/LSH operators see a
    realistically-unique corpus instead of 10 exact clones of every row.
  - events keeps its timestamp[ns] physical type via pyarrow (DuckDB would
    truncate to µs on the round-trip), ids shifted with per-user density
    unchanged — the realistic growth axis.

Tooling note: duckdb/pyarrow here are test tooling (same stack as
tools/compare.py), never a dependency of the Scala library.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
B = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"


def gen(table, select_fmt):
    """Write UNION ALL of `copies` SELECTs (template gets c= copy index)."""
    union = " UNION ALL ".join(
        select_fmt.format(c=c, B=B, src=src(table)) for c in range(COPIES))
    con.execute(f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table:12s} {n:>10,} rows")


# fixed dims: ONE verbatim copy (not per-copy unions — they are primary-key
# tables); nationkey/regionkey joins stay valid from every copy
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t:12s} {n:>10,} rows")

gen("supplier",
    "SELECT s_suppkey + {c}*{B} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {src}")
gen("customer",
    "SELECT c_custkey + {c}*{B} AS c_custkey, c_name, c_nationkey, c_acctbal, "
    "c_mktsegment FROM {src}")
gen("part",
    "SELECT p_partkey + {c}*{B} AS p_partkey, p_name, p_brand, p_type, p_size, "
    "p_retailprice FROM {src}")
gen("orders",
    "SELECT o_orderkey + {c}*{B} AS o_orderkey, o_custkey + {c}*{B} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}")
gen("lineitem",
    "SELECT l_orderkey + {c}*{B} AS l_orderkey, l_partkey + {c}*{B} AS l_partkey, "
    "l_suppkey + {c}*{B} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src}")
gen("documents",
    "SELECT doc_id + {c}*{B} AS doc_id, "
    "CASE WHEN {c} = 0 THEN text ELSE text || ' c{c}' END AS text, lang, source, "
    "CAST(length(CASE WHEN {c} = 0 THEN text ELSE text || ' c{c}' END) AS BIGINT) "
    "AS n_chars FROM {src}")
# Copies get FRESH deterministic vectors, not perturbed clones: a tiny
# nudge on one coordinate leaves cosine ≈ 1-4e-5 between all 10 copies,
# i.e. a planted 10-way near-dup cluster per source vector — ~100x the
# candidate-pair work in every LSH bucket (code-review finding). Hash-
# derived uniform coords scaled by 1/4.62 ≈ E[norm]=1 match the source
# fixture's unit-norm scale.
gen("embeddings",
    "SELECT vec_id + {c}*{B} AS vec_id, "
    "CASE WHEN {c} = 0 THEN embedding ELSE "
    "[CAST((CAST(hash(vec_id, i, {c}) % 2001 AS BIGINT) - 1000) / 4620.0 AS FLOAT) "
    " for i in range(1, 65)] END "
    "AS embedding, label FROM {src}")

# events via pyarrow: preserves the timestamp[us] physical type (the
# 2026-08-13 fixture schema) byte-for-byte — no engine rewrites the column
t = pq.read_table(f"{SRC}/events.parquet")
t = t.replace_schema_metadata(None)
parts = []
for c in range(COPIES):
    tc = t
    for colname in ("event_id", "user_id"):
        idx = tc.schema.get_field_index(colname)
        shifted = pc.add(tc.column(colname), pa.scalar(c * B, pa.int64()))
        tc = tc.set_column(idx, colname, shifted)
    parts.append(tc)
pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet", version="2.6")
n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/events.parquet')").fetchone()[0]
print(f"{'events':12s} {n:>10,} rows  ({pq.read_schema(DST + '/events.parquet').field('ts').type})")
print(f"wrote {COPIES}x {SRC} -> {DST}")
