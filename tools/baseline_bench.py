#!/usr/bin/env python3
"""Vanilla-Spark baseline battery (SURVEY.md §6 / BASELINE.md).

Measures stock Spark SQL 4.1.2 — no graft code, no custom optimizer rules —
on the sf0.1 fixtures. This is the honest "stock Spark" bar the engine must
stay within 2x of (BASELINE.json:2). Driver-side tooling only (pyspark is a
driver dependency, same stack as tools/compare.py; the graded library itself
is pure Scala).

Usage: python3 tools/baseline_bench.py [sfDir] [cpus] [k]
Prints one JSON line: {"metric":"baseline_total","value":N,"unit":"sec","queries":{...}}

Each shape is timed k times (default 5) and `queries` carries the MEDIAN;
`spread` carries [min, max]. The r9 close produced three phantom >2x
ratios from single-shot timings of 100-500 ms shapes with a documented
±0.7x spread — the 2x gate is evaluated on medians since r10.
"""
import json
import os
import statistics
import sys
import time

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "8"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 5

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    # pyspark's default 1g driver heap OOMs the battery at sf1 (10x);
    # graft.Bench runs under sbt's forked JVM with a real heap, so the
    # stock side gets the same courtesy — must be set before JVM launch
    .config("spark.driver.memory", os.environ.get("BASELINE_DRIVER_MEM", "16g"))
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)

# The 15-query battery of SURVEY.md §6: scan-agg, filtered-agg, 3-way join,
# broadcast join, window top-k, global top-k, distinct, rollup, except,
# JSON extract, time-bucket, lag-sessionize, exact dedup, cosine top-k,
# anti-join. Pure Spark SQL text — what a user would write without graft.
Q = {
    "B1_scan_agg": """
        SELECT l_returnflag, l_linestatus, count(*) n,
               sum(CAST(l_quantity AS DECIMAL(18,2))) s
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""",
    "B2_filtered_agg": """
        SELECT count(*) n FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
          AND NOT (l_returnflag = 'A')""",
    # B3 r15: cast each FACTOR to decimal before the multiply, exactly as
    # the graft twin must (SURVEY R2 — a double product can land on a .005
    # tie that rounds differently cross-engine). The old spelling did the
    # multiply in double and cast the product, which is strictly less
    # work than the gate-required exact decimal arithmetic.
    "B3_join3": """
        SELECT c_mktsegment, count(*) n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2))))
                    AS DECIMAL(38,4)) rev
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS LAST""",
    # B1/B3/B4/B8/B10/B12/B14 gained the graft twin's ORDER BY in r15 —
    # the same identical-work correction r11 applied to B5/B9/B11: the graft
    # queries are gated on ordered deterministic output (the driver's
    # hash compares rows positionally), so a stock twin without the
    # final sort measures strictly less work. Profiled at sf1: the
    # ordered SQL twin in the same JVM reads within noise of the graft
    # DSL (c2 ~0.26 s both, i4 ~1.45 s both) — the former 1.9x "gaps"
    # were exactly the missing ORDER BY jobs (c2: range-exchange+sort
    # job over 25 rows; i4: a ~1.5M-row global session sort at sf1).
    "B4_join_bcast": """
        SELECT /*+ BROADCAST(nation) */ n_name, count(*) n
        FROM nation JOIN customer ON n_nationkey = c_nationkey GROUP BY n_name
        ORDER BY n_name NULLS LAST""",
    # B5/B9/B11 are IDENTICAL-WORK twins of e9/g4/i2 (VERDICT r11 task 1):
    # the original generic shapes computed strictly less (no pre-aggregate,
    # no DECIMAL sum, no ordered output), so every close re-litigated a
    # workload mismatch instead of measuring plan quality. Each now spells
    # exactly what its graft twin computes, in stock Spark SQL.
    "B5_win_topk": """
        SELECT event_type, user_id, spend FROM (
          SELECT event_type, user_id, spend,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY spend DESC, user_id) rn
          FROM (SELECT event_type, user_id,
                       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) spend
                FROM events GROUP BY event_type, user_id))
        WHERE rn <= 3
        ORDER BY event_type NULLS LAST, spend DESC, user_id NULLS LAST""",
    "B6_global_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "B7_distinct": "SELECT count(DISTINCT l_partkey) dp, count(DISTINCT l_suppkey) ds FROM lineitem",
    "B8_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) n FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "B9_except": """
        SELECT k FROM (
          SELECT p_partkey k FROM part
          EXCEPT
          SELECT l_partkey FROM lineitem WHERE l_quantity <= 1)
        ORDER BY k NULLS LAST LIMIT 100""",
    "B10_json": """
        SELECT event_type, sum(CAST(get_json_object(props,'$.k') AS DECIMAL(18,0))) ksum
        FROM events GROUP BY event_type ORDER BY event_type NULLS LAST""",
    "B11_timebucket": """
        SELECT unix_micros(cast(ts as timestamp)) div 3600000000 hour_bucket,
               event_type, count(*) n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) v
        FROM events GROUP BY 1, 2
        ORDER BY hour_bucket NULLS LAST, event_type NULLS LAST""",
    "B12_lag_sessionize": """
        SELECT user_id, session_id, count(*) n FROM
          (SELECT user_id, event_id,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) session_id
           FROM (SELECT user_id, event_id, ts,
                        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                  > 1800000000
                               OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             THEN 1 ELSE 0 END new_s
                 FROM (SELECT user_id, event_id,
                              unix_micros(cast(ts as timestamp)) ts
                       FROM events)))
        GROUP BY user_id, session_id
        ORDER BY user_id NULLS LAST, session_id NULLS LAST""",
    "B13_exact_dedup": """
        SELECT count(*) kept FROM
          (SELECT min(doc_id) FROM documents GROUP BY sha2(lower(trim(text)), 256))""",
    "B14_cosine_topk": """
        SELECT * FROM (SELECT pid, vec_id,
            row_number() OVER (PARTITION BY pid ORDER BY sim DESC, vec_id) rn
          FROM (SELECT p.vec_id pid, e.vec_id,
                  aggregate(zip_with(p.embedding, e.embedding,
                                     (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                            0D, (a, x) -> a + x)
                  / (sqrt(aggregate(transform(p.embedding, x -> CAST(x AS DOUBLE) * x),
                                    0D, (a, x) -> a + x))
                     * sqrt(aggregate(transform(e.embedding, x -> CAST(x AS DOUBLE) * x),
                                      0D, (a, x) -> a + x))) sim
                FROM (SELECT * FROM embeddings WHERE vec_id < 10) p
                CROSS JOIN embeddings e WHERE e.vec_id <> p.vec_id))
        WHERE rn <= 5 ORDER BY pid NULLS LAST, rn NULLS LAST""",
    "B15_anti_join": "SELECT count(*) n FROM customer LEFT ANTI JOIN orders ON c_custkey = o_custkey",
}

# Evaluate each shape AS DECLARED, mirroring graft.Bench's r10 protocol:
# DataFrame .count() plants an aggregate above the query and lets Catalyst
# prune for that consumer — B10's JSON parse (an aggregate VALUE under a
# count-over-groupBy) was eliminated entirely, timing 0.096 s for a 1M-row
# parse and turning the twin ratios into honest-vs-vacuous comparisons
# (three shapes read >5x while both engines ran the same plan shape).
# toRdd preserves the declared output schema; nothing reaches the driver.
def evaluate(sql):
    spark.sql(sql)._jdf.queryExecution().toRdd().count()

# untimed warmup pass, then k timed passes per shape (same protocol as
# graft.Bench with SPARK_GRAFT_REPEAT=k): median kills the single-shot
# wobble that dominates sub-second shapes
for name, sql in Q.items():
    evaluate(sql)
res, spread = {}, {}
for name, sql in Q.items():
    times = []
    for _ in range(K):
        t0 = time.time()
        evaluate(sql)
        times.append(time.time() - t0)
    res[name] = round(statistics.median(times), 4)
    spread[name] = [round(min(times), 4), round(max(times), 4)]

print(json.dumps({"metric": "baseline_total", "value": round(sum(res.values()), 3),
                  "unit": "sec", "k": K, "queries": res, "spread": spread,
                  "sf": SF, "cpus": CPUS}))
spark.stop()
