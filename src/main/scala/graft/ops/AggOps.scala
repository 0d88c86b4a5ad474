package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** D family — aggregation (SURVEY.md §2.5).
  *
  * Every groupBy here compiles to HashAggregateExec with an automatic
  * partial (map-side) + final split, so the shuffle carries one row per
  * (partition, group), not per input row — the property that keeps these
  * linear at 100 TB. Decimal-exact sums per R2 keep partial aggregation
  * order-independent across any executor count.
  */
object AggOps {

  val d1_agg_basic: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"),
        dsum(col("l_quantity")).as("s"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)

  /** d2 — R2 average: exact decimal sum, single deterministic division. */
  val d2_agg_avg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(davg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("o_orderpriority").asc_nulls_last)

  /** d3 — exact COUNT(DISTINCT): Catalyst expands to a two-phase plan. */
  val d3_agg_distinct: Q = (s, d) =>
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("dp"),
      countDistinct(col("l_suppkey")).as("ds"))

  /** d5 — GROUPING SETS via the Dataset API (Spark 4 groupingSets). */
  val d5_agg_gsets: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val d6_agg_rollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val d7_agg_cube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** d8 — collect_set, order-normalized per R1 (raw collect order is
    * nondeterministic by partitioning — never exposed).
    */
  val d8_agg_collect: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(concat_ws(",", array_sort(collect_set(col("c_nationkey")))).as("nations"))
      .orderBy(col("c_mktsegment").asc_nulls_last)

  /** d9 — exact median, linear interpolation (same formula both engines). */
  val d9_agg_median: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("med"))
      .orderBy(col("l_returnflag").asc_nulls_last)

  /** d10 — stddev via R3 exact decimal sums of x and x², one double formula
    * at the end (builtin Welford accumulators differ across engines).
    */
  val d10_agg_stddev: Q = (s, d) => {
    val p = col("o_totalprice").cast(DecimalType(18, 2))
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(p * p).cast("double").as("s2"),
        sum(p).cast("double").as("s1"),
        count(lit(1)).as("cnt"))
      .select(
        col("o_orderstatus"),
        // round(.,4): DuckDB converts DECIMAL->DOUBLE as hugeint/10^scale
        // (two roundings) vs Spark's single correctly-rounded cast — a
        // last-ulp gap at sf>=0.1 sum magnitudes; 4 decimals is exact for
        // both well away from the divergence scale
        round(sqrt((col("s2") - col("s1") * col("s1") / col("cnt")) / (col("cnt") - 1)), 4).as("sd"))
      .orderBy(col("o_orderstatus").asc_nulls_last)
  }

  /** d11 — argmax with deterministic tiebreak via struct ordering. */
  val d11_agg_argmax: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"))
      .orderBy(col("o_custkey").asc_nulls_last)
      .limit(300)

  /** d12 — conditional aggregation. */
  val d12_agg_condagg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DecimalType(38, 2))
          .cast("double").as("spend"),
        count_if(col("event_type") === "error").as("errors"))
      .orderBy(col("user_id").asc_nulls_last)
      .limit(200)

  /** d13 — HBase Increment: counter value = sum of put deltas per rowkey. */
  val d13_hbase_increment: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("op") === "put")
      .groupBy(col("rowkey"))
      .agg(dsum(col("value")).as("counter"))
      .orderBy(col("rowkey").asc_nulls_last)
      .limit(300)

  /** d14 — HBase Append: ordered value concatenation per rowkey. */
  val d14_hbase_append: Q = (s, d) =>
    Tables.cells(s, d)
      .groupBy(col("rowkey"))
      .agg(concat_ws(",", array_sort(collect_list(col("qualifier")))).as("appended"))
      .orderBy(col("rowkey").asc_nulls_last)
      .limit(300)

  /** d17 — HBase CheckAndPut (atomic conditional mutation), batch
    * analog: per USER-keyed row, IF the current latest 'click' cell's
    * value exceeds 30 THEN append a new version of that cell (value+1
    * at ts+1s); the query returns the post-mutation latest view's
    * per-qualifier aggregate, so both the condition evaluation (a
    * latest-version read, HBase's check) and the applied mutation (a
    * newer version winning the next read) are inside the gate. Scale
    * shape: two window passes over the SAME (rowkey, cf, qualifier)
    * coordinate key — one shuffle partitioning reused — plus a union of
    * the mutation sliver; no join, no driver round-trip (a real
    * RegionServer does the check and put server-side for this reason).
    */
  val d17_check_and_put: Q = (s, d) => {
    val cells = Tables.events(s, d).select(
      Tables.pad(col("user_id")).as("rowkey"), lit("e").as("cf"),
      col("event_type").as("qualifier"), Tables.tsMicros(col("ts")).as("ts"),
      col("value"))
    val w = Window.partitionBy("rowkey", "cf", "qualifier")
      .orderBy(col("ts").desc, col("value").asc)
    def latest(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    val muts = latest(cells)
      .where(col("qualifier") === "click" && col("value") > 30.0)
      .select(col("rowkey"), col("cf"), col("qualifier"),
        (col("ts") + 1000000L).as("ts"), (col("value") + 1.0).as("value"))
    latest(cells.unionByName(muts))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** d18 — HBase CheckAndDelete (the conditional-mutation family's other
    * half, beside d17): per coordinate, IF the current latest 'error'
    * cell's value is below 200 THEN place a DeleteColumn tombstone at
    * that latest ts — which, under HBase's equal-ts-delete-wins rule
    * (the a14/b15 semantics), masks the whole column at the next read.
    * The query returns the post-mutation latest view's per-qualifier
    * aggregate, so the condition read, the tombstone placement, AND the
    * masked re-read are all inside the gate. Scale shape: d17's — two
    * window passes over the same (rowkey, cf, qualifier) partitioning
    * plus a union of the tombstone sliver; the tombstone is resolved in
    * the version window (del DESC at equal ts), never by a join.
    */
  val d18_check_and_delete: Q = (s, d) => {
    val cells = Tables.events(s, d).select(
      Tables.pad(col("user_id")).as("rowkey"), lit("e").as("cf"),
      col("event_type").as("qualifier"), Tables.tsMicros(col("ts")).as("ts"),
      col("value"), lit(0).as("del"))
    val w = Window.partitionBy("rowkey", "cf", "qualifier")
      .orderBy(col("ts").desc, col("del").desc, col("value").asc)
    def latest(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    val tombs = latest(cells)
      .where(col("qualifier") === "error" && col("value") < 200.0)
      .select(col("rowkey"), col("cf"), col("qualifier"), col("ts"),
        col("value"), lit(1).as("del"))
    latest(cells.unionByName(tombs))
      .where(col("del") === 0)
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** d19 — HBase RowMutations via checkAndMutate (`Table#checkAndMutate`
    * with a `RowMutations` batch — the atomic multi-mutation the client
    * API offers beside the single-cell d17/d18): per user row, IF the
    * latest 'purchase' cell's value exceeds 100 THEN atomically (i) put
    * an 'audit' cell carrying that purchase value and (ii) place a
    * DeleteColumn tombstone on 'click' — both stamped with ONE batch
    * timestamp (the row's max ts + 1s), which is what makes the pair
    * atomic in the version dimension: no read can observe the put
    * without the delete. The gate reads the post-mutation latest view,
    * so condition read, both mutations, and the masked re-read all sit
    * inside one hash. Scale shape: d17/d18's — the condition is the
    * coordinate version window, the batch ts a second (rowkey-grain)
    * window over the same shuffle's data, the mutation sliver a union
    * resolved in the version window; no join, no driver round-trip.
    */
  val d19_row_mutations: Q = (s, d) => {
    val cells = Tables.events(s, d).select(
      Tables.pad(col("user_id")).as("rowkey"), lit("e").as("cf"),
      col("event_type").as("qualifier"), Tables.tsMicros(col("ts")).as("ts"),
      col("value"), lit(0).as("del"))
    val w = Window.partitionBy("rowkey", "cf", "qualifier")
      .orderBy(col("ts").desc, col("del").desc, col("value").asc)
    def latest(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    val withBatchTs = cells.withColumn("bts",
      max("ts").over(Window.partitionBy("rowkey")) + 1000000L)
    val cond = latest(withBatchTs)
      .where(col("qualifier") === "purchase" && col("value") > 100.0)
      .select(col("rowkey"), col("cf"), col("bts"), col("value"))
    val puts = cond.select(col("rowkey"), col("cf"),
      lit("audit").as("qualifier"), col("bts").as("ts"), col("value"),
      lit(0).as("del"))
    val dels = cond.select(col("rowkey"), col("cf"),
      lit("click").as("qualifier"), col("bts").as("ts"),
      lit(null).cast("double").as("value"), lit(1).as("del"))
    latest(cells.unionByName(puts).unionByName(dels))
      .where(col("del") === 0)
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** d16 — boolean aggregates (every/any). */
  val d16_agg_bool: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_last)

  val queries: Map[String, Q] = Map(
    "d16_agg_bool" -> d16_agg_bool,
    "d17_check_and_put" -> d17_check_and_put,
    "d18_check_and_delete" -> d18_check_and_delete,
    "d19_row_mutations" -> d19_row_mutations,
    "d1_agg_basic" -> d1_agg_basic,
    "d2_agg_avg" -> d2_agg_avg,
    "d3_agg_distinct" -> d3_agg_distinct,
    "d5_agg_gsets" -> d5_agg_gsets,
    "d6_agg_rollup" -> d6_agg_rollup,
    "d7_agg_cube" -> d7_agg_cube,
    "d8_agg_collect" -> d8_agg_collect,
    "d9_agg_median" -> d9_agg_median,
    "d10_agg_stddev" -> d10_agg_stddev,
    "d11_agg_argmax" -> d11_agg_argmax,
    "d12_agg_condagg" -> d12_agg_condagg,
    "d13_hbase_increment" -> d13_hbase_increment,
    "d14_hbase_append" -> d14_hbase_append)
}
