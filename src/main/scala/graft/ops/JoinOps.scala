package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** C family — joins (SURVEY.md §2.4).
  *
  * Scale posture: dimension tables (nation, region, part at fixture scale)
  * are broadcast — no shuffle of the fact side. Fact⋈fact joins
  * (customer⋈orders⋈lineitem) shuffle on the join key and rely on AQE for
  * skew split + partition coalescing. Nothing collects to the driver.
  */
object JoinOps {

  /** c1 — flagship: 3-way inner join, revenue by market segment.
    * customer⋈orders shuffles on custkey, then ⋈lineitem on orderkey;
    * Catalyst picks sort-merge or shuffled-hash per stats, AQE may demote
    * to broadcast at runtime when a side is small.
    */
  val c1_join_inner: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    // R2: cast each factor (exact 2-decimal data) to decimal BEFORE the
    // multiply — double products can land on .005 ties that Spark and
    // DuckDB round differently.
    val rev = sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
      .cast(DecimalType(38, 4)).cast("double")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), rev.as("rev"))
      .orderBy(col("c_mktsegment").asc_nulls_last)
  }

  /** c2 — explicit broadcast hash join: nation (25 rows — and small at any
    * realistic SF) is broadcast to every executor; customer never shuffles.
    */
  val c2_join_broadcast: Q = (s, d) => {
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    c.join(broadcast(n), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n_name").asc_nulls_last)
  }

  val c3_join_left: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .agg(
        count(lit(1)).as("total"),
        count_if(col("o_orderkey").isNull).as("unmatched"))
  }

  val c4_join_right: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    o.join(c, col("c_custkey") === col("o_custkey"), "right")
      .agg(
        count(lit(1)).as("total"),
        count_if(col("c_custkey").isNull).as("unmatched"))
  }

  val c5_join_full: Q = (s, d) => {
    val p = Tables.part(s, d).select(col("p_partkey"))
    val l = Tables.lineitem(s, d).select(col("l_partkey")).distinct()
    p.join(l, col("p_partkey") === col("l_partkey"), "full")
      .agg(count(lit(1)).as("n"))
  }

  val c6_join_semi: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
  }

  val c7_join_anti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
  }

  val c8_join_cross: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d)).agg(count(lit(1)).as("n"))

  /** c9 — theta join; tiny distinct sides, planned as BroadcastNestedLoop. */
  val c9_join_theta: Q = (s, d) => {
    val a = Tables.part(s, d).select(col("p_size").as("a_size")).distinct()
    val b = Tables.part(s, d).select(col("p_size").as("b_size")).distinct()
    a.join(b, col("a_size") < col("b_size")).agg(count(lit(1)).as("n"))
  }

  /** c10 — as-of join (latest click at-or-before each error, per user),
    * expressed as the portable unbounded-preceding window rather than a
    * pairwise self-join: O(n log n) per user partition instead of O(n²),
    * which is the formulation that survives 100 TB.
    */
  val c10_join_asof: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prior_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "error" && col("prior_click").isNotNull)
      .agg(count(lit(1)).as("with_prior_click"))
  }

  /** c11 — interval/band join: equi on user_id bounds the shuffle; the band
    * predicate on ts filters within each joined group. At 100 TB the equi
    * key keeps this a hash join, never a nested loop over the full corpus.
    */
  val c11_join_interval: Q = (s, d) => {
    val a = Tables.events(s, d).select(
      col("user_id"), col("event_id").as("a_id"),
      Tables.tsMicros(col("ts")).as("a_ts"))
    val b = Tables.events(s, d).select(
      col("user_id").as("b_user"), col("event_id").as("b_id"),
      Tables.tsMicros(col("ts")).as("b_ts"))
    a.join(b,
        col("user_id") === col("b_user") &&
        col("a_id") < col("b_id") &&
        col("b_ts").between(col("a_ts"), col("a_ts") + lit(3600000000L))) // 1 h in µs
      .agg(count(lit(1)).as("pairs"))
  }

  /** c13 — scalar subquery: orders above the global average price. The
    * average obeys R2 (exact decimal sum, one double division); the
    * single-row aggregate is broadcast, so the comparison is a map-side
    * filter over the fact scan at any scale.
    */
  val c13_join_scalar_subq: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val thr = o.agg(davg(col("o_totalprice")).as("thr"))
    o.join(broadcast(thr), col("o_totalprice") > col("thr"))
      .agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, Q] = Map(
    "c13_join_scalar_subq" -> c13_join_scalar_subq,
    "c1_join_inner" -> c1_join_inner,
    "c2_join_broadcast" -> c2_join_broadcast,
    "c3_join_left" -> c3_join_left,
    "c4_join_right" -> c4_join_right,
    "c5_join_full" -> c5_join_full,
    "c6_join_semi" -> c6_join_semi,
    "c7_join_anti" -> c7_join_anti,
    "c8_join_cross" -> c8_join_cross,
    "c9_join_theta" -> c9_join_theta,
    "c10_join_asof" -> c10_join_asof,
    "c11_join_interval" -> c11_join_interval)
}
