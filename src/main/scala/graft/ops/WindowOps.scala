package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.6 E — window functions, plus the two streaming batch twins
  * (§2.10 i2/i4) that share the window machinery.
  *
  * Scale notes: every window here is partitioned by a key (user/custkey/
  * event_type) except e4, whose input (nation) is 25 rows at every scale
  * factor, making a global window free. e3's global ntile runs through
  * ScaleOps.distributedNtile (range partition + local rank + offsets) and
  * e8's global range frame through a distinct-value band join — both
  * exact, and parallel at any scale.
  */
object WindowOps {

  /** e1: newest/most-expensive order per customer via row_number. */
  def e1_win_rownum: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
      .orderBy(asc_nulls_last("o_custkey")).limit(300)
  }

  /** e2: rank vs dense_rank divergence on p_brand/p_size ties. */
  def e2_win_rank: Q = (s, d) => {
    val wr = Window.partitionBy("p_brand").orderBy(col("p_size"), col("p_partkey"))
    val wd = Window.partitionBy("p_brand").orderBy(col("p_size"))
    Tables.part(s, d)
      .select(col("p_brand"), col("p_size"),
        rank().over(wr).as("rnk"), dense_rank().over(wd).as("drnk"))
      .where(col("rnk") <= 3)
      .orderBy(asc_nulls_last("p_brand"), asc_nulls_last("rnk"), asc_nulls_last("p_size"))
  }

  /** e3: decile assignment over a total order (R1: unique-key tiebreak),
    * via the distributed exact ntile — see the object doc scale note.
    */
  def e3_win_ntile: Q = (s, d) =>
    ScaleOps.distributedNtile(Tables.orders(s, d),
      Seq(col("o_totalprice"), col("o_orderkey")), 10,
      partitions = s.sparkContext.defaultParallelism)
      .groupBy("tile")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("mn"))
      .orderBy(asc_nulls_last("tile"))

  /** e4: percent_rank / cume_dist (25-row nation — global window is fine). */
  def e4_win_pctrank: Q = (s, d) => {
    val w = Window.orderBy(col("n_nationkey"))
    Tables.nation(s, d)
      .select(col("n_name"), percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy(asc_nulls_last("n_name"))
  }

  /** e5: lag — inter-event gap stats per user, in epoch-µs (the fixture's
    * native ts precision; `div` keeps the tick arithmetic integer-exact).
    */
  def e5_win_lag: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("user_id"), col("event_id"), Tables.tsMicros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev.select((col("us") - lag("us", 1).over(w)).as("gap"))
      .where(col("gap").isNotNull)
      .agg(count(lit(1)).as("gaps"),
        sum(expr("gap div 1000").cast(DecimalType(18, 0))).cast("long").as("total_ms"))
  }

  /** e6: first_value / last_value with an explicit unbounded frame. */
  def e6_win_nth: Q = (s, d) => {
    val wBase = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wFull = wBase.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"),
        first("event_type").over(wBase).as("first_val"),
        last("event_type").over(wFull).as("last_val"),
        row_number().over(wBase).as("rn"))
      .where(col("rn") === 1)
      .select("user_id", "first_val", "last_val")
      .orderBy(asc_nulls_last("user_id"))
  }

  /** e7: running decimal revenue per customer's order history (R2). */
  def e7_win_running: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DecimalType(38, 2))
          .cast("double").as("run"))
      .orderBy(asc_nulls_last("o_custkey"), asc_nulls_last("o_orderkey")).limit(500)
  }

  /** e8: value-range frame on an int column.
    *
    * A global `RANGE BETWEEN -5 AND CURRENT ROW` frame depends only on the
    * row's own p_size value (RANGE frames include all peers), so instead of
    * a single-partition global WindowExec — which `part` outgrows at scale —
    * the band count is computed once per distinct p_size on a tiny
    * aggregate, band-self-joined there, and broadcast back onto the fact
    * rows. Bit-identical to the window form; no global shuffle-to-one.
    */
  def e8_win_range: Q = (s, d) => {
    val sizeCounts = Tables.part(s, d).groupBy("p_size")
      .agg(count(lit(1)).as("c"))
    val banded = sizeCounts.as("a")
      .join(broadcast(sizeCounts.select(col("p_size").as("b_size"), col("c").as("b_c"))),
        col("b_size").between(col("p_size") - 5, col("p_size")))
      .groupBy("p_size").agg(sum("b_c").as("cnt"))
    Tables.part(s, d)
      .join(broadcast(banded), "p_size")
      .select(col("p_partkey"), col("cnt"))
      .orderBy(asc_nulls_last("p_partkey")).limit(300)
  }

  /** e9: top-3 spenders per event_type — agg then windowed top-k. */
  def e9_win_topk_group: Q = (s, d) => {
    val spend = Tables.events(s, d)
      .groupBy("event_type", "user_id")
      .agg(dsum(col("value")).as("spend"))
    val w = Window.partitionBy("event_type").orderBy(col("spend").desc, col("user_id"))
    spend.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("event_type", "user_id", "spend")
      .orderBy(asc_nulls_last("event_type"), desc("spend"), asc_nulls_last("user_id"))
  }

  /** i2 batch twin: tumbling 1h window = integer-division time bucket
    * over epoch-µs (bucket values identical to the pre-regeneration ns
    * spelling: floor(ns/3.6e12) == floor(µs/3.6e9)).
    */
  def i2_window_tumbling_batch: Q = (s, d) =>
    Tables.events(s, d)
      .select(Tables.tsMicros(col("ts")).as("us"), col("event_type"), col("value"))
      .groupBy(expr("us div 3600000000").cast("long").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
      .orderBy(asc_nulls_last("hour_bucket"), asc_nulls_last("event_type"))

  /** i3 batch twin: sliding 1h window, 15m step. With width = 4·step every
    * event lands in exactly 4 windows, so the batch form is an explode of
    * the 4 window starts (pure integer arithmetic on epoch-µs — exact on
    * both engines) followed by an ordinary partial+final aggregation. One
    * shuffle on (win_start, event_type); the 4× row expansion happens
    * map-side inside the scan stage, never materialized.
    */
  def i3_window_sliding_batch: Q = (s, d) => {
    val step = 900000000L // 15 min in µs
    Tables.events(s, d)
      .select(col("event_type"), col("value"),
        explode(sequence(lit(0), lit(3))).as("i"),
        Tables.tsMicros(col("ts")).as("us"))
      .select(col("event_type"), col("value"),
        ((expr("us div 900000000") - col("i")) * step).as("win_start"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
      .orderBy(asc_nulls_last("win_start"), asc_nulls_last("event_type"))
  }

  /** i4 batch twin: 30-min-gap sessionization via lag + running sum —
    * the classic distributed sessionizer (per-user partitioned windows;
    * scales linearly with user count).
    */
  def i4_window_session_batch: Q = (s, d) => {
    val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), Tables.tsMicros(col("ts")).as("us"))
      .select(col("user_id"), col("event_id"), col("us"),
        when(col("us") - lag("us", 1).over(wOrd) > 1800000000L // 30 min in µs
          || lag("us", 1).over(wOrd).isNull, 1).otherwise(0).as("new_s"))
      .withColumn("session_id", sum("new_s").over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_last("user_id"), asc_nulls_last("session_id"))
  }

  def queries: Map[String, Q] = Map(
    "e1_win_rownum" -> e1_win_rownum,
    "e2_win_rank" -> e2_win_rank,
    "e3_win_ntile" -> e3_win_ntile,
    "e4_win_pctrank" -> e4_win_pctrank,
    "e5_win_lag" -> e5_win_lag,
    "e6_win_nth" -> e6_win_nth,
    "e7_win_running" -> e7_win_running,
    "e8_win_range" -> e8_win_range,
    "e9_win_topk_group" -> e9_win_topk_group,
    "i2_window_tumbling_batch" -> i2_window_tumbling_batch,
    "i3_window_sliding_batch" -> i3_window_sliding_batch,
    "i4_window_session_batch" -> i4_window_session_batch)
}
