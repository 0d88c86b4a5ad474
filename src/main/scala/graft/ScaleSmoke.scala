package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale smoke: synthesizes an events table 100× the bench fixture
  * (10M rows, user cardinality scaled ×100 so per-user density stays
  * constant — the realistic growth axis) and runs the heaviest declared
  * operators against it. Proves the scale paths — distributed ntile,
  * window-partitioned version/tombstone semantics, bounded-heap top-k,
  * sessionization, HFile bulk write/read — complete without driver
  * materialization or a single-partition stage, and shows how cost grows
  * vs the sf0.1 numbers in BASELINE.md.
  *
  * Not part of `sbt test` (it's a ~1 GB, minutes-long run):
  * `sbt "runMain graft.ScaleSmoke"`; results recorded in docs/SCALE.md.
  */
object ScaleSmoke {

  val heavies = Seq(
    "a5_bulkload_splits",     // distributed exact ntile over all rowkeys
    "b7_latest_cells",        // latest-version window over every cell
    "b15_tombstone_mask",     // delete-masking window
    "b17_compaction",         // TTL + tombstone + version-cap composition
    "e9_win_topk_group",      // bounded-heap TopKPerGroup path
    "c10_join_asof",          // as-of window by user
    "i4_window_session_batch",// lag + running-sum sessionization
    "d13_hbase_increment",    // counter aggregation per rowkey
    "a9_hfile_roundtrip")     // full HFile bulk write + read back

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SMOKE_ROWS", "10000000").toLong
    val users = math.max(1L, n / 67L) // keeps ~67 events/user like the fixtures
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_$n"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteWindowTopK)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKStrategy)

    if (!new java.io.File(s"$dir/events.parquet").exists()) {
      val t0 = 1704067200000000000L // 2024-01-01 in nanos
      val month = 30L * 86400L * 1000000000L
      spark.range(n).select(
        col("id").as("event_id"),
        (lit(t0) + (xxhash64(col("id"), lit(1)).bitwiseAND(Long.MaxValue)) % month).as("ts"),
        (xxhash64(col("id"), lit(2)).bitwiseAND(Long.MaxValue) % users).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
          ((col("id") % 5) + 1).cast("int")).as("event_type"),
        round((xxhash64(col("id"), lit(3)).bitwiseAND(Long.MaxValue) % 56021L) / 100.0, 2)
          .as("value"),
        concat(lit("{\"k\": "), (col("id") % 100).cast("string"), lit("}")).as("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }

    val results = heavies.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$name%-26s $sec%8.2fs  ($rows rows)")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","rows":$n,"value":${results.map(_._2).sum},"unit":"sec","queries":$qs}""")
    spark.stop()
  }
}
