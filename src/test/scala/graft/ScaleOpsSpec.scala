package graft

import graft.ops.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSuite {

  test("salted range scan returns exactly the rows of the logical range") {
    val cells = Tables.cells(spark, sf)
    val lo = "000000000010:000000000000"
    val hi = "000000000020:999999999999"
    val expected = cells.where(col("rowkey").between(lo, hi)).count()
    val salted = ScaleOps.saltTable(cells, col("rowkey"), buckets = 8, partitions = 4)
    val got = ScaleOps.saltedRangeScan(salted, lo, hi, buckets = 8).count()
    assert(got == expected)
  }

  test("salting spreads a monotonically increasing key across buckets") {
    import spark.implicits._
    val seqKeys = (1 to 1000).map(i => f"$i%012d").toDF("k")
    val spread = seqKeys.select(ScaleOps.saltKey(col("k"), 8).substr(1, 2).as("salt"))
      .groupBy("salt").count().collect()
    assert(spread.length == 8, s"only ${spread.length} salt buckets used")
    assert(spread.map(_.getLong(1)).max < 400, "salting left a hot bucket")
  }

  test("skew-salted join equals the plain join") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment").count()
    val salted = ScaleOps.skewSaltedJoin(orders, customer,
      orders("o_custkey"), customer("c_custkey"))
      .groupBy("c_mktsegment").count()
    assert(salted.collect().map(_.toString).sorted
      .sameElements(plain.collect().map(_.toString).sorted))
  }

  test("bucketed join is exchange-free on the bucket key") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Seq("c_bkt", "o_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    ScaleOps.writeBucketed(Tables.customer(spark, sf), "c_bkt", "c_custkey", 4)
    ScaleOps.writeBucketed(
      Tables.orders(spark, sf).withColumnRenamed("o_custkey", "c_custkey"),
      "o_bkt", "c_custkey", 4)
    // force the sort-merge path (tiny fixtures would broadcast, which
    // hides the property under test: bucket-local, exchange-free SMJ)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleOps.bucketedJoin(spark, "c_bkt", "o_bkt", "c_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // and it is still correct
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val expect = orders.join(customer, orders("o_custkey") === customer("c_custkey")).count()
    assert(ScaleOps.bucketedJoin(spark, "c_bkt", "o_bkt", "c_custkey").count() == expect)
  }

  test("z-order layout localizes both dimensions; a user-sorted layout cannot") {
    import java.nio.file.Files
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      Tables.tsMicros(col("ts")).as("ts")) // z-order quantizes numeric dims
    // layout A: classic single-dimension sort (by user)
    val userDir = Files.createTempDirectory("graft_zorder_user").toString
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id", "ts")
      .write.mode("overwrite").parquet(userDir)
    // layout B: z-order over (user_id, ts)
    val zDir = Files.createTempDirectory("graft_zorder_z").toString
    ScaleOps.zorderWrite(ev, zDir, "user_id", "ts", bits = 12, partitions = 16)
    // same data either way
    val back = spark.read.parquet(zDir)
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).head.getLong(0)
      == ev.agg(sum("event_id")).head.getLong(0))
    // a narrow TIME range: every user emits events across the whole time
    // span, so the user-sorted layout scatters the range over ~all files;
    // the z-curve confines it to the files whose ts-rectangle intersects
    def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).where(pred)
        .select(input_file_name()).distinct().count()
    val Array(r) = ev.agg(min("ts"), max("ts")).collect()
    val (tLo, tHi) = (r.getLong(0), r.getLong(1))
    val cut = tLo + (tHi - tLo) / 20 // lowest 5% of the time range
    val tsPred = col("ts") <= cut
    val userFiles = filesTouched(userDir, tsPred)
    val zFiles = filesTouched(zDir, tsPred)
    assert(userFiles >= 14, s"user-sorted layout unexpectedly pruned: $userFiles")
    assert(zFiles * 2 <= userFiles,
      s"z-order did not localize the time range: $zFiles vs $userFiles files")
    // ...while a USER range still localizes on the z layout too (a
    // rectangle, not a stripe): far fewer than all files
    val Array(u) = ev.agg(min("user_id"), max("user_id")).collect()
    val uCut = u.getLong(0) + (u.getLong(1) - u.getLong(0)) / 20
    val zUserFiles = filesTouched(zDir, col("user_id") <= uCut)
    assert(zUserFiles * 2 <= 16, s"z-order lost user locality: $zUserFiles of 16 files")
  }

  test("distributed ntile equals the global-window ntile bit for bit") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf)
    val sortCols = Seq(col("o_totalprice"), col("o_orderkey"))
    val stock = orders.select(col("o_orderkey"),
      ntile(10).over(Window.orderBy(sortCols: _*)).as("tile"))
    val dist = ScaleOps.distributedNtile(orders, sortCols, 10, partitions = 4)
      .select("o_orderkey", "tile")
    val a = stock.collect().map(_.toString).sorted
    val b = dist.collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // the only window is the per-range-partition local rank (partitioned
    // by _pid) — no global single-partition window anywhere in the plan
    val plan = dist.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("[_pid")),
      s"global window leaked into:\n$plan")
  }

  test("distributed cumsum equals the global running-sum window bit for bit") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), (col("o_orderkey") % 97).as("v"))
    val stock = orders.select(col("o_orderkey"),
      sum("v").over(Window.orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
    val dist = ScaleOps.distributedCumsum(orders, Seq(col("o_orderkey")),
        col("v"), partitions = 4)
      .select("o_orderkey", "cum")
    val a = stock.collect().map(_.toString).sorted
    val b = dist.collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // same invariant as the ntile shape: only per-range-partition windows
    val plan = dist.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("[_pid")),
      s"global window leaked into:\n$plan")
  }

  test("partitioned layout: static pruning hits PartitionFilters, DPP fires on dim join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    ScaleOps.writePartitioned(
      Tables.events(spark, sf).select("event_id", "user_id", "ts", "event_type"),
      dir, "event_type")
    val part = ScaleOps.readPartitioned(spark, dir)

    // static pruning: literal predicate on the partition column reaches
    // PartitionFilters, and only matching rows are read
    val one = part.where(col("event_type") === "click")
    val scan = one.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString
    assert(scan.contains("PartitionFilters: [") && scan.contains("event_type"), scan)
    assert(one.count() ==
      Tables.events(spark, sf).where(col("event_type") === "click").count())

    // dynamic partition pruning: partition keys derived from a filtered
    // dim at runtime
    import spark.implicits._
    // DPP requires a real filtered scan on the pruning side (a
    // LocalRelation is pre-evaluated and skipped by PartitionPruning)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    Seq(("click", 1), ("error", 2)).toDF("et", "code").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // tiny local fixtures fail DPP's size-benefit heuristic; disable the
    // stats estimate so the mechanism itself is observable
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    val prevStats = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val joined = part.join(dim.where(col("code") === 1), part("event_type") === dim("et"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"no DPP in:\n$plan")
      assert(joined.count() ==
        Tables.events(spark, sf).where(col("event_type") === "click").count())
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
    }
  }
}
