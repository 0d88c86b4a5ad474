package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100 TB layout utilities (SURVEY.md §4 custom rows): rowkey salting for
  * hot-spot spreading, salted range scans, skew-salted joins, and
  * bucketed co-located joins. These are the write-path / layout levers a
  * large deployment combines with the query operators.
  */
object ScaleOps {

  // ------------------------------------------------------------- salting

  /** HBase hot-spot pattern: prefix the rowkey with hash(key) % n so
    * monotonically-increasing keys spread across n regions/partitions.
    * Deterministic (crc32), so readers can recompute the salt.
    */
  def saltKey(key: Column, buckets: Int): Column =
    concat(lpad((crc32(key) % buckets).cast("string"), 2, "0"), lit("|"), key)

  /** Salted table: adds salted_key and range-partitions by it — the A5
    * bulk-load write path with hot-spot spreading.
    */
  def saltTable(df: DataFrame, key: Column, buckets: Int, partitions: Int): DataFrame =
    df.withColumn("salted_key", saltKey(key, buckets))
      .repartitionByRange(partitions, col("salted_key"))
      .sortWithinPartitions("salted_key")

  /** Salted range scan (the API-layer expansion SURVEY §4 chose over a
    * Catalyst rule): a logical `key BETWEEN lo AND hi` becomes the union
    * of the per-salt ranges `s|lo .. s|hi`, each of which min/max-prunes
    * independently. Expressed as one OR predicate so it stays a single
    * scan with n pushable ranges.
    */
  def saltedRangeScan(salted: DataFrame, lo: String, hi: String, buckets: Int): DataFrame = {
    val pred = (0 until buckets)
      .map(s => f"$s%02d|")
      .map(p => col("salted_key").between(p + lo, p + hi))
      .reduce(_ || _)
    salted.where(pred)
  }

  // ----------------------------------------------------------- skew join

  /** Skew-salted join: replicate the build side `factor` times and
    * scatter the probe side's hot keys across the replicas — the manual
    * fallback when AQE's OptimizeSkewedJoin can't help (e.g. skewed
    * aggregation feeding a join). Result is identical to
    * `big.join(small, bigKey === smallKey)`.
    */
  def skewSaltedJoin(big: DataFrame, small: DataFrame,
                     bigKey: Column, smallKey: Column,
                     factor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(explodedSmall,
      bigKey === smallKey && saltedBig("_salt") === explodedSmall("_salt"))
      .drop("_salt")
  }

  // ----------------------------------------------------------- bucketing

  /** Write both join sides bucketed by the join key: subsequent equi-joins
    * on that key are exchange-free (bucket-local), the co-located-join
    * layout for repeated 100 TB joins.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two previously-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  // -------------------------------------------- partitioned layout / DPP

  /** Hive-style partitioned layout for the cells/events data: directory
    * per partition value, so qualifier/event-type predicates prune whole
    * directories at plan time (static) and join-derived predicates prune
    * at runtime (dynamic partition pruning). At 100 TB this, plus the
    * rowkey sort within files, is the read-path layout.
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)

  /** Read back a partitioned layout. */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  // ------------------------------------------------------------ z-order

  /** Bit-interleave two `bits`-wide non-negative longs into a z-value —
    * 2·bits codegen'd integer ops (shift/and/or builtins), no UDF, so the
    * whole computation fuses into the write stage.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    // beyond 32 the interleaved shift 2*i+1 exceeds 63 and the JVM wraps
    // shift amounts mod 64, silently folding one dimension's high bits
    // onto the other's low positions
    require(bits >= 1 && bits <= 32, s"interleaveBits: bits must be in [1, 32], got $bits")
    (0 until bits).map(i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)))
      .reduce(_.bitwiseOR(_))
  }

  /** Z-order (Morton-curve) layout over two numeric dimensions: quantize
    * each to `bits` bits by linear min/max scaling (min/max are 4 driver
    * values — bounded metadata, same class as [[distributedNtile]]'s
    * offsets), interleave, then range-partition + sort files by the
    * z-value. A file then covers a RECTANGLE of the (a, b) space rather
    * than a stripe of one dimension, so parquet min/max pruning works for
    * range predicates on EITHER column and for 2-d boxes — the standard
    * multi-dimensional clustering layout (Delta/Iceberg `OPTIMIZE
    * ZORDER`) for 100 TB tables queried along more than one axis.
    * ScaleOpsSpec measures the effect: a time-range query over a
    * user-sorted layout touches every file; over the z-ordered layout it
    * touches a fraction.
    */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
                  bits: Int = 16, partitions: Int = 32): Unit = {
    val Array(row) = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect()
    require(!row.isNullAt(0) && !row.isNullAt(2),
      s"zorderWrite: input has no non-null ($colA, $colB) rows to lay out")
    val (loA, hiA, loB, hiB) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    val maxQ = (1L << bits) - 1
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(maxQ), greatest(lit(0L),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxQ.toDouble)).cast("long")))
    val z = interleaveBits(quant(col(colA), loA, hiA), quant(col(colB), loB, hiB), bits)
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }

  // ------------------- distributed global prefix shapes (ntile, cumsum)

  /** Shared scaffold of the two-job exact-global-prefix operators:
    * range-partition `df` on the sort key (shuffle 1, parallel), compute
    * one LONG total per partition with `perPartition` (driver-side —
    * `partitions` longs, bounded), and return the partitioned frame
    * joined with each partition's exclusive prefix as `_offset`, plus the
    * grand total. Callers finish with a per-`_pid` window (shuffle 2,
    * still parallel) and must drop `_pid`/`_offset`.
    *
    * localCheckpoint — NOT cache — pins the range-partition assignment
    * across the totals job and the caller's window job (boundary sampling
    * would otherwise rerun per job): a cache() entry is plan-matched by
    * the CacheManager, so Bench's timed pass would silently read the
    * warmup pass's cache and under-report the operator's real cost.
    * localCheckpoint is per-invocation and leaves nothing registered.
    */
  private def withRangeOffsets(df: DataFrame, sortCols: Seq[Column],
      partitions: Int, perPartition: Column): (DataFrame, Long) = {
    val parted = df.repartitionByRange(partitions, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // isNullAt guard: an all-null sum() partition must contribute 0 to the
    // offsets (matching window-sum semantics), not NPE on getLong
    val totals = parted.groupBy("_pid").agg(perPartition.as("_t")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val offsets = (0 until partitions).scanLeft(0L) {
      case (acc, pid) => acc + totals.getOrElse(pid, 0L)
    }
    val offsetDf = parted.sparkSession.createDataFrame(
      (0 until partitions).map(pid => (pid, offsets(pid))))
      .toDF("_pid", "_offset")
    (parted.join(broadcast(offsetDf), "_pid"), offsets.last)
  }

  /** Exact global ntile without a single-partition window — the scale
    * path for the E3/E4 class of inherently-global rankings.
    *
    * Rank locally per range partition, add the broadcast global offset
    * for the exact global rank; the ntile formula is then a scalar
    * expression. Bit-identical to `ntile(n) OVER (ORDER BY sortCols)`
    * for a total order (caller supplies the unique tiebreak per
    * determinism rule R1).
    */
  def distributedNtile(df: DataFrame, sortCols: Seq[Column], n: Int,
                       partitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (parted, total) = withRangeOffsets(df, sortCols, partitions, count(lit(1)))
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
    val ranked = parted
      .withColumn("_lrank", row_number().over(w))
      .withColumn("_grank", col("_offset") + col("_lrank"))
    // ntile semantics: first (total % n) tiles hold ceil(total/n) rows
    val base = total / n
    val rem = total % n
    val cut = rem * (base + 1)
    ranked.withColumn("tile",
      when(col("_grank") <= cut, ((col("_grank") - 1) / (base + 1)).cast("int") + 1)
        .otherwise(lit(rem).cast("int")
          + ((col("_grank") - 1 - cut) / math.max(base, 1)).cast("int") + 1))
      .drop("_pid", "_offset", "_lrank", "_grank")
  }

  /** Exact global running sum of `valueCol` (as LONG) in `sortCols` order,
    * appended as column `cum` (inclusive) — WITHOUT a single-partition
    * window: the scale path for the E7/J21 class of inherently-sequential
    * prefix computations (token-budget sharding, byte-offset assignment).
    * Each partition computes its local prefix sum and adds its broadcast
    * global offset. Bit-identical to `sum(v) OVER (ORDER BY sortCols ROWS
    * UNBOUNDED PRECEDING)` for a total order (caller supplies the unique
    * tiebreak per determinism rule R1); pinned in ScaleOpsSpec.
    */
  def distributedCumsum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                        partitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withV = df.withColumn("_v", valueCol.cast("long"))
    val (parted, _) = withRangeOffsets(withV, sortCols, partitions, sum("_v"))
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.withColumn("_lcum", sum(col("_v")).over(w))
      .withColumn("cum", col("_offset") + col("_lcum"))
      .drop("_pid", "_offset", "_lcum", "_v")
  }
}
