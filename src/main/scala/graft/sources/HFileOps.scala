package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed HFile bulk write/read over the canonical cells layout —
  * the HBase bulk-load path (`BASELINE.json`: "Bulk read/write via HBase
  * connector") re-expressed Spark-first with our own v3 codec
  * ([[HFileCodec]]) since no connector jar resolves offline.
  *
  * Write path = exactly what HFileOutputFormat2 requires of its input
  * [public: o.a.h.hbase.mapreduce.HFileOutputFormat2]: cells globally
  * range-partitioned by rowkey (one partition per region) and sorted by
  * (rowkey, cf, qualifier, ts DESC) within each; each executor then streams
  * its partition into one region file. No driver-side collect anywhere —
  * at 100 TB this is N executors each writing its own region file, the
  * same shape as a real bulk load.
  */
object HFileOps {

  /** Canonical cells schema (FIXTURES.md §F3) — what [[read]] returns. */
  val cellsSchema: StructType = StructType(Seq(
    StructField("rowkey", StringType), StructField("cf", StringType),
    StructField("qualifier", StringType), StructField("ts", LongType),
    StructField("value", DoubleType), StructField("op", StringType)))

  /** Bulk-write a cells DataFrame as `regions` HFile region files under
    * `dir`. Returns the file names written (small: one per region).
    *
    * Files are written to a task-temp name then atomically renamed —
    * speculative/retried tasks can't leave a torn file behind (the same
    * commit discipline as Hadoop output committers).
    */
  def bulkWrite(cells: DataFrame, dir: String, regions: Int,
                blockSize: Int = 64 * 1024): Seq[String] = {
    Files.createDirectories(Paths.get(dir))
    val sorted = cells
      .repartitionByRange(regions, col("rowkey"))
      .sortWithinPartitions(col("rowkey").asc, col("cf").asc,
        col("qualifier").asc, col("ts").desc)
      .select("rowkey", "cf", "qualifier", "ts", "value", "op")
    sorted.rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      if (it.isEmpty) Iterator.empty
      else {
        val cellsIt = it.map { r =>
          HFileCodec.HCell(
            r.getString(0).getBytes(UTF_8), r.getString(1).getBytes(UTF_8),
            r.getString(2).getBytes(UTF_8), r.getLong(3),
            if (r.getString(5) == "delete") HFileCodec.TypeDelete
            else HFileCodec.TypePut,
            java.nio.ByteBuffer.allocate(8).putDouble(r.getDouble(4)).array())
        }
        val name = f"region-$pid%05d.hfile"
        val tmp = Paths.get(dir, s".$name.${TaskContext.get.taskAttemptId}.tmp")
        // stream the codec straight to disk: a region file bigger than the
        // task heap writes fine (O(blockSize) memory, see HFileCodec.write)
        val os = new java.io.BufferedOutputStream(Files.newOutputStream(tmp), 1 << 16)
        try HFileCodec.write(cellsIt, os, blockSize) finally os.close()
        Files.move(tmp, Paths.get(dir, name),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(name)
      }
    }.collect().toSeq.sorted
  }

  /** Pick a region count from the cell count, the way HBase sizes regions
    * by bytes: ~1M cells (≈90 MB serialized) per region file keeps both the
    * write task and the whole-file read task comfortably inside a normal
    * executor heap, at any input scale. Floor of 4 preserves multi-region
    * coverage on the small fixtures; cap of 4096 bounds tiny-file count.
    */
  def regionCountFor(cellCount: Long): Int =
    math.min(4096L, math.max(4L, (cellCount + (1L << 20) - 1) / (1L << 20))).toInt

  /** Read every region file under `dir` back into the cells schema —
    * one task per region file, each STREAMING its file block-by-block
    * ([[HFileCodec.readStreaming]]): per-task heap is O(blockSize)
    * regardless of region size, the same bound a region server's block
    * reader has. (A whole-file `binaryFile` read held each region as one
    * byte array — 32 concurrent multi-hundred-MB humongous allocations
    * OOM'd an 8 GB heap at the 100M-row smoke scale.) The driver-side
    * listing is one name per region — bounded, never data.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val paths = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".hfile")).toSeq.sorted
    val rows = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { p =>
        val in = new java.io.BufferedInputStream(
          Files.newInputStream(Paths.get(p)), 1 << 16)
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        HFileCodec.readStreaming(in).map { c =>
          Row(new String(c.row, UTF_8), new String(c.family, UTF_8),
            new String(c.qualifier, UTF_8), c.ts,
            java.nio.ByteBuffer.wrap(c.value).getDouble,
            if (c.typ == HFileCodec.TypeDelete) "delete" else "put")
        }
      }
    spark.createDataFrame(rows, cellsSchema)
  }
}
