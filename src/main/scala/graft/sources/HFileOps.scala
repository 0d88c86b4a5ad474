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
        val bytes = HFileCodec.write(cellsIt, blockSize)
        val name = f"region-$pid%05d.hfile"
        val tmp = Paths.get(dir, s".$name.${TaskContext.get.taskAttemptId}.tmp")
        Files.write(tmp, bytes)
        Files.move(tmp, Paths.get(dir, name),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(name)
      }
    }.collect().toSeq.sorted
  }

  /** Read every region file under `dir` back into the cells schema.
    * `binaryFile` is Spark's distributed whole-file source: one task per
    * region file, decode on executors. Region files are block-indexed and
    * bounded by region size, so per-task memory is bounded the same way a
    * region server's is.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.hfile").load(dir)
      .select("content")
    val rows = files.rdd.flatMap { r =>
      HFileCodec.read(r.getAs[Array[Byte]](0)).map { c =>
        Row(new String(c.row, UTF_8), new String(c.family, UTF_8),
          new String(c.qualifier, UTF_8), c.ts,
          java.nio.ByteBuffer.wrap(c.value).getDouble,
          if (c.typ == HFileCodec.TypeDelete) "delete" else "put")
      }
    }
    spark.createDataFrame(rows, cellsSchema)
  }
}
