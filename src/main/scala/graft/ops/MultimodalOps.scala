package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 J12 — multimodal columns: image/audio/video treated as
  * opaque `BinaryType` payloads plus a typed metadata struct.
  *
  * The codec itself (JPEG decode, audio resample, frame sampling) is NOT
  * in scope for this container — `decodeStub` below is a clearly-marked
  * deterministic fake. What IS real and tested: the schema, the
  * partition-friendly per-row processing (typed `mapPartitions`, the
  * Scala analogue of the Python `mapInPandas` batch-UDF shape), content
  * addressing, and the per-kind stats a curation pipeline needs.
  *
  * Scale posture: payloads stay columnar in parquet (binary column,
  * metadata struct prunable independently of payload bytes); feature
  * extraction is a narrow per-partition map — zero shuffles until the
  * stats aggregation.
  */
object MultimodalOps {

  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeature(media_id: Long, kind: String, nBytes: Int, checksum: Long,
                          feature: Array[Double])

  /** Deterministic synthetic media table derived from documents — stands
    * in for a real binary fixture (none ships in /root/testdata). The
    * payload is genuinely non-text binary: the document's UTF-8 bytes
    * followed by the 32 raw bytes of its SHA-256 — so any byte-level
    * corruption in a sink/scan roundtrip shifts the content hashes the
    * j18 oracle checks.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(encode(col("text"), "UTF-8"), unhex(sha2(col("text"), 256))).as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("doc_id") * 40 % 60000).as("durationMs")).as("meta"))

  /** STUB — stands in for the real image/audio decoder (libs not in this
    * container). Deterministic: 8-dim "feature" = byte histogram moments.
    * The real implementation swaps ONLY this function; the Spark plumbing
    * around it (typed partition map, schema, batch shape) is unchanged.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val n = math.max(payload.length, 1)
    Array.tabulate(8) { i =>
      var s = 0L
      var j = i
      while (j < payload.length) { s += (payload(j) & 0xff); j += 8 }
      s.toDouble / n
    }
  }

  /** Per-partition feature extraction — the mapInPandas-shaped stage:
    * one iterator pass per partition, no driver involvement, schema fixed
    * by the case-class encoder.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta")).as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          var crc = 0L
          r.payload.foreach(b => crc = crc * 31 + (b & 0xff))
          MediaFeature(r.media_id, r.meta.kind, r.payload.length, crc, decodeStub(r.payload))
        }
      }
  }

  /** Content-address + per-kind curation stats (all builtin, codegen'd).
    * The hash goes through `lower(hex(payload))` so both engines hash the
    * same ASCII rendering (DuckDB's sha256 takes VARCHAR only, and the
    * two engines disagree on hex casing).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.kind").as("kind"),
      length(col("payload")).as("n_bytes"),
      sha2(lower(hex(col("payload"))), 256).as("content_hash"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        countDistinct("content_hash").as("distinct_payloads"),
        min("content_hash").as("min_hash"),
        max("content_hash").as("max_hash"))
      .orderBy(asc_nulls_last("kind"))

  /** j18 — the J12 surface under the DuckDB oracle gate: build the binary
    * media table, round-trip it through a parquet sink/scan (binary column
    * + metadata struct), and aggregate per-kind content-hash/size stats.
    * The oracle recomputes the same stats from `documents` directly, so a
    * single corrupted payload byte anywhere in the write/read path breaks
    * the hash match. The decode stub stays out of the gate (no codec libs
    * in this container — see [[decodeStub]]).
    */
  val j18_media_stats: Q = (s, d) => {
    val dir = graft.Tables.appTmpDir(s, "graft_media", d)
    mediaTable(graft.Tables.documents(s, d)).write.mode("overwrite").parquet(dir)
    mediaStats(s.read.parquet(dir))
  }

  val queries: Map[String, Q] = Map("j18_media_stats" -> j18_media_stats)
}
