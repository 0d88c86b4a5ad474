package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 J12 — multimodal columns: image/audio/video treated as
  * opaque `BinaryType` payloads plus a typed metadata struct.
  *
  * The decoder is REAL end to end as of r9. Header facts (dims/duration)
  * come from pure-JVM parsers over the public container formats
  * ([[graft.functions.MediaCodec]]), gate-checked by `j19_media_dims`;
  * PIXELS come from the JDK's own ImageIO decoders (PNG/JPEG/GIF/BMP ship
  * with the JVM — no external codec lib needed), gate-checked by
  * `j25_media_pixels` against an integer-arithmetic oracle; WAV PCM
  * samples decode by direct RIFF parsing (`wavPcmStats`); bilinear
  * resize/thumbnailing is Java2D; GIF frame sampling uses the ImageIO
  * reader sequence. Only payloads no JDK codec recognizes (e.g. the j18
  * synthetic blobs) fall back to byte-moment features. Also real and
  * tested: the schema, the partition-friendly per-row processing (typed
  * `mapPartitions`, the Scala analogue of the Python `mapInPandas`
  * batch-UDF shape), content addressing, and the per-kind stats a
  * curation pipeline needs.
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

  /** Fallback featureizer for payloads [[graft.functions.MediaCodec]]
    * doesn't recognize (e.g. the j18 synthetic binary blobs): 8-dim byte
    * histogram moments. Real formats (PNG/JPEG/WAV) never reach this —
    * they decode through the header parsers below.
    */
  def byteMomentFeatures(payload: Array[Byte]): Array[Double] = {
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
    * by the case-class encoder. PNG/JPEG/WAV payloads are decoded for real
    * (pure-JVM header parse, [[graft.functions.MediaCodec]]): the feature
    * vector leads with (width, height, channels, sampleRate, durationMs);
    * unrecognized payloads fall back to byte-moment features.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta")).as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          var crc = 0L
          r.payload.foreach(b => crc = crc * 31 + (b & 0xff))
          val feature = graft.functions.MediaCodec.decode(r.payload) match {
            case Some(d) => Array[Double](d.width, d.height, d.channels,
              d.sampleRate, d.durationMs, r.payload.length, 0, 0)
            case None => byteMomentFeatures(r.payload)
          }
          MediaFeature(r.media_id, r.meta.kind, r.payload.length, crc, feature)
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
    * the hash match. (The real header decoders are gated separately by
    * `j19_media_dims` below.)
    */
  val j18_media_stats: Q = (s, d) => {
    val dir = graft.Tables.appTmpDir(s, "graft_media", d)
    mediaTable(graft.Tables.documents(s, d)).write.mode("overwrite").parquet(dir)
    mediaStats(s.read.parquet(dir))
  }

  case class MediaFile(media_id: Long, payload: Array[Byte])
  case class DecodedMedia(media_id: Long, format: String, width: Int, height: Int,
                          channels: Int, sample_rate: Int, duration_ms: Long)

  /** Real media fixture: PNG/JPEG/GIF files encoded by the JDK's own
    * ImageIO codecs, WAV by direct RIFF layout, MP3 by direct frame
    * layout — dimensions are pure doc_id arithmetic so the DuckDB oracle
    * can recompute the expected stats without ever seeing the bytes.
    * Bounded to 300 rows (60 per format) at every SF — this gates the
    * DECODER, not scan throughput.
    */
  def mediaFilesTable(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id")).where(col("doc_id") < 300).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 640 + 16).toInt
          val h = (id % 480 + 16).toInt
          val payload = (id % 5) match {
            case 0 => graft.functions.MediaGen.png(w, h)
            case 1 => graft.functions.MediaGen.jpeg(w, h)
            // 8 kHz PCM16: nSamples = 8·durMs makes the decoded duration exact
            case 2 => graft.functions.MediaGen.wav(
              channels = (1 + id % 2).toInt, sampleRate = 8000,
              nSamples = (8 * (id % 100 + 1)).toInt)
            // smaller GIF dims: ImageIO's GIF writer quantizes to a palette
            // (cost ∝ pixels); the decoder gate needs header variety, not
            // megapixels — 1/16 the pixels keeps j19's bench cost flat
            case 3 => graft.functions.MediaGen.gif((id % 160 + 16).toInt, (id % 120 + 16).toInt)
            // 24 ms/frame by construction: durationMs = 24·(id%50+1)
            case _ => graft.functions.MediaGen.mp3((id % 50 + 1).toInt)
          }
          MediaFile(id, payload)
        }
      }
  }

  /** Decode dims from BYTES ONLY — no metadata column in sight, so the
    * j19 oracle match proves the header parse itself.
    */
  def decodeDims(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[MediaFile]
      .mapPartitions { it =>
        it.map { f =>
          val d = graft.functions.MediaCodec.decode(f.payload).getOrElse(
            graft.functions.MediaCodec.MediaDims("unknown", -1, -1, -1, -1, -1L))
          DecodedMedia(f.media_id, d.format, d.width, d.height, d.channels,
            d.sampleRate, d.durationMs)
        }
      }
  }

  /** j19 — the de-stubbed J12 gate: generate real PNG/JPEG/WAV files,
    * round-trip them through parquet, re-derive width/height/channels/
    * duration from the payload bytes alone (pure-JVM header parsers in
    * [[graft.functions.MediaCodec]]), and aggregate per format. The DuckDB
    * oracle recomputes the same aggregates from doc_id arithmetic — one
    * wrong byte offset anywhere in the parse and the sums diverge.
    */
  val j19_media_dims: Q = (s, d) => {
    val dir = graft.Tables.appTmpDir(s, "graft_media_files", d)
    mediaFilesTable(s, graft.Tables.documents(s, d))
      .write.mode("overwrite").parquet(dir)
    val absent = (c: String) => when(col(c) >= 0, col(c)) // -1 = fact absent
    decodeDims(s, s.read.parquet(dir)).toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
        sum(absent("width")).as("sum_w"),
        min(absent("width")).as("min_w"),
        max(absent("width")).as("max_w"),
        sum(absent("height")).as("sum_h"),
        sum(absent("channels")).as("sum_ch"),
        sum(absent("duration_ms")).as("sum_dur_ms"))
      .orderBy(asc_nulls_last("format"))
  }

  case class PixelFeature(media_id: Long, width: Int, height: Int, bands: Int,
                          gray_sum: Long, gray_sq_sum: Long, entropy_mb: Long,
                          thumb: Array[Byte])

  /** Full pixel decode + feature extraction (r9 — the step the J12
    * Scaladoc used to declare out of scope): ImageIO decode to a raster,
    * exact integer pixel sums, gray-histogram entropy, and an 8×8
    * bilinear gray thumbnail, all per-partition on executors. Non-image
    * payloads yield no row (`flatMap` semantics) — audio goes through
    * [[graft.functions.MediaCodec.wavPcmStats]] instead.
    */
  def decodePixels(spark: SparkSession, media: DataFrame): Dataset[PixelFeature] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[MediaFile]
      .mapPartitions { it =>
        it.flatMap { f =>
          graft.functions.MediaCodec.decodeImage(f.payload).map { img =>
            val st = graft.functions.MediaCodec.pixelStats(img)
            PixelFeature(f.media_id, st.width, st.height, st.bands,
              st.graySum, st.graySumSq, st.entropyMillibits,
              graft.functions.MediaCodec.thumbnailGray(img, 8))
          }
        }
      }
  }

  /** j25 — real pixel decode under the DuckDB oracle gate: every document
    * becomes a gray PNG whose pixel (x,y) is the exact closed form
    * `(3x + 5y + 7·doc_id) mod 256` ([[graft.functions.MediaGen.grayPng]]),
    * the files round-trip through parquet, ImageIO decodes them back to
    * rasters on executors, and the per-image pixel sums are compared
    * against an oracle that only does integer arithmetic over a generated
    * grid — one wrong pixel anywhere in encode → parquet → decode and the
    * sums diverge. PNG losslessness is what makes the gate exact.
    */
  /** Deterministic gray-PNG file table (the j25 fixture): one PNG per
    * document, pixel (x, y) = (3x + 5y + 7·doc_id) mod 256, dims pure
    * doc_id arithmetic. A narrow `mapPartitions`, so it applies to batch
    * AND streaming inputs unchanged (the I15 twin).
    */
  def grayPngFiles(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (16 + id % 17).toInt
          val h = (16 + (id * 3) % 13).toInt
          MediaFile(id, graft.functions.MediaGen.grayPng(id, w, h))
        }
      }
  }

  val j25_media_pixels: Q = (s, d) => {
    val dir = graft.Tables.appTmpDir(s, "graft_media_px", d)
    // NO fanOut on either codec pass — measured, round 16: with the
    // repaired (actually-firing) fanOut, j25 read 5.7 s vs 2.2 s without
    // at sf0.1 — the round-robin exchange of binary payload rows costs
    // more than the ImageIO parallelism it buys on this fixture (the
    // j31/j32/j29 revert precedent). At production split counts fanOut
    // is the identity anyway, so removing it changes nothing at scale.
    grayPngFiles(s, graft.Tables.documents(s, d))
      .write.mode("overwrite").parquet(dir)
    decodePixels(s, s.read.parquet(dir)).toDF()
      .select(col("media_id"), col("width").as("w"), col("height").as("h"),
        col("gray_sum"))
      .orderBy(col("media_id").asc_nulls_last)
  }

  /** Deterministic DUPLICATE-bearing gray-PNG table: payload pixels and
    * dims keyed by the GROUP id (doc_id − doc_id % 5), so every run of 5
    * consecutive doc_ids carries byte-identical image content under
    * distinct media_ids — the re-hosted/re-crawled asset shape an image
    * dedup pass exists for. Same narrow `mapPartitions` discipline as
    * [[grayPngFiles]].
    */
  def dupGrayPngFiles(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val g = id - id % 5
          val w = (16 + g % 17).toInt
          val h = (16 + (g * 3) % 13).toInt
          MediaFile(id, graft.functions.MediaGen.grayPng(g, w, h))
        }
      }
  }

  case class MediaHash(media_id: Long, w: Int, h: Int, ahash: Long)

  /** j62 — perceptual image dedup under the DuckDB oracle gate: the
    * duplicate-bearing PNG corpus round-trips through parquet, ImageIO
    * decodes on executors, every image gets the integer-exact 64-bit
    * block-mean hash ([[graft.functions.MediaCodec.aHash64]]), and
    * near-dup groups are ONE hash-groupBy on (ahash, w, h) — row-local
    * work then a keyed aggregation, never a pairwise pixel compare, the
    * only shape image dedup can take at 100 TB of media. The oracle
    * recomputes every hash bit from the closed-form pixel grid (block
    * sums + integer cross-multiplied mean tests + bit packing — zero
    * floats), and groups exactly the same key, so a single wrong pixel,
    * block boundary, or bit position anywhere in encode → parquet →
    * decode → hash moves the gate. MultimodalSpec pins the planted
    * group structure (runs of 5) and hash determinism.
    */
  val j62_image_dedup: Q = (s, d) => {
    import s.implicits._
    val dir = graft.Tables.appTmpDir(s, "graft_media_dup", d)
    // no fanOut on either pass — the j25 measurement (round 16): the
    // payload exchange costs more than the decode parallelism it buys
    dupGrayPngFiles(s, graft.Tables.documents(s, d))
      .write.mode("overwrite").parquet(dir)
    val hashed = s.read.parquet(dir)
      .select(col("media_id"), col("payload")).as[MediaFile]
      .mapPartitions { it =>
        it.flatMap { f =>
          graft.functions.MediaCodec.decodeImage(f.payload).map { img =>
            MediaHash(f.media_id, img.getWidth, img.getHeight,
              graft.functions.MediaCodec.aHash64(img))
          }
        }
      }
    hashed.toDF()
      .groupBy(col("ahash"), col("w"), col("h"))
      .agg(count(lit(1)).as("n"), min(col("media_id")).as("rep"))
      .orderBy(col("rep").asc_nulls_last)
  }

  val queries: Map[String, Q] = Map(
    "j18_media_stats" -> j18_media_stats,
    "j19_media_dims" -> j19_media_dims,
    "j25_media_pixels" -> j25_media_pixels,
    "j62_image_dedup" -> j62_image_dedup)
}
