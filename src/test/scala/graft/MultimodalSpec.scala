package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private lazy val media = MultimodalOps.mediaTable(Tables.documents(spark, sf)).cache()

  test("media schema: binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
  }

  test("feature extraction: deterministic 8-dim features, checksum stable") {
    val f1 = MultimodalOps.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    val f2 = MultimodalOps.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_._2.length == 8))
  }

  test("decode stub matches a hand-computed value") {
    val payload = "abcdefgh".getBytes("UTF-8")
    val feat = MultimodalOps.decodeStub(payload)
    assert(feat(0) == 'a'.toDouble / 8)
    assert(feat(7) == 'h'.toDouble / 8)
  }

  test("media stats: every kind counted, payload bytes match text length") {
    val stats = MultimodalOps.mediaStats(media).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    val total = stats.map(_.getAs[Long]("n")).sum
    assert(total == media.count())
  }
}
