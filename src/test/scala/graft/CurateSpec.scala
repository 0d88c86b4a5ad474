package graft

import graft.ops.CurateOps
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: each gate must catch exactly its planted
  * offender — junk at the quality gate, a byte-identical copy at exact
  * dedup, a one-word mutation at near-dup dedup — and pass everything
  * else through untouched.
  */
class CurateSpec extends SparkSuite {

  private def doc(i: Long, words: String*) = (i, words.mkString(" "))

  private lazy val corpus = {
    import spark.implicits._
    val good = Seq(
      doc(0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      doc(1L, "distributed query engines shuffle data between executors on wide joins"),
      doc(2L, "parquet files store columns separately so scans prune unread columns"),
      doc(3L, "window functions rank rows inside partitions without collapsing them"),
      doc(4L, "broadcast joins copy the small table to every executor in the cluster"),
      doc(5L, "watermarks bound streaming state by discarding data older than the horizon"))
    val junk = Seq((6L, "!!!???!!!"))                       // fails quality gate
    val exactDup = Seq((10L, good.head._2))                 // byte-identical to doc 0
    val nearDup = Seq((11L,                                  // one word off doc 1
      "distributed query engines shuffle data between executors on wide scans"))
    (good ++ junk ++ exactDup ++ nearDup).toDF("doc_id", "text")
  }

  test("each curation gate removes exactly its planted offender") {
    val kept = CurateOps.curate(corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(0L, 1L, 2L, 3L, 4L, 5L)),
      s"kept ${kept.mkString(",")}")
  }

  test("curation funnel reports the survival counts per stage") {
    val funnel = CurateOps.curationFunnel(corpus)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel == Map(
      "0_input" -> 9L,        // 6 good + junk + exact dup + near dup
      "1_quality" -> 8L,      // junk gone
      "2_exact_dedup" -> 7L,  // copy of doc 0 gone
      "3_near_dedup" -> 6L))  // mutation of doc 1 gone
  }

  test("curation is idempotent: curating the kept set keeps everything") {
    // re-curate from a materialized snapshot, the way a real pipeline
    // resumes from storage — stacking two runs in one lineage multiplies
    // the clustering loop's plan tree (see CurateOps scaladoc)
    val kept = CurateOps.curate(corpus).localCheckpoint(true)
    val again = CurateOps.curate(kept).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(again.sameElements(Array(0L, 1L, 2L, 3L, 4L, 5L)))
  }
}
