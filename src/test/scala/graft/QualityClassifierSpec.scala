package graft

import graft.ops.QualityClassifierOps
import org.apache.spark.sql.functions._

/** The learned quality filter: a planted curated-vs-degraded signal must
  * be recovered from the row-local features by the bounded LR fit, the
  * fit must be deterministic (content-hash-bounded training set, no
  * RNG), and scoring must behave as a probability.
  */
class QualityClassifierSpec extends SparkSuite {

  /** Fixture docs with a PLANTED quality signal: odd doc_ids get a junk
    * suffix (symbols + digits — craters alpha_ratio, raises punct_ratio)
    * and label 0; even doc_ids stay as-is with label 1.
    */
  private lazy val labeled = {
    val junk = " !!!! ???? #### 0000 1111 .... ;;;; 2222 @@@@ 3333" * 3
    Tables.documents(spark, sf).select(
      col("doc_id"),
      when(col("doc_id") % 2 === 1, concat(col("text"), lit(junk)))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 2 === 1, 0).otherwise(1).as("label"))
      .cache()
  }

  test("planted curated-vs-degraded signal is recovered on held-out docs") {
    val train = labeled.where(col("doc_id") % 10 < 8)
    val heldOut = labeled.where(col("doc_id") % 10 >= 8)
    val m = QualityClassifierOps.train(train)
    val scored = QualityClassifierOps.score(heldOut, m)
      .join(heldOut.select("doc_id", "label"), "doc_id")
    val n = scored.count()
    val correct = scored.where(
      (col("q_score") >= 0.5 && col("label") === 1)
        || (col("q_score") < 0.5 && col("label") === 0)).count()
    assert(n > 0)
    assert(correct.toDouble / n >= 0.9,
      s"held-out accuracy ${correct.toDouble / n} ($correct/$n)")
  }

  test("fit is deterministic (bounded content-hash training set, no RNG)") {
    val m1 = QualityClassifierOps.train(labeled)
    val m2 = QualityClassifierOps.train(labeled)
    assert(m1.intercept == m2.intercept)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("scores are probabilities and degraded docs score lower; the filter keeps the clean side") {
    val m = QualityClassifierOps.train(labeled)
    val scored = QualityClassifierOps.score(labeled, m)
      .join(labeled.select("doc_id", "label"), "doc_id").cache()
    assert(scored.where(col("q_score") < 0.0 || col("q_score") > 1.0).count() == 0)
    val means = scored.groupBy("label").agg(avg("q_score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(means(1) > means(0),
      s"clean docs must outscore degraded: ${means(1)} vs ${means(0)}")
    val kept = QualityClassifierOps.classifierFilter(labeled, m)
    val keptBad = kept.where(col("label") === 0).count()
    val keptGood = kept.where(col("label") === 1).count()
    assert(keptGood > keptBad * 5,
      s"filter must keep predominantly clean docs ($keptGood clean vs $keptBad degraded)")
  }
}
